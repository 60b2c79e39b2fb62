"""Alias-method O(1) weighted sampling, vectorised.

Replaces the per-node Python alias builders
(GraphEmbedding/Node2vec/utils/sample_utils.py:14-69, copied in
Struc2Vec/utils/sample_utils.py:15-70) with a single numpy construction
that builds MANY tables at once (concatenated layout, per-table offsets) —
the layout walkers index directly.
"""

from __future__ import annotations

import numpy as np


def build_alias_table(probs: np.ndarray):
    """Single alias table: returns (accept f32[n], alias int32[n])."""
    probs = np.asarray(probs, np.float64)
    n = len(probs)
    if n == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.int32)
    scaled = probs * n / probs.sum()
    accept = np.zeros(n, np.float64)
    alias = np.zeros(n, np.int32)
    small = [i for i, p in enumerate(scaled) if p < 1.0]
    large = [i for i, p in enumerate(scaled) if p >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        accept[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)
    for rest in (small, large):
        while rest:
            accept[rest.pop()] = 1.0
    return accept.astype(np.float32), alias


def sample_alias(accept, alias, rng: np.random.Generator, size):
    """Draw ``size`` samples from one alias table."""
    n = len(accept)
    i = rng.integers(0, n, size)
    keep = rng.random(size) < accept[i]
    return np.where(keep, i, alias[i])


class ConcatAliasTables:
    """Many alias tables packed into flat arrays.

    Table t occupies [offsets[t], offsets[t+1]); ``draw(t_idx, rng)``
    samples one local index per entry of ``t_idx`` — fully vectorised, the
    workhorse for biased walkers.
    """

    def __init__(self, tables: list[np.ndarray]):
        self.sizes = np.array([len(t) for t in tables], np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        accepts, aliases = [], []
        for t in tables:
            a, al = build_alias_table(t) if len(t) else (
                np.zeros(0, np.float32), np.zeros(0, np.int32))
            accepts.append(a)
            aliases.append(al)
        self.accept = (np.concatenate(accepts) if accepts
                       else np.zeros(0, np.float32))
        self.alias = (np.concatenate(aliases) if aliases
                      else np.zeros(0, np.int32))

    def draw(self, t_idx: np.ndarray, rng: np.random.Generator):
        """local index in each table of t_idx; tables must be non-empty."""
        t_idx = np.asarray(t_idx, np.int64)
        sz = self.sizes[t_idx]
        base = self.offsets[t_idx]
        i = (rng.random(len(t_idx)) * sz).astype(np.int64)
        g = base + i
        keep = rng.random(len(t_idx)) < self.accept[g]
        return np.where(keep, i, self.alias[g])


class CachedWeightedSampler:
    """Batch-cached weighted draws — the ``RandomGenerator`` pattern
    (GraphEmbedding/DeepWalk/data_utils.py:97-113) backed by an alias table
    instead of random.choices."""

    def __init__(self, weights, rng: np.random.Generator,
                 cache: int = 10000):
        self.accept, self.alias = build_alias_table(np.asarray(weights))
        self.rng = rng
        self.cache = cache
        self._buf = None
        self._i = 0

    def draw(self) -> int:
        if self._buf is None or self._i >= len(self._buf):
            self._buf = sample_alias(self.accept, self.alias, self.rng,
                                     self.cache)
            self._i = 0
        v = int(self._buf[self._i])
        self._i += 1
        return v

    def draw_batch(self, size: int) -> np.ndarray:
        return sample_alias(self.accept, self.alias, self.rng, size)
