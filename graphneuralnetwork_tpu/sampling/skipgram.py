"""Skip-gram data pipeline: subsampling, center/context pairs, negatives,
padded batches.

Vectorised replacements for the per-walk Python loops copied across the
embedding models:

  * ``subsample``            — frequency discard P(keep) = sqrt(1e-4/f)
                               (DeepWalk/data_utils.py:65-76).
  * ``centers_and_contexts`` — random half-window pair extraction
                               (DeepWalk/data_utils.py:79-94).
  * ``NegativeSampler``      — degree^0.75 (or typed) negative draws with
                               context exclusion by rejection
                               (DeepWalk/data_utils.py:116-129; typed
                               'ultra' form MetaPath2Vec/utils/
                               data_utils.py:73-93).
  * ``batchify``             — pad contexts+negatives into
                               [B, max_len] with labels and masks
                               (DeepWalk/data_utils.py:132-145).

Outputs are fixed-shape numpy arrays ready for ``jax.device_put``; a
generator yields shuffled minibatches per epoch.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from .alias import build_alias_table, sample_alias


def token_frequencies(walks: np.ndarray, n_tokens: int) -> np.ndarray:
    flat = walks.ravel()
    flat = flat[flat >= 0]  # -1 marks padding/dropped positions
    return np.bincount(flat, minlength=n_tokens).astype(np.int64)


def subsample(walks: np.ndarray, n_tokens: int,
              rng: np.random.Generator, t: float = 1e-4) -> np.ndarray:
    """Frequency-based discard; dropped positions are marked -1 (ragged
    sentences stay rectangular; downstream pair extraction skips -1)."""
    counts = token_frequencies(walks, n_tokens)
    total = counts.sum()
    freq = counts / max(total, 1)
    keep_p = np.minimum(np.sqrt(t / np.maximum(freq, 1e-12)), 1.0)
    u = rng.random(walks.shape)
    return np.where(u < keep_p[walks], walks, -1).astype(np.int64)


def centers_and_contexts(
    walks: np.ndarray, window: int, rng: np.random.Generator,
):
    """For every valid center position, draw a half-window size in
    [1, window] and collect in-window valid tokens. Returns (centers [P],
    contexts [P, 2*window] padded -1)."""
    n, L = walks.shape
    win = rng.integers(1, window + 1, size=(n, L))
    centers, contexts = [], []
    offs = np.arange(-window, window + 1)
    offs = offs[offs != 0]
    # positions matrix approach: for each offset, valid pair mask
    pos = np.arange(L)
    ctx_buf = np.full((n, L, 2 * window), -1, np.int64)
    fill = np.zeros((n, L), np.int64)
    for o in offs:
        src = pos + o
        valid_pos = (src >= 0) & (src < L)
        take = np.zeros((n, L), bool)
        take[:, valid_pos] = True
        j = np.clip(pos + o, 0, L - 1)
        vals = walks[:, j]
        m = (take & (np.abs(o) <= win) & (vals >= 0)
             & (walks >= 0))
        # scatter into ctx_buf at per-cell fill index
        idx_n, idx_l = np.nonzero(m)
        slot = fill[idx_n, idx_l]
        ctx_buf[idx_n, idx_l, slot] = vals[idx_n, idx_l]
        fill[idx_n, idx_l] += 1
    keep = (walks >= 0) & (fill > 0)
    idx_n, idx_l = np.nonzero(keep)
    return walks[idx_n, idx_l], ctx_buf[idx_n, idx_l]


class NegativeSampler:
    """K negatives per (center, context) pair from freq^0.75, rejecting the
    positive context (DeepWalk/data_utils.py:116-129). ``typed`` mode draws
    from a per-type distribution chosen by each pair's context type
    (get_negative_ultra, MetaPath2Vec/utils/data_utils.py:73-93)."""

    def __init__(self, weights: np.ndarray, power: float = 0.75):
        w = np.asarray(weights, np.float64) ** power
        self.accept, self.alias = build_alias_table(w)

    def draw(self, shape, rng: np.random.Generator,
             exclude: Optional[np.ndarray] = None) -> np.ndarray:
        out = sample_alias(self.accept, self.alias, rng, shape)
        if exclude is not None:
            for _ in range(3):  # rejection passes
                bad = out == exclude
                if not bad.any():
                    break
                out = np.where(
                    bad, sample_alias(self.accept, self.alias, rng, shape),
                    out)
        return out


class TypedNegativeSampler:
    """Alternating-type negatives for bipartite skip-gram — the 'ultra'
    mode (get_negative_ultra, MetaPath2Vec/utils/data_utils.py:73-93).

    Per (center, contexts) pair the noise words alternate between the two
    node types, starting with the type *opposite* the last context token
    (last ctx user → item, user, item, …), each type drawn from its own
    freq^0.75 distribution with in-context rejection.
    """

    def __init__(self, weights: np.ndarray, token_types: np.ndarray,
                 power: float = 0.75):
        self.types = np.asarray(token_types, np.int64)
        assert set(np.unique(self.types)) <= {0, 1}, "bipartite only"
        w = np.asarray(weights, np.float64) ** power
        self.ids = []
        self.tables = []
        for t in (0, 1):
            ids = np.flatnonzero(self.types == t)
            self.ids.append(ids)
            self.tables.append(build_alias_table(np.maximum(w[ids], 1e-12)))

    def _draw_all(self, shape, slot_types, rng):
        out = np.zeros(shape, np.int64)
        for t in (0, 1):
            accept, alias = self.tables[t]
            loc = sample_alias(accept, alias, rng, shape)
            out = np.where(slot_types == t, self.ids[t][loc], out)
        return out

    def draw(self, contexts: np.ndarray, num_negatives: int,
             rng: np.random.Generator) -> np.ndarray:
        """contexts: [P, C] padded -1 → negatives [P, C*num_negatives]
        (padded -1 beyond K*n_ctx per row)."""
        P, C = contexts.shape
        K = C * num_negatives
        n_ctx = (contexts >= 0).sum(1)
        # last valid context per row (rows with no context get slot 0)
        last_pos = np.maximum(n_ctx - 1, 0)
        last_ctx = contexts[np.arange(P), last_pos]
        last_type = self.types[np.maximum(last_ctx, 0)]
        # slot j type: alternation starts opposite the last context's type
        j = np.arange(K)[None, :]
        slot_types = (1 - last_type[:, None] + j) % 2
        out = self._draw_all((P, K), slot_types, rng)
        # reject in-context draws (a few vectorised passes)
        for _ in range(3):
            bad = (out[:, :, None] == contexts[:, None, :]).any(-1)
            if not bad.any():
                break
            redraw = self._draw_all((P, K), slot_types, rng)
            out = np.where(bad, redraw, out)
        keep = j < (num_negatives * n_ctx)[:, None]
        return np.where(keep, out, -1)


def batchify(
    centers: np.ndarray, contexts: np.ndarray, negatives: np.ndarray,
):
    """Concatenate per-pair contexts+negatives into padded rows:
    returns (centers [P], ctx_neg [P, C+K], labels, mask) with label 1 on
    contexts, 0 on negatives, mask 0 on padding
    (DeepWalk/data_utils.py:132-145)."""
    P, C = contexts.shape
    K = negatives.shape[1]
    ctx_neg = np.concatenate([contexts, negatives], axis=1)
    labels = np.concatenate(
        [(contexts >= 0).astype(np.float32), np.zeros((P, K), np.float32)],
        axis=1)
    mask = (ctx_neg >= 0).astype(np.float32)
    ctx_neg = np.where(ctx_neg >= 0, ctx_neg, 0)
    return centers.astype(np.int32), ctx_neg.astype(np.int32), labels, mask


def skipgram_dataset(
    walks: np.ndarray, n_tokens: int, *,
    window: int = 5, num_negatives: int = 5,
    rng: Optional[np.random.Generator] = None,
    subsample_t: Optional[float] = 1e-4,
    neg_weights: Optional[np.ndarray] = None,
    token_types: Optional[np.ndarray] = None,
):
    """walks → (centers, ctx_neg, labels, mask) full arrays.

    ``token_types`` (int[n_tokens] of 0/1) switches negatives to the typed
    alternating 'ultra' draw (get_negative_ultra,
    MetaPath2Vec/utils/data_utils.py:73-93)."""
    rng = rng or np.random.default_rng(0)
    counts = token_frequencies(walks, n_tokens)
    sent = (subsample(walks, n_tokens, rng, subsample_t)
            if subsample_t else walks.astype(np.int64))
    centers, contexts = centers_and_contexts(sent, window, rng)
    weights = (neg_weights if neg_weights is not None
               else np.maximum(counts, 1))
    if token_types is not None:
        typed = TypedNegativeSampler(weights, token_types)
        negs = typed.draw(contexts, num_negatives, rng)
        return batchify(centers, contexts, negs)
    sampler = NegativeSampler(weights)
    P = len(centers)
    # per-pair negatives scaled by number of real contexts (reference draws
    # K per context token): K_total = num_negatives * valid contexts
    n_ctx = (contexts >= 0).sum(1)
    K = int(num_negatives * max(contexts.shape[1], 1))
    negs = sampler.draw((P, K), rng)
    # mask negatives beyond num_negatives*n_ctx per row
    keep = np.arange(K)[None, :] < (num_negatives * n_ctx)[:, None]
    negs = np.where(keep, negs, -1)
    return batchify(centers, contexts, negs)


def minibatches(arrays: Sequence[np.ndarray], batch_size: int,
                rng: np.random.Generator, shuffle: bool = True,
                drop_remainder: bool = True) -> Iterator[tuple]:
    """Yield fixed-size minibatch tuples (device-friendly static shapes)."""
    n = len(arrays[0])
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, end, batch_size):
        sel = idx[i:i + batch_size]
        yield tuple(a[sel] for a in arrays)
