"""Fanout neighbor sampling for mini-batch GraphSAGE.

Vectorised form of ``sampling``/``multihop_sampling``
(GraphSAGE_Pytorch/sample_utils.py:4-35): per hop, each frontier node draws
``fanout`` neighbors WITH replacement (fixed shapes — exactly what the
device wants); zero-degree nodes repeat themselves, fixing the reference's
crash-on-isolated-node behavior.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def sample_neighbors(nodes: np.ndarray, fanout: int, indptr, indices,
                     rng: np.random.Generator,
                     use_native: bool = True) -> np.ndarray:
    """[len(nodes) * fanout] sampled neighbors (with replacement). Prefers
    the OpenMP C++ engine (native/walker.cpp) when built."""
    if use_native:
        from .native import sample_neighbors_native

        out = sample_neighbors_native(
            indptr, indices, np.asarray(nodes, np.int64).ravel(), fanout,
            int(rng.integers(0, 2**62)))
        if out is not None:
            return out
    nodes = np.asarray(nodes, np.int64).ravel()
    deg = (indptr[1:] - indptr[:-1])[nodes]
    off = (rng.random((len(nodes), fanout)) *
           np.maximum(deg, 1)[:, None]).astype(np.int64)
    nbrs = indices[indptr[nodes][:, None] + off]
    self_rep = np.broadcast_to(nodes[:, None], nbrs.shape)
    return np.where(deg[:, None] > 0, nbrs, self_rep).ravel().astype(np.int32)


def multihop_sampling(nodes: np.ndarray, fanouts: Sequence[int],
                      indptr, indices,
                      rng: np.random.Generator) -> List[np.ndarray]:
    """[hop0 nodes, hop1 nodes, ...] flat arrays; hop k has
    len(nodes) * prod(fanouts[:k]) entries
    (GraphSAGE_Pytorch/sample_utils.py:20-35)."""
    result = [np.asarray(nodes, np.int32).ravel()]
    for f in fanouts:
        result.append(sample_neighbors(result[-1], f, indptr, indices, rng))
    return result
