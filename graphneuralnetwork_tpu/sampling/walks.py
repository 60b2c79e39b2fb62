"""Random-walk generators — vectorised numpy instead of per-walk Python.

The reference walks one node at a time inside joblib workers
(DeepWalk/data_utils.py:28-62, Node2vec/utils/sample_utils.py:72-170,
MetaPath2Vec/utils/sample_utils.py:13-45, BiNE/utils/sample_utils.py:27-62).
Here every walker advances in lock-step with vectorised draws: walk
matrices of shape [n_walks, length] are produced in O(length) numpy steps,
which is both the CPU-fast path and the exact shape device pipelines want.

CSR convention throughout: ``(indptr, indices)`` with neighbor lists of
node v at ``indices[indptr[v]:indptr[v+1]]``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .alias import ConcatAliasTables, build_alias_table


def csr_from_edges(senders, receivers, n_nodes: int,
                   weights=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    order = np.argsort(senders, kind="stable")
    s, r = senders[order], receivers[order]
    w = (np.ones(len(s), np.float32) if weights is None
         else np.asarray(weights, np.float32)[order])
    indptr = np.searchsorted(s, np.arange(n_nodes + 1))
    return indptr.astype(np.int64), r.astype(np.int32), w


def uniform_walks(indptr, indices, starts, length: int,
                  rng: np.random.Generator,
                  use_native: bool = True) -> np.ndarray:
    """[n_starts, length] uniform walks; dead-ends self-absorb
    (DeepWalk/data_utils.py:28-45 semantics with num_walks handled by
    repeating ``starts``). Uses the OpenMP C++ engine when available
    (native/walker.cpp), falling back to the vectorised numpy path."""
    if use_native:
        from .native import uniform_walks_native

        out = uniform_walks_native(
            indptr, indices, np.asarray(starts, np.int64), length,
            int(rng.integers(0, 2**62)))
        if out is not None:
            return out
    starts = np.asarray(starts, np.int64)
    n = len(starts)
    walks = np.empty((n, length), np.int32)
    cur = starts.copy()
    walks[:, 0] = cur
    deg = (indptr[1:] - indptr[:-1])
    for t in range(1, length):
        d = deg[cur]
        alive = d > 0
        off = (rng.random(n) * np.maximum(d, 1)).astype(np.int64)
        nxt = indices[indptr[cur] + off]
        cur = np.where(alive, nxt, cur)
        walks[:, t] = cur
    return walks


def weighted_walks(indptr, indices, weights, starts, length: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Edge-weight-biased walks via per-node alias tables (LINE/BiNE-style
    weighted graphs)."""
    n_nodes = len(indptr) - 1
    tables = [weights[indptr[v]:indptr[v + 1]] for v in range(n_nodes)]
    cat = ConcatAliasTables(tables)
    starts = np.asarray(starts, np.int64)
    n = len(starts)
    walks = np.empty((n, length), np.int32)
    cur = starts.copy()
    walks[:, 0] = cur
    deg = indptr[1:] - indptr[:-1]
    for t in range(1, length):
        alive = deg[cur] > 0
        safe = np.where(alive, cur, 0)
        local = cat.draw(safe, rng)
        nxt = indices[indptr[safe] + local]
        cur = np.where(alive, nxt, cur)
        walks[:, t] = cur
    return walks


class Node2VecWalker:
    """p/q-biased second-order walks with per-edge alias tables
    (Node2vec/utils/sample_utils.py:72-170), vectorised.

    Edge (u→v) gets an alias table over v's neighbors x with unnormalised
    probs: 1/p if x==u; 1 if x adjacent to u; 1/q otherwise
    (get_alias_edge, :122-146).
    """

    def __init__(self, indptr, indices, p: float = 1.0, q: float = 1.0,
                 weights=None):
        self.indptr, self.indices = indptr, indices
        n_nodes = len(indptr) - 1
        w = (np.ones(len(indices), np.float32) if weights is None
             else np.asarray(weights, np.float32))
        # adjacency sets for O(1) membership
        neigh_sets = [set(indices[indptr[v]:indptr[v + 1]].tolist())
                      for v in range(n_nodes)]
        # node tables (first step)
        self.node_tables = ConcatAliasTables(
            [w[indptr[v]:indptr[v + 1]] for v in range(n_nodes)])
        # edge tables: one per directed edge position e (u=src_of[e] → v)
        src_of = np.repeat(np.arange(n_nodes),
                           indptr[1:] - indptr[:-1]).astype(np.int64)
        tables = []
        for e in range(len(indices)):
            u, v = int(src_of[e]), int(indices[e])
            nbrs = indices[indptr[v]:indptr[v + 1]]
            ww = w[indptr[v]:indptr[v + 1]].copy()
            for k, x in enumerate(nbrs):
                if x == u:
                    ww[k] /= p
                elif int(x) in neigh_sets[u]:
                    pass
                else:
                    ww[k] /= q
            tables.append(ww)
        self.edge_tables = ConcatAliasTables(tables)

    def walk(self, starts, length: int, rng: np.random.Generator):
        indptr, indices = self.indptr, self.indices
        starts = np.asarray(starts, np.int64)
        n = len(starts)
        deg = indptr[1:] - indptr[:-1]
        walks = np.empty((n, length), np.int32)
        cur = starts.copy()
        walks[:, 0] = cur
        if length == 1:
            return walks
        # first hop: node-table draw
        alive = deg[cur] > 0
        safe = np.where(alive, cur, 0)
        local = self.node_tables.draw(safe, rng)
        edge_pos = indptr[safe] + local            # directed edge index
        nxt = indices[edge_pos]
        cur = np.where(alive, nxt, cur)
        walks[:, 1] = cur
        for t in range(2, length):
            still = deg[cur] > 0
            alive = alive & still
            safe_edge = np.where(alive, edge_pos, 0)
            local = self.edge_tables.draw(safe_edge, rng)
            new_edge = indptr[np.where(alive, cur, 0)] + local
            nxt = indices[new_edge]
            edge_pos = np.where(alive, new_edge, edge_pos)
            cur = np.where(alive, nxt, cur)
            walks[:, t] = cur
        return walks


def metapath_walks(
    hetero, metapath: Sequence[Tuple[str, str, str]],
    starts: np.ndarray, length: int, rng: np.random.Generator,
) -> np.ndarray:
    """Metapath-constrained walks (MetaPath2Vec/utils/sample_utils.py:13-45,
    GATNE schema walks sample_utils.py:6-54). The relation sequence repeats
    cyclically until ``length`` nodes are emitted; walkers with no valid
    next hop self-absorb. Returns GLOBAL ids if ``hetero`` offsets are
    provided via ``type_offsets`` attribute, else per-type local ids with
    the caller tracking types."""
    csr: Dict[Tuple[str, str, str], tuple] = {}
    for key in metapath:
        s, d, w = hetero.relations[key]
        csr[key] = csr_from_edges(s, d, hetero.node_counts[key[0]])
    starts = np.asarray(starts, np.int64)
    n = len(starts)
    walks = np.empty((n, length), np.int32)
    cur = starts.copy()
    walks[:, 0] = cur
    alive = np.ones(n, bool)
    for t in range(1, length):
        key = metapath[(t - 1) % len(metapath)]
        indptr, indices, _ = csr[key]
        deg = indptr[1:] - indptr[:-1]
        safe = np.where(alive, cur, 0)
        d = deg[safe]
        step_alive = alive & (d > 0)
        off = (rng.random(n) * np.maximum(d, 1)).astype(np.int64)
        nxt = indices[indptr[safe] + off]
        cur = np.where(step_alive, nxt, cur)
        alive = step_alive
        walks[:, t] = cur
    return walks


def bine_walks(
    indptr, indices, weights, centrality: np.ndarray,
    rng: np.random.Generator, *,
    percent: float = 0.15, max_t: int = 32, min_t: int = 1,
    p_stop: float = 0.15,
) -> list[np.ndarray]:
    """BiNE HITS-biased truncated walks (BiNE/utils/sample_utils.py:27-62):
    node v gets max(int(max_t * centrality_v * percent ... ), min_t) walks
    (walk count ∝ centrality, :37-41), each continuing with prob
    (1 - p_stop) per step up to max_t."""
    n_nodes = len(indptr) - 1
    c = centrality / max(centrality.sum(), 1e-12)
    num_walks = np.maximum((max_t * c * n_nodes * percent).astype(np.int64),
                           min_t)
    starts = np.repeat(np.arange(n_nodes), num_walks)
    # geometric lengths, truncated
    lens = np.minimum(
        rng.geometric(p_stop, len(starts)), max_t)
    lens = np.maximum(lens, min_t)
    full = weighted_walks(indptr, indices, weights, starts, int(lens.max()),
                          rng)
    return [full[i, :lens[i]] for i in range(len(starts))]
