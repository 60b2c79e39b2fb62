"""Locality reordering: relabel nodes so neighbours get nearby indices.

Real graphs (citations, communities, meshes) have locality that a random
node labelling destroys. Reverse Cuthill–McKee (RCM) over the symmetrised
adjacency concentrates each node's neighbours into a narrow index band,
which is what makes the dense-tile BCSR SpMM path (core/bcsr.py) profitable:
after RCM, the nonzeros of A live in few (row_block × col_block) tiles, so
aggregation becomes a short chain of dense MXU matmuls instead of 1 random
HBM row-gather per edge.

This is a host-side, build-time pass (like the reference's scipy
normalisations, GCN/data_utils.py:27-70) — the TPU only ever sees the
relabelled graph. Apply ``perm`` to features/labels once; results come back
in the new order (invert with ``invert_permutation`` when needed).
"""

from __future__ import annotations

import numpy as np


def rcm_order(senders: np.ndarray, receivers: np.ndarray,
              n_nodes: int) -> np.ndarray:
    """Reverse Cuthill–McKee permutation: ``perm[new_id] = old_id``.

    Computed over the symmetrised pattern (RCM is defined for symmetric
    structure); isolated nodes sort to the end of their component order.
    """
    from scipy import sparse
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    s = np.asarray(senders, np.int64).ravel()
    r = np.asarray(receivers, np.int64).ravel()
    data = np.ones(2 * len(s), np.int8)
    a = sparse.csr_matrix(
        (data, (np.concatenate([s, r]), np.concatenate([r, s]))),
        shape=(n_nodes, n_nodes))
    return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True),
                      dtype=np.int64)


def label_propagation(senders: np.ndarray, receivers: np.ndarray,
                      n_nodes: int, iters: int = 8) -> np.ndarray:
    """Community labels by synchronous majority label propagation.

    Robust where RCM is not: a graph with strong communities plus a few
    percent of random long-range edges has no narrow band for RCM to find,
    but majority voting still recovers the communities (the long edges are
    always outvoted). Vectorised: one sort of the 2E (node, neighbour-
    label) keys per iteration.
    """
    s = np.asarray(senders, np.int64).ravel()
    r = np.asarray(receivers, np.int64).ravel()
    ss = np.concatenate([s, r])
    rr = np.concatenate([r, s])
    lab = np.arange(n_nodes, dtype=np.int64)
    for _ in range(iters):
        key = rr * n_nodes + lab[ss]
        uk, cnt = np.unique(key, return_counts=True)
        node = uk // n_nodes
        klab = uk % n_nodes
        # per node: label with the max count (ties → smaller label)
        order = np.lexsort((klab, -cnt, node))
        first = np.concatenate(
            [[True], node[order][1:] != node[order][:-1]])
        new = lab.copy()
        new[node[order][first]] = klab[order][first]
        if np.array_equal(new, lab):
            break
        lab = new
    return lab


def cluster_order(senders: np.ndarray, receivers: np.ndarray,
                  n_nodes: int, iters: int = 8) -> np.ndarray:
    """Permutation (``perm[new] = old``) grouping nodes by propagated
    community label — the ordering that densifies BCSR tiles."""
    lab = label_propagation(senders, receivers, n_nodes, iters)
    return np.argsort(lab, kind="stable").astype(np.int64)


def locality_order(senders: np.ndarray, receivers: np.ndarray,
                   n_nodes: int, method: str = "auto") -> np.ndarray:
    """Pick the node ordering that minimises the BCSR tile count.

    ``auto`` evaluates RCM (bands: meshes, roads, backbones) and label-
    propagation clustering (communities: social/citation graphs) and keeps
    whichever concentrates more edge mass into dense (>= break-even)
    tiles, tie-broken by tile-store bytes — both are cheap one-off host
    passes. The dense-mass objective matters: raw tile count once picked
    RCM orderings whose tiles were all just below the per-tile break-even
    (0.077 vs 0.906 tiled fraction on an 8k community graph), starving
    the hybrid split.
    """
    if method == "rcm":
        return rcm_order(senders, receivers, n_nodes)
    if method == "cluster":
        return cluster_order(senders, receivers, n_nodes)
    assert method == "auto", method
    from .bcsr import bcsr_memory_bytes, tiled_edge_fraction

    best_perm, best_key = None, None
    for cand in (rcm_order(senders, receivers, n_nodes),
                 cluster_order(senders, receivers, n_nodes)):
        s2, r2 = relabel_edges(cand, senders, receivers)
        # maximise dense-tile mass; among equals, prefer the smaller store
        key = (-tiled_edge_fraction(s2, r2, n_nodes),
               bcsr_memory_bytes(len(s2), s2, r2, n_nodes))
        if best_key is None or key < best_key:
            best_perm, best_key = cand, key
    return best_perm


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return inv


def relabel_edges(perm: np.ndarray, senders: np.ndarray,
                  receivers: np.ndarray):
    """Relabel edge endpoints under ``perm[new] = old``: new node i holds
    old node perm[i], so endpoint ids map through the inverse."""
    inv = invert_permutation(np.asarray(perm, np.int64))
    return (inv[np.asarray(senders, np.int64)].astype(np.int32),
            inv[np.asarray(receivers, np.int64)].astype(np.int32))


def bandwidth_stats(senders: np.ndarray, receivers: np.ndarray) -> dict:
    """Locality diagnostics: |s - r| distribution of the edge list."""
    d = np.abs(np.asarray(senders, np.int64) -
               np.asarray(receivers, np.int64))
    if len(d) == 0:
        return dict(max=0, mean=0.0, p95=0)
    return dict(max=int(d.max()), mean=float(d.mean()),
                p95=int(np.percentile(d, 95)))
