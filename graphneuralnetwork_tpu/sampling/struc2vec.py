"""Struc2Vec: structural-similarity multilayer graph + layer-hopping walks.

Pipeline (GraphEmbedding/Struc2Vec/utils/graph_utils.py + sample_utils.py):
  1. k-hop BFS rings with ordered degree sequences (graph_utils.py:45-100).
  2. Per-layer DTW distances with cost d(a,b) = max(a,b)/min(a,b) − 1
     (fastdtw.py:5-104, compute_dtw_dist :103-121); cumulative over layers.
  3. opt2 candidate pruning: compare only nodes with similar degree
     (get_vertices, graph_utils.py:311-361) — O(n log n) pairs.
  4. Layer weights w_k(u,v) = exp(−f_k(u,v)), per-layer alias tables, and
     layer-transition probabilities from the average weight γ
     (graph_utils.py:192-269).
  5. Walks: stay in layer w.p. ``stay_prob`` drawing an alias neighbor,
     else hop up/down (sample_utils.py:92-157).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .alias import ConcatAliasTables, build_alias_table, sample_alias


def degree_rings(indptr, indices, n_nodes: int, k_max: int
                 ) -> List[List[np.ndarray]]:
    """rings[v][k] = sorted degree sequence of nodes at hop distance k."""
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    rings: List[List[np.ndarray]] = []
    for v in range(n_nodes):
        seen = {v}
        frontier = [v]
        out = [np.array([deg[v]], np.int64)]
        for _ in range(k_max):
            nxt = set()
            for u in frontier:
                for w in indices[indptr[u]:indptr[u + 1]]:
                    if int(w) not in seen:
                        nxt.add(int(w))
            if not nxt:
                break
            seen |= nxt
            frontier = sorted(nxt)
            out.append(np.sort(deg[list(frontier)]))
        rings.append(out)
    return rings


def dtw_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Plain O(len·len) DTW with the struc2vec cost
    (fastdtw.py dist: max/min − 1)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0 if la == lb else float(max(la, lb))
    big = np.maximum.outer(a, b).astype(np.float64)
    small = np.minimum.outer(a, b).astype(np.float64)
    cost = big / np.maximum(small, 1e-12) - 1.0
    d = np.full((la + 1, lb + 1), np.inf)
    d[0, 0] = 0.0
    for i in range(1, la + 1):
        j_lo, j_hi = 1, lb + 1
        for j in range(j_lo, j_hi):
            d[i, j] = cost[i - 1, j - 1] + min(
                d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return float(d[la, lb])


def degree_candidates(deg: np.ndarray, n_candidates: int
                      ) -> List[np.ndarray]:
    """opt2 pruning: for each node, the ~2·log n degree-nearest other nodes
    (get_vertices, graph_utils.py:311-361 semantics)."""
    n = len(deg)
    order = np.argsort(deg, kind="stable")
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n)
    out = []
    for v in range(n):
        p = pos[v]
        lo = max(p - n_candidates, 0)
        hi = min(p + n_candidates + 1, n)
        cand = order[lo:hi]
        out.append(cand[cand != v])
    return out


def build_multilayer_graph(
    indptr, indices, n_nodes: int, *,
    k_max: int = 3, n_candidates: int | None = None,
) -> List[Dict[int, List[Tuple[int, float]]]]:
    """layers[k][u] = [(v, w_k)] with w_k = exp(−f_k(u,v)).

    The per-pair BFS-ring DTW distances — the reference's joblib-parallel
    hot loop (Struc2Vec/utils/graph_utils.py:103-121,161-162) — run in the
    native C++ OpenMP engine when available, with this numpy/Python path as
    the portable fallback (identical cost function; verified by test).
    """
    if n_candidates is None:
        n_candidates = max(int(2 * np.log2(max(n_nodes, 2))), 2)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    cands = degree_candidates(deg, n_candidates)

    # unique candidate pairs (a < b)
    pair_set = set()
    for u in range(n_nodes):
        for v in cands[u]:
            v = int(v)
            pair_set.add((u, v) if u < v else (v, u))
    pairs = np.array(sorted(pair_set), np.int32).reshape(-1, 2)

    from .native import struc2vec_distances_native
    native = (struc2vec_distances_native(
        indptr, indices, n_nodes, k_max, pairs[:, 0], pairs[:, 1])
        if len(pairs) else None)
    dist_cache: Dict[Tuple[int, int], List[float]] = {}
    if native is not None:
        f_mat, n_layers = native
        for p, (a, b) in enumerate(map(tuple, pairs)):
            dist_cache[(int(a), int(b))] = [
                float(f_mat[p, k]) for k in range(int(n_layers[p]))]
    else:
        rings = degree_rings(indptr, indices, n_nodes, k_max)
        for a, b in map(tuple, pairs):
            f = []
            acc = 0.0
            kk = min(len(rings[a]), len(rings[b]))
            for k in range(kk):
                acc += dtw_distance(rings[a][k], rings[b][k])
                f.append(acc)
            dist_cache[(int(a), int(b))] = f

    layers: List[Dict[int, List[Tuple[int, float]]]] = [
        {v: [] for v in range(n_nodes)} for _ in range(k_max + 1)]
    for u in range(n_nodes):
        for v in cands[u]:
            v = int(v)
            f = dist_cache[(u, v) if u < v else (v, u)]
            for k in range(min(len(f), k_max + 1)):
                layers[k][u].append((v, float(np.exp(-f[k]))))
    return layers


class Struc2VecWalker:
    """Layer-hopping walker over the multilayer similarity graph
    (sample_utils.py:92-157)."""

    def __init__(self, layers, stay_prob: float = 0.3):
        self.n_layers = len(layers)
        self.stay_prob = stay_prob
        self.neighbors: List[List[np.ndarray]] = []
        self.tables: List[ConcatAliasTables] = []
        self.avg_w: List[float] = []
        self.up_prob: List[np.ndarray] = []
        for k, layer in enumerate(layers):
            n = len(layer)
            nbrs = [np.array([v for v, _ in layer[u]], np.int64)
                    for u in range(n)]
            wts = [np.array([w for _, w in layer[u]], np.float64)
                   for u in range(n)]
            self.neighbors.append(nbrs)
            self.tables.append(ConcatAliasTables(
                [w if len(w) else np.ones(1) for w in wts]))
            all_w = np.concatenate([w for w in wts if len(w)]) if any(
                len(w) for w in wts) else np.ones(1)
            avg = float(all_w.mean())
            self.avg_w.append(avg)
            # prepare_biased_walk γ: p(up) = γ/(γ+1) with γ = #{w > avg}
            gamma = np.array(
                [max((w > avg).sum(), 1e-9) if len(w) else 1e-9
                 for w in wts])
            self.up_prob.append(np.log(gamma + np.e)
                                / (np.log(gamma + np.e) + 1.0))

    def walk(self, starts, length: int, rng: np.random.Generator
             ) -> np.ndarray:
        starts = np.asarray(starts, np.int64)
        n = len(starts)
        walks = np.empty((n, length), np.int32)
        cur = starts.copy()
        layer = np.zeros(n, np.int64)
        walks[:, 0] = cur
        for t in range(1, length):
            stay = rng.random(n) < self.stay_prob
            # layer moves for non-staying walkers
            up = rng.random(n) < np.array(
                [self.up_prob[int(l)][int(c)] for l, c in zip(layer, cur)])
            new_layer = np.where(
                stay, layer,
                np.where(up, np.minimum(layer + 1, self.n_layers - 1),
                         np.maximum(layer - 1, 0)))
            # clamp to layers where the node has neighbors
            for i in range(n):
                li = int(new_layer[i])
                while li > 0 and len(self.neighbors[li][int(cur[i])]) == 0:
                    li -= 1
                new_layer[i] = li
            layer = new_layer
            # in-layer step
            nxt = cur.copy()
            for k in range(self.n_layers):
                m = (layer == k)
                if not m.any():
                    continue
                nodes = cur[m]
                has = np.array(
                    [len(self.neighbors[k][int(v)]) > 0 for v in nodes])
                safe = np.where(has, nodes, 0)
                local = self.tables[k].draw(safe, rng)
                stepped = np.array(
                    [self.neighbors[k][int(v)][int(j)]
                     if h else int(v)
                     for v, j, h in zip(nodes, local, has)])
                nxt[m] = stepped
            cur = nxt
            walks[:, t] = cur
        return walks
