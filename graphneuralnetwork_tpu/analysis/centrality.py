"""Centrality and graph-structure metrics as dense MXU iterations.

TPU-native replacement for the reference's networkx centrality demo
(Basis/networkx_study.py:11-31: degree, connected components, diameter,
degree/eigenvector/betweenness/closeness centrality, pagerank, HITS).

Design: all metrics operate on a dense float32 adjacency ``A`` ([N, N],
``A[i, j] = w`` for edge i→j). BFS is level-synchronous — the frontier is a
[S, N] 0/1 matrix advanced by one matmul per level — and Brandes'
betweenness runs *batched over all sources at once*, so each level of the
forward (path-counting) and backward (dependency) sweeps is a single
[N, N] @ [N, N] matmul. Semantics match networkx's defaults on the graphs
the Basis demo uses (undirected; see each docstring), verified in
tests/test_analysis.py.
"""

from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph

_Adj = Union[jax.Array, np.ndarray]

#: Sentinel for "unreachable" in the integer distance matrix.
_UNREACHED = jnp.iinfo(jnp.int32).max


def to_dense_adjacency(graph: Graph, symmetrize: bool = False) -> jax.Array:
    """Densify a padded COO ``Graph`` into float32 [N, N] (weights kept;
    padding edges carry zero weight so they vanish)."""
    n = graph.n_nodes
    flat = graph.senders.astype(jnp.int32) * n + graph.receivers
    a = jnp.zeros((n * n,), jnp.float32).at[flat].add(graph.edge_weight)
    a = a.reshape(n, n)
    if symmetrize:
        a = jnp.maximum(a, a.T)
    return a


def _as_dense(a) -> jax.Array:
    if isinstance(a, Graph):
        return to_dense_adjacency(a)
    return jnp.asarray(a, jnp.float32)


# ---------------------------------------------------------------------------
# Degree
# ---------------------------------------------------------------------------

def degree_centrality(a: _Adj) -> jax.Array:
    """deg(v) / (n - 1) over the binarized adjacency (nx.degree_centrality)."""
    a = _as_dense(a)
    n = a.shape[0]
    deg = (a > 0).sum(axis=1).astype(jnp.float32)
    return deg / jnp.float32(max(n - 1, 1))


# ---------------------------------------------------------------------------
# Spectral: eigenvector / pagerank / HITS (power iterations)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_iter",))
def eigenvector_centrality(a: _Adj, max_iter: int = 200,
                           tol: float = 1e-8) -> jax.Array:
    """Principal eigenvector of A, L2-normalized.

    Power iteration on (A + I) — the shift keeps bipartite graphs from
    oscillating without changing the eigenvector, the same trick networkx's
    eigenvector_centrality uses (x ← x + Aᵀx per sweep).
    """
    a = _as_dense(a)
    n = a.shape[0]
    x0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def body(state):
        x, _, it = state
        nxt = x + a.T @ x
        nxt = nxt / jnp.maximum(jnp.linalg.norm(nxt), 1e-30)
        return nxt, jnp.abs(nxt - x).sum(), it + 1

    def cond(state):
        _, err, it = state
        return (err > n * tol) & (it < max_iter)

    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.float32(jnp.inf), 0))
    return x


@partial(jax.jit, static_argnames=("max_iter",))
def pagerank(a: _Adj, alpha: float = 0.85, max_iter: int = 200,
             tol: float = 1e-10) -> jax.Array:
    """Standard PageRank with dangling-node mass redistribution
    (nx.pagerank semantics: L1-normalized, personalization uniform)."""
    a = _as_dense(a)
    n = a.shape[0]
    out_w = a.sum(axis=1)
    dangling = out_w <= 0
    p = jnp.where(dangling[:, None], 0.0,
                  a / jnp.maximum(out_w, 1e-30)[:, None])
    x0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def body(state):
        x, _, it = state
        dangle_mass = jnp.where(dangling, x, 0.0).sum()
        nxt = alpha * (p.T @ x + dangle_mass / n) + (1.0 - alpha) / n
        return nxt, jnp.abs(nxt - x).sum(), it + 1

    def cond(state):
        _, err, it = state
        return (err > n * tol) & (it < max_iter)

    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.float32(jnp.inf), 0))
    return x


@partial(jax.jit, static_argnames=("max_iter",))
def hits(a: _Adj, max_iter: int = 200, tol: float = 1e-8):
    """HITS hubs/authorities (nx.hits semantics: max-normalized during
    iteration, L1-normalized outputs). Returns ``(hubs, authorities)``."""
    a = _as_dense(a)
    n = a.shape[0]
    h0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def body(state):
        h, _, it = state
        auth = a.T @ h
        auth = auth / jnp.maximum(auth.max(), 1e-30)
        hub = a @ auth
        hub = hub / jnp.maximum(hub.max(), 1e-30)
        return hub, jnp.abs(hub - h).sum(), it + 1

    def cond(state):
        _, err, it = state
        return (err > tol) & (it < max_iter)

    h, _, _ = jax.lax.while_loop(cond, body, (h0, jnp.float32(jnp.inf), 0))
    auth = a.T @ h
    return h / jnp.maximum(h.sum(), 1e-30), auth / jnp.maximum(auth.sum(), 1e-30)


# ---------------------------------------------------------------------------
# BFS family: distances / closeness / diameter / components
# ---------------------------------------------------------------------------

@jax.jit
def bfs_distances(a: _Adj) -> jax.Array:
    """All-pairs unweighted shortest-path lengths, int32 [N, N].

    Level-synchronous: the frontier of every source advances together via
    one [N, N] @ [N, N] matmul per BFS level. Unreachable pairs hold
    ``iinfo(int32).max``.
    """
    a = (_as_dense(a) > 0).astype(jnp.float32)
    n = a.shape[0]
    eye = jnp.eye(n, dtype=bool)
    dist0 = jnp.where(eye, 0, _UNREACHED).astype(jnp.int32)

    def body(state):
        dist, frontier, d = state
        nxt = ((frontier @ a) > 0) & (dist == _UNREACHED)
        dist = jnp.where(nxt, d + 1, dist)
        return dist, nxt.astype(jnp.float32), d + 1

    def cond(state):
        _, frontier, d = state
        return (frontier.sum() > 0) & (d < n)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, eye.astype(jnp.float32), jnp.int32(0)))
    return dist


def closeness_centrality(a: _Adj) -> jax.Array:
    """nx.closeness_centrality (wf_improved=True): for each node v with
    r reachable nodes and distance sum s, ``(r-1)/s * (r-1)/(n-1)``."""
    a = _as_dense(a)
    n = a.shape[0]
    dist = bfs_distances(a)
    reach = (dist != _UNREACHED)
    s = jnp.where(reach, dist, 0).sum(axis=1).astype(jnp.float32)
    r = reach.sum(axis=1).astype(jnp.float32)  # includes self
    cc = jnp.where(s > 0, (r - 1.0) / jnp.maximum(s, 1e-30), 0.0)
    return cc * (r - 1.0) / jnp.float32(max(n - 1, 1))


def diameter(a: _Adj) -> int:
    """Longest shortest path (raises on disconnected graphs, like nx)."""
    dist = bfs_distances(_as_dense(a))
    if bool((dist == _UNREACHED).any()):
        raise ValueError("graph is not connected: diameter is infinite")
    return int(dist.max())


@jax.jit
def connected_components(a: _Adj) -> jax.Array:
    """Component labels int32 [N] (label = min node index in the component),
    via min-label propagation: one masked min-reduction over neighbors per
    round, O(diameter) rounds."""
    a = (_as_dense(a) > 0)
    a = a | a.T  # components are defined on the undirected closure
    n = a.shape[0]
    lab0 = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        lab, _ = state
        nbr = jnp.where(a, lab[None, :], n).min(axis=1).astype(jnp.int32)
        nxt = jnp.minimum(lab, nbr)
        return nxt, jnp.any(nxt != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


# ---------------------------------------------------------------------------
# Betweenness: batched all-sources Brandes
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("normalized",))
def betweenness_centrality(a: _Adj, normalized: bool = True) -> jax.Array:
    """Shortest-path betweenness for undirected graphs (nx defaults).

    Brandes' algorithm vectorized over ALL sources simultaneously. With
    ``dist``/``sigma``/``delta`` as [S, N] matrices (S = N sources), each
    BFS level of the forward path-counting pass and the backward dependency
    pass is one dense matmul:

      forward:   σ_d   += ((σ ⊙ [dist = d-1]) @ A) ⊙ [dist = d]
      backward:  δ_d-1 += σ ⊙ (((1+δ) / σ ⊙ [dist = d]) @ Aᵀ) ⊙ [dist = d-1]

    which is the level-set form of Brandes' predecessor sums. Accumulation
    skips w = s (delta[s, s] never counts), matching the sequential
    algorithm. ``normalized=True`` divides by (n-1)(n-2); ``False`` halves
    (undirected double count) — both per nx._rescale.
    """
    a = (_as_dense(a) > 0).astype(jnp.float32)
    a = jnp.maximum(a, a.T)
    n = a.shape[0]
    dist = bfs_distances(a)  # [S, N]
    reach = dist != _UNREACHED
    maxd = jnp.where(reach, dist, 0).max()

    eye = jnp.eye(n, dtype=jnp.float32)

    def fwd_body(d, sigma):
        prev = jnp.where(dist == d - 1, sigma, 0.0)
        grow = (prev @ a) * (dist == d)
        return sigma + grow

    sigma = jax.lax.fori_loop(1, maxd + 1, fwd_body, eye)

    def bwd_body(i, delta):
        d = maxd - i  # maxd, maxd-1, ..., 1
        coeff = jnp.where(dist == d, (1.0 + delta) / jnp.maximum(sigma, 1e-30),
                          0.0)
        back = (coeff @ a.T) * (dist == d - 1) * sigma
        return delta + back

    delta = jax.lax.fori_loop(0, maxd, bwd_body, jnp.zeros((n, n),
                                                           jnp.float32))
    bc = jnp.where(jnp.eye(n, dtype=bool), 0.0, delta).sum(axis=0)
    if normalized:
        scale = 1.0 / max((n - 1) * (n - 2), 1)
    else:
        scale = 0.5
    return bc * scale
