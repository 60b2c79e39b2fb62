"""Static-shape graph containers for TPU execution.

The reference keeps graphs as scipy CSR / torch sparse tensors
(``GCN/data_utils.py:54-70``), adjacency dicts (``GraphSAGE/data_utils.py:29-40``)
or networkx graphs. None of those are XLA-traceable. Here the on-device
representation is a padded COO edge list with **static shapes**:

  * ``senders`` / ``receivers``: int32[E_pad] — edge endpoints, sorted by
    receiver (CSR order) so segment reductions see contiguous segments.
  * ``edge_weight``: float[E_pad] — 0.0 on padding edges, which makes padded
    edges vanish in every weighted aggregation without extra masks.
  * ``n_nodes`` / ``n_edges``: static Python ints baked into the trace.

Padding edges point at node index ``n_nodes`` ("ghost row") when
``pad_to_ghost=True`` so unweighted segment ops can drop them by slicing,
or at node 0 with zero weight otherwise.

Build-time normalisations replicate the reference math:
  * ``sym_normalize_adj``  = D^-1/2 (A+I) D^-1/2   (GCN/data_utils.py:54-60)
  * ``row_normalize``      = D^-1 A               (GTN/models/GTN.py:7-19)
  * feature row-normalisation                     (GCN/data_utils.py:39-51)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: Edge blocks are padded to a multiple of the Pallas edge-chunk size so
#: grids tile evenly. MUST equal ops/pallas/spmm_kernel.EDGE_CHUNK (checked
#: in build_graph; a module-level import would be circular).
EDGE_BLOCK = 1024
#: Node counts are padded to a multiple of the float32 TPU tile sublane dim.
NODE_BLOCK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A padded, static-shape COO graph living on device.

    Data fields are jnp arrays (pytree leaves); ``n_nodes``/``n_edges``/
    ``n_node_pad`` are static metadata so jitted functions specialise on them.
    """

    senders: jax.Array        # int32[E_pad]
    receivers: jax.Array      # int32[E_pad]
    edge_weight: jax.Array    # float32[E_pad]; 0 on padding
    # Pallas SpMM spans: per-128-row output block, index of the first
    # 512-edge chunk and chunk count (see ops/pallas/spmm_kernel.py).
    chunk_off: jax.Array      # int32[ceil(n_nodes/128)]
    chunk_cnt: jax.Array      # int32[ceil(n_nodes/128)]
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    n_node_pad: int = dataclasses.field(metadata=dict(static=True))
    max_chunks: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_edge_pad(self) -> int:
        return int(self.senders.shape[0])

    @property
    def edge_mask(self) -> jax.Array:
        """bool[E_pad] — True on real edges."""
        return (
            jnp.arange(self.n_edge_pad, dtype=jnp.int32) < self.n_edges
        )

    def with_weights(self, w: jax.Array) -> "Graph":
        return dataclasses.replace(self, edge_weight=w)


def build_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    sort_by_receiver: bool = True,
    edge_block: int = EDGE_BLOCK,
    node_block: int = NODE_BLOCK,
) -> Graph:
    """Host-side constructor: sort edges CSR-style, pad to static shapes."""
    senders = np.asarray(senders, dtype=np.int32).ravel()
    receivers = np.asarray(receivers, dtype=np.int32).ravel()
    n_edges = int(senders.shape[0])
    if edge_weight is None:
        edge_weight = np.ones(n_edges, dtype=np.float32)
    else:
        edge_weight = np.asarray(edge_weight, dtype=np.float32).ravel()

    e_pad = max(_round_up(max(n_edges, 1), edge_block), edge_block)
    n_pad = max(_round_up(max(n_nodes, 1), node_block), node_block)

    from ..ops.pallas.spmm_kernel import (
        EDGE_CHUNK, ROW_BLOCK, compute_chunk_spans)
    assert EDGE_BLOCK == EDGE_CHUNK, (EDGE_BLOCK, EDGE_CHUNK)

    if (sort_by_receiver and n_edges >= 16384
            and edge_block == EDGE_CHUNK):
        # Native graph compiler (native/graphbuild.cpp): parallel stable
        # counting sort + padding + chunk spans in one pass, byte-exact with
        # the numpy path below (tests/test_native.py).
        from ..sampling.native import build_graph_native
        built = build_graph_native(senders, receivers, edge_weight, n_nodes,
                                   e_pad, ROW_BLOCK, EDGE_CHUNK)
        if built is not None:
            s, r, w, lo, cnt, max_chunks = built
            return Graph(
                senders=jnp.asarray(s),
                receivers=jnp.asarray(r),
                edge_weight=jnp.asarray(w),
                chunk_off=jnp.asarray(lo),
                chunk_cnt=jnp.asarray(cnt),
                n_nodes=int(n_nodes),
                n_edges=n_edges,
                n_node_pad=int(n_pad),
                max_chunks=int(max_chunks),
            )

    if sort_by_receiver and n_edges > 0:
        order = np.argsort(receivers, kind="stable")
        senders, receivers, edge_weight = (
            senders[order],
            receivers[order],
            edge_weight[order],
        )

    s = np.zeros(e_pad, dtype=np.int32)
    r = np.zeros(e_pad, dtype=np.int32)
    w = np.zeros(e_pad, dtype=np.float32)
    s[:n_edges] = senders
    r[:n_edges] = receivers
    w[:n_edges] = edge_weight
    # Padding edges self-loop on the last (real) node with zero weight, so
    # they stay sorted-ish and contribute nothing anywhere.
    if n_edges < e_pad:
        s[n_edges:] = n_nodes - 1 if n_nodes > 0 else 0
        r[n_edges:] = n_nodes - 1 if n_nodes > 0 else 0

    if sort_by_receiver:
        lo, cnt, max_chunks = compute_chunk_spans(r, n_nodes)
    else:
        # Unsorted edges: every row block must scan every chunk (the kernel's
        # one-hot mask keeps this correct, just not fast).
        n_chunks = e_pad // edge_block
        n_row_blocks = -(-max(n_nodes, 1) // ROW_BLOCK)
        lo = np.zeros(n_row_blocks, dtype=np.int32)
        cnt = np.full(n_row_blocks, n_chunks, dtype=np.int32)
        max_chunks = n_chunks
    return Graph(
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        edge_weight=jnp.asarray(w),
        chunk_off=jnp.asarray(lo),
        chunk_cnt=jnp.asarray(cnt),
        n_nodes=int(n_nodes),
        n_edges=n_edges,
        n_node_pad=int(n_pad),
        max_chunks=int(max_chunks),
    )


def symmetrize(senders: np.ndarray, receivers: np.ndarray):
    """Make the edge set symmetric and unique (reference symmetrises Cora at
    GCN/data_utils.py:35 via ``adj + adj.T``)."""
    s = np.concatenate([senders, receivers])
    r = np.concatenate([receivers, senders])
    key = s.astype(np.int64) * (max(int(s.max(initial=0)), int(r.max(initial=0))) + 1) + r
    _, idx = np.unique(key, return_index=True)
    return s[idx], r[idx]


def add_self_loops(senders: np.ndarray, receivers: np.ndarray, n_nodes: int):
    loops = np.arange(n_nodes, dtype=np.int32)
    # Drop any existing self loops first so (A + I) has exactly one diagonal.
    keep = senders != receivers
    return (
        np.concatenate([senders[keep], loops]),
        np.concatenate([receivers[keep], loops]),
    )


def sym_normalize_weights(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
) -> np.ndarray:
    """w_ij = d_i^-1/2 * d_j^-1/2 — the GCN propagation weights
    (reference: D^-1/2 (A+I) D^-1/2, GCN/data_utils.py:54-60; caller is
    expected to have added self loops already)."""
    if edge_weight is None:
        edge_weight = np.ones(len(senders), dtype=np.float32)
    if len(senders) >= 16384:
        from ..sampling.native import normalize_edge_weights_native
        w = normalize_edge_weights_native(
            senders, receivers, edge_weight, n_nodes, "sym")
        if w is not None:
            return w
    deg = np.zeros(n_nodes, dtype=np.float64)
    np.add.at(deg, receivers, edge_weight)
    d_inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    return (
        edge_weight * d_inv_sqrt[senders] * d_inv_sqrt[receivers]
    ).astype(np.float32)


def row_normalize_weights(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
) -> np.ndarray:
    """w_ij = d_i^-1 — random-walk normalisation D^-1 A as used by GTN's
    ``norm`` (GTN/models/GTN.py:7-19) aggregating over incoming edges."""
    if edge_weight is None:
        edge_weight = np.ones(len(senders), dtype=np.float32)
    if len(senders) >= 16384:
        from ..sampling.native import normalize_edge_weights_native
        w = normalize_edge_weights_native(
            senders, receivers, edge_weight, n_nodes, "row")
        if w is not None:
            return w
    deg = np.zeros(n_nodes, dtype=np.float64)
    np.add.at(deg, receivers, edge_weight)
    d_inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
    return (edge_weight * d_inv[receivers]).astype(np.float32)


def row_normalize_features(x: np.ndarray) -> np.ndarray:
    """Row-normalise a feature matrix (GCN/data_utils.py:39-51)."""
    x = np.asarray(x, dtype=np.float32)
    s = x.sum(axis=1, keepdims=True)
    s = np.where(s == 0, 1.0, s)
    return x / s


def gcn_graph(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    **kwargs,
) -> Graph:
    """Symmetrise, add self loops, sym-normalise — the full GCN adjacency
    pipeline of GCN/data_utils.py:27-60 as one call."""
    s, r = symmetrize(np.asarray(senders, np.int32), np.asarray(receivers, np.int32))
    s, r = add_self_loops(s, r, n_nodes)
    w = sym_normalize_weights(s, r, n_nodes)
    return build_graph(s, r, n_nodes, w, **kwargs)


def gcn_graph_hybrid(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    perm: Optional[np.ndarray] = None,
):
    """GCN adjacency on the locality/BCSR fast path: cluster-reorder the
    nodes (core/reorder.py), then densify well-filled 128×128 tiles with a
    COO remainder (core/bcsr.py) — 2.9×/3.9× (f32/bf16) the COO path on
    clustered graphs (PERF_NOTES round 3).

    Returns ``(hybrid_graph, perm)`` with ``perm[new] = old``: the caller
    must permute node features/labels by ``perm`` and map index arrays
    through ``invert_permutation(perm)``. The sym-normalised adjacency is
    symmetric, so the forward tiles double as the backward operator.
    """
    from .bcsr import build_hybrid
    from .reorder import locality_order, relabel_edges

    s, r = symmetrize(np.asarray(senders, np.int32),
                      np.asarray(receivers, np.int32))
    s, r = add_self_loops(s, r, n_nodes)
    if perm is None:  # reusable from a choose_layout probe (core/layout.py)
        perm = locality_order(s, r, n_nodes)
    s, r = relabel_edges(perm, s, r)
    w = sym_normalize_weights(s, r, n_nodes)
    return build_hybrid(s, r, n_nodes, w, symmetric=True), perm


def csr_offsets(receivers: np.ndarray, n_nodes: int) -> np.ndarray:
    """Row offsets for receiver-sorted edges: int32[n_nodes+1]."""
    counts = np.bincount(receivers, minlength=n_nodes)
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)


def dense_adj(graph: Graph) -> jax.Array:
    """Materialise the weighted adjacency as a dense [N, N] matrix (tiny
    graphs / parity tests only)."""
    n = graph.n_nodes
    a = jnp.zeros((n, n), dtype=graph.edge_weight.dtype)
    w = jnp.where(graph.edge_mask, graph.edge_weight, 0.0)
    return a.at[graph.receivers, graph.senders].add(w)
