"""Block-compressed sparse row (BCSR) graphs: dense tiles on the MXU.

The speed-of-light SpMM path for locality-clustered graphs. After RCM
reordering (core/reorder.py) the adjacency's nonzeros concentrate into a
small set of (row_block × col_block) tiles; materialising those tiles
densely turns ``out[r] = Σ w_sr · x[s]`` (1 random HBM row read per edge —
the measured wall of the COO path, PERF_NOTES.md) into

    out_block[rb] = Σ_t  tiles[t] @ x_block[col_id[t]]       # MXU matmuls

where every operand streams sequentially. Per-edge traffic drops from
``F·4`` bytes (512 B at F=128) to ``(RB·CB + CB·F)·bytes / nnz_per_tile``
— a win whenever mean tile fill exceeds ~2%.

Replaces ``torch.spmm`` (GCN/GCN.py:43) for static-weight adjacencies
(GCN's normalised A, SAGE mean); per-step dynamic weights (GAT attention)
keep the COO kernel, whose edge values change every step.

Build is host-side at graph-build time (like the reference's scipy
normalise passes, GCN/data_utils.py:27-70).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

ROW_BLOCK = 128   # output rows per tile  (MXU-native)
COL_BLOCK = 128   # x rows per tile       (MXU-native)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSRGraph:
    """Row-sorted dense tiles + per-row-block tile spans.

    ``tiles[t]`` holds the edge weights of tile t densely:
    ``tiles[t, i, j] = w`` for edge (s=col_id[t]·CB+j → r=row_id[t]·RB+i).
    Tiles are sorted by row block; ``tile_off/tile_cnt`` index each row
    block's contiguous span (same scheme as the COO kernel's chunk spans).
    """

    tiles: jax.Array      # float32[T_pad, ROW_BLOCK, COL_BLOCK]
    col_ids: jax.Array    # int32[T_pad] column-block index per tile
    row_ids: jax.Array    # int32[T_pad] row-block index per tile
    tile_off: jax.Array   # int32[n_row_blocks]
    tile_cnt: jax.Array   # int32[n_row_blocks]
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    n_node_pad: int = dataclasses.field(metadata=dict(static=True))
    max_tiles: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return int(self.tiles.shape[0])

    @property
    def fill(self) -> float:
        """Mean fraction of tile slots that hold a real edge."""
        return self.n_edges / max(
            self.n_tiles * ROW_BLOCK * COL_BLOCK, 1)


def build_bcsr(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    dtype=np.float32,
    max_bytes: int = 2 << 30,
) -> BCSRGraph:
    """Host build: group edges into (row_block, col_block) tiles, densify.

    Duplicate edges accumulate (matching COO/segment-sum semantics).
    Raises ``ValueError`` when the dense tile store would exceed
    ``max_bytes`` — a graph without locality (run core/reorder.py first)
    would explode into one near-empty tile per edge; callers catch this
    and keep the COO layout.
    """
    s = np.asarray(senders, np.int64).ravel()
    r = np.asarray(receivers, np.int64).ravel()
    n_edges = len(s)
    w = (np.ones(n_edges, np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32).ravel())

    n_rb = -(-max(n_nodes, 1) // ROW_BLOCK)
    n_cb = -(-max(n_nodes, 1) // COL_BLOCK)
    rb = r // ROW_BLOCK
    cb = s // COL_BLOCK
    key = rb * n_cb + cb
    uniq, tile_of_edge = np.unique(key, return_inverse=True)
    T = max(len(uniq), 1)
    store = T * ROW_BLOCK * COL_BLOCK * np.dtype(dtype).itemsize
    if store > max_bytes:
        raise ValueError(
            f"BCSR tile store would be {store/1e9:.1f} GB ({T} tiles, "
            f"fill {n_edges/max(T*ROW_BLOCK*COL_BLOCK,1):.4f}) — the graph "
            f"lacks block locality; reorder with core.reorder."
            f"locality_order or keep the COO layout")

    tiles = np.zeros((T, ROW_BLOCK, COL_BLOCK), np.float32)
    np.add.at(tiles, (tile_of_edge, r % ROW_BLOCK, s % COL_BLOCK), w)

    row_ids = (uniq // n_cb).astype(np.int32) if len(uniq) else \
        np.zeros(1, np.int32)
    col_ids = (uniq % n_cb).astype(np.int32) if len(uniq) else \
        np.zeros(1, np.int32)
    # np.unique returns sorted keys → tiles already row-major sorted.
    bounds = np.arange(n_rb + 1) * n_cb
    off = np.searchsorted(uniq if len(uniq) else np.zeros(1), bounds,
                          side="left")
    tile_off = off[:-1].astype(np.int32)
    tile_cnt = (off[1:] - off[:-1]).astype(np.int32)
    max_tiles = int(max(tile_cnt.max(initial=1), 1))

    return BCSRGraph(
        tiles=jnp.asarray(tiles.astype(dtype)),
        col_ids=jnp.asarray(col_ids),
        row_ids=jnp.asarray(row_ids),
        tile_off=jnp.asarray(tile_off),
        tile_cnt=jnp.asarray(tile_cnt),
        n_nodes=int(n_nodes),
        n_edges=int(n_edges),
        n_node_pad=n_rb * ROW_BLOCK,
        max_tiles=max_tiles,
    )


def build_bcsr_transpose(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    edge_weight: Optional[np.ndarray] = None, **kw,
) -> BCSRGraph:
    """Aᵀ tiles — the backward operator of ``bcsr_spmm`` (d/dx)."""
    return build_bcsr(receivers, senders, n_nodes, edge_weight, **kw)


#: Remainder sub-chunk width for the one-kernel attend: the SpMM kernel's
#: 1024-edge chunks round every row block's remainder span UP to a full
#: chunk, so sparse remainders process ~n_rb·1024 edge-slots regardless
#: of E_rem; 256-edge sub-chunks cut that floor 4× (the attend kernel's
#: per-visit work scales with the chunk width).
ATTEND_CHUNK = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridGraph:
    """Dense tiles for the well-filled blocks + COO remainder for the rest.

    Real clustered graphs are communities plus a few percent of random
    long-range edges; those stragglers would each cost a near-empty 64 KB
    tile, so they stay on the COO kernel while the community mass rides
    the MXU tiles. ``spmm`` on this container is the sum of both parts —
    each part carries its own custom VJP, so autodiff composes.

    Break-even: a tile costs ~(RB·CB + CB·F)·4 B of traffic, a COO edge
    ~F·4 B, so a tile pays for itself above ~RB·CB/F ≈ 128–256 edges.

    ``rem_fine_*`` are the remainder's chunk spans at ATTEND_CHUNK
    granularity (same receiver-sorted edges) for the attend kernel.
    """

    bcsr: BCSRGraph
    bcsr_t: BCSRGraph          # Aᵀ tiles (backward); same object if symmetric
    rem: object                # core.graph.Graph — COO remainder
    rem_fine_off: jax.Array    # int32[n_row_blocks]
    rem_fine_cnt: jax.Array    # int32[n_row_blocks]
    # transpose remainder (sender-sorted) + its fine spans — the
    # backward kernel's dx/dfs pass owns SENDER rows
    rem_t: object              # core.graph.Graph — Aᵀ COO remainder
    rem_t_fine_off: jax.Array  # int32[n_row_blocks]
    rem_t_fine_cnt: jax.Array  # int32[n_row_blocks]
    # dropout-mask alignment for the backward kernels: transpose tile t'
    # covers the same edges as forward tile bits_tmap[t'] (transposed),
    # and transpose-remainder slot k the same edge as remainder slot
    # rem_t_eperm[k] — so per-step Bernoulli masks drawn in the forward
    # layout can be viewed exactly in the transpose layout.
    bits_tmap: jax.Array       # int32[T_t]
    rem_t_eperm: jax.Array     # int32[E_pad_t]
    rem_fine_max: int = dataclasses.field(metadata=dict(static=True))
    rem_t_fine_max: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_nodes(self) -> int:
        return self.bcsr.n_nodes

    @property
    def n_edges(self) -> int:
        return self.bcsr.n_edges + self.rem.n_edges

    @property
    def tiled_fraction(self) -> float:
        return self.bcsr.n_edges / max(self.n_edges, 1)


def build_hybrid(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    min_edges_per_tile: int = 192,
    symmetric: bool = False,
    dtype=np.float32,
) -> HybridGraph:
    """Split edges by tile fill: tiles holding ≥ ``min_edges_per_tile``
    edges are densified; the rest stay COO. ``symmetric=True`` reuses the
    forward tiles as the backward operator (valid for symmetric A, e.g.
    GCN's D^-1/2(A+I)D^-1/2; the fill-threshold split preserves symmetry
    because tile (i,j) and (j,i) have equal counts)."""
    from .graph import build_graph

    s = np.asarray(senders, np.int64).ravel()
    r = np.asarray(receivers, np.int64).ravel()
    w = (np.ones(len(s), np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32).ravel())

    n_cb = -(-max(n_nodes, 1) // COL_BLOCK)
    key = (r // ROW_BLOCK) * n_cb + (s // COL_BLOCK)
    uniq, inv, cnt = np.unique(key, return_inverse=True,
                               return_counts=True)
    dense = cnt[inv] >= min_edges_per_tile

    bg = build_bcsr(s[dense], r[dense], n_nodes, w[dense], dtype=dtype)
    bg_t = (bg if symmetric else
            build_bcsr_transpose(s[dense], r[dense], n_nodes, w[dense],
                                 dtype=dtype))
    rem = build_graph(s[~dense].astype(np.int32),
                      r[~dense].astype(np.int32), n_nodes,
                      w[~dense])
    rem_t = build_graph(r[~dense].astype(np.int32),
                        s[~dense].astype(np.int32), n_nodes,
                        w[~dense])
    from ..ops.pallas.spmm_kernel import compute_chunk_spans
    f_off, f_cnt, f_max = compute_chunk_spans(
        np.asarray(rem.receivers), n_nodes, chunk=ATTEND_CHUNK)
    ft_off, ft_cnt, ft_max = compute_chunk_spans(
        np.asarray(rem_t.receivers), n_nodes, chunk=ATTEND_CHUNK)

    # dropout-mask alignment (see HybridGraph docstring). Transpose tile
    # (sb, rbb) covers forward tile (rb=rbb, cb=sb); per-edge, the sorts
    # are both stable over the same remainder subset, so composing the
    # two argsorts gives slot-exact correspondence.
    fkeys = (np.asarray(bg.row_ids, np.int64) * n_cb
             + np.asarray(bg.col_ids, np.int64))
    tkeys = (np.asarray(bg_t.col_ids, np.int64) * n_cb
             + np.asarray(bg_t.row_ids, np.int64))
    bits_tmap = np.searchsorted(fkeys, tkeys).astype(np.int32)
    bits_tmap = np.minimum(bits_tmap, len(fkeys) - 1)
    sub_s = s[~dense]
    sub_r = r[~dense]
    order_r = np.argsort(sub_r, kind="stable")
    order_s = np.argsort(sub_s, kind="stable")
    inv_r = np.empty(len(order_r), np.int64)
    inv_r[order_r] = np.arange(len(order_r))
    eperm = np.zeros(int(rem_t.senders.shape[0]), np.int32)
    if len(order_s):
        eperm[: len(order_s)] = inv_r[order_s]
    return HybridGraph(bcsr=bg, bcsr_t=bg_t, rem=rem,
                       rem_fine_off=jnp.asarray(f_off),
                       rem_fine_cnt=jnp.asarray(f_cnt),
                       rem_t=rem_t,
                       rem_t_fine_off=jnp.asarray(ft_off),
                       rem_t_fine_cnt=jnp.asarray(ft_cnt),
                       bits_tmap=jnp.asarray(bits_tmap),
                       rem_t_eperm=jnp.asarray(eperm),
                       rem_fine_max=int(f_max),
                       rem_t_fine_max=int(ft_max))


def bcsr_memory_bytes(n_edges: int, senders, receivers,
                      n_nodes: int) -> int:
    """Tile-store footprint without building (for the layout heuristic)."""
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    n_cb = -(-max(n_nodes, 1) // COL_BLOCK)
    key = (r // ROW_BLOCK) * n_cb + (s // COL_BLOCK)
    t = len(np.unique(key))
    return t * ROW_BLOCK * COL_BLOCK * 4


def tiled_edge_fraction(senders, receivers, n_nodes: int,
                        min_edges_per_tile: int = 192) -> float:
    """Fraction of edge mass in tiles holding >= ``min_edges_per_tile``
    edges — the edges ``build_hybrid`` would densify. This (not raw tile
    count) is the objective an ordering must win: an ordering can have
    FEWER tiles yet spread edges so uniformly that none clears the
    per-tile break-even (measured: RCM 0.077 vs LPA 0.906 at equal-ish
    tile counts on an 8k community graph)."""
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    if len(s) == 0:
        return 0.0
    n_cb = -(-max(n_nodes, 1) // COL_BLOCK)
    key = (r // ROW_BLOCK) * n_cb + (s // COL_BLOCK)
    _, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    return float((cnt[inv] >= min_edges_per_tile).mean())
