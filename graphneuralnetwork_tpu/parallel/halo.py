"""Halo-exchange edge-partitioned SpMM — the scaling fast path.

The v1 sharded path (parallel/sharded.py) all-gathers every node feature to
every device: O(N·F) ICI traffic per layer. This module exchanges only the
**boundary** features each device actually needs (the graph analogue of
ring attention's sequence-parallel exchange, SURVEY.md §2.3/§5):

  * owner-computes node sharding as before (receiver-owned edges);
  * each shard's edges split into INTERIOR (sender local) and BOUNDARY
    (sender remote);
  * per device pair (d ← p), the host precomputes which of p's rows d
    needs; features cross via one `all_to_all` of padded [D, H, F] slabs;
  * aggregation runs as interior + boundary partial sums, so XLA can
    overlap the interior aggregation with the in-flight collective.

ICI traffic per layer: O(boundary × F) instead of O(N × F) — for a
well-partitioned graph the boundary is a small fraction of N.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.spmm_kernel import EDGE_CHUNK, ROW_BLOCK, compute_chunk_spans


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloGraph:
    """Edge-partitioned graph with precomputed halo exchange plan.

    Stacked [D, ...] leaves sharded P(axis). Interior edges index local
    rows; boundary edges index the received halo buffer ([D·H, F] laid out
    as peer-major slots).
    """

    # interior edges (senders local to the shard)
    int_senders: jax.Array     # int32[D, Ei] LOCAL sender idx
    int_receivers: jax.Array   # int32[D, Ei] local receiver idx
    int_weight: jax.Array      # f32[D, Ei]
    int_off: jax.Array         # int32[D, B]
    int_cnt: jax.Array         # int32[D, B]
    # boundary edges (senders on other shards → halo buffer slots)
    bnd_senders: jax.Array     # int32[D, Eb] halo-slot idx (p*H + k)
    bnd_receivers: jax.Array   # int32[D, Eb]
    bnd_weight: jax.Array      # f32[D, Eb]
    bnd_off: jax.Array         # int32[D, B]
    bnd_cnt: jax.Array         # int32[D, B]
    # exchange plan: local row indices this shard sends to each peer
    send_idx: jax.Array        # int32[D, D, H] local row idx (0 pad)
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_node_pad: int = dataclasses.field(metadata=dict(static=True))
    nodes_per_shard: int = dataclasses.field(metadata=dict(static=True))
    halo_size: int = dataclasses.field(metadata=dict(static=True))
    int_max_chunks: int = dataclasses.field(metadata=dict(static=True))
    bnd_max_chunks: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    # OPTIONAL tiled interior (core/bcsr.py brought to the sharded path):
    # per shard, the well-filled interior blocks as dense 128×128 tiles;
    # the straggler interior edges remain in int_* above. None = pure COO.
    int_tiles: Optional[jax.Array] = None      # f32[D, T, 128, 128]
    int_tile_col: Optional[jax.Array] = None   # int32[D, T]
    int_tile_row: Optional[jax.Array] = None   # int32[D, T]
    # True iff the partition was built from UNIT edge weights, so tile
    # entries are integral edge multiplicities. gat_halo_attend requires
    # this: its tiled softmax treats tile values as edge counts, which is
    # NOT GAT semantics for weighted partitions (e.g. GCN sym-normalized
    # ones, whose COO/boundary edges use weights as masks only).
    unit_edge_weights: bool = dataclasses.field(
        default=True, metadata=dict(static=True))

    @property
    def n_devices(self):
        return self.send_idx.shape[0]


def partition_graph_halo(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    edge_weight: Optional[np.ndarray] = None, *,
    mesh: Mesh, axis: str = "data",
    tiled_interior: bool = False, min_edges_per_tile: int = 192,
) -> HaloGraph:
    """``tiled_interior=True`` additionally densifies each shard's
    well-filled interior (receiver-local × sender-local) 128×128 blocks
    into MXU tiles (core/bcsr.py brought to the sharded path) — the
    multi-chip composition of the two fast paths: boundary rows ride the
    all_to_all, the clustered interior mass rides dense tile matmuls, and
    only straggler interior edges take the COO kernel."""
    n_dev = mesh.shape[axis]
    senders = np.asarray(senders, np.int64).ravel()
    receivers = np.asarray(receivers, np.int64).ravel()
    unit_weights = edge_weight is None
    if edge_weight is None:
        edge_weight = np.ones(len(senders), np.float32)
    edge_weight = np.asarray(edge_weight, np.float32).ravel()
    unit_weights = unit_weights or bool(np.all(edge_weight == 1.0))

    nps = _round_up(max(n_nodes, 1), ROW_BLOCK * n_dev) // n_dev
    owner = senders // nps

    # per-shard edge splits + halo need sets
    shards = []
    need: list[list[np.ndarray]] = []   # need[d][p] = global ids from p
    for d in range(n_dev):
        lo, hi = d * nps, (d + 1) * nps
        m = (receivers >= lo) & (receivers < hi)
        s, r, w, o = senders[m], receivers[m] - lo, edge_weight[m], owner[m]
        interior = o == d
        shards.append(dict(
            si=s[interior] - lo, ri=r[interior], wi=w[interior],
            sb=s[~interior], rb=r[~interior], wb=w[~interior],
            ob=o[~interior]))
        nd = []
        for p in range(n_dev):
            ids = (np.unique(shards[d]["sb"][shards[d]["ob"] == p])
                   if p != d else np.zeros(0, np.int64))
            nd.append(ids)
        need.append(nd)

    # Optional interior tiling: per shard, move edges in well-filled
    # (row_block, col_block) blocks into dense tiles; keep the rest COO.
    TILES = TCOL = TROW = None
    if tiled_interior:
        from ..core.bcsr import COL_BLOCK as CB, ROW_BLOCK as RB

        n_cb_loc = nps // CB
        per_shard = []
        for sh in shards:
            si, ri, wi = sh["si"], sh["ri"], sh["wi"]
            key = (ri // RB) * n_cb_loc + (si // CB)
            uniq, inv_k, cnt = np.unique(
                key, return_inverse=True, return_counts=True) \
                if len(key) else (np.zeros(0, np.int64),
                                  np.zeros(0, np.int64),
                                  np.zeros(0, np.int64))
            dense = (cnt[inv_k] >= min_edges_per_tile) if len(key) else \
                np.zeros(0, bool)
            dkey = key[dense]
            duniq, dinv = (np.unique(dkey, return_inverse=True)
                           if dense.any() else
                           (np.zeros(0, np.int64), np.zeros(0, np.int64)))
            t = np.zeros((max(len(duniq), 1), RB, CB), np.float32)
            if dense.any():
                np.add.at(t, (dinv, ri[dense] % RB, si[dense] % CB),
                          wi[dense])
            trow = (duniq // n_cb_loc).astype(np.int32) \
                if len(duniq) else np.zeros(1, np.int32)
            tcol = (duniq % n_cb_loc).astype(np.int32) \
                if len(duniq) else np.zeros(1, np.int32)
            per_shard.append((t, tcol, trow))
            # stragglers stay on the COO interior path
            sh["si"], sh["ri"], sh["wi"] = \
                si[~dense], ri[~dense], wi[~dense]
        T = max(t.shape[0] for t, _, _ in per_shard)
        TILES = np.zeros((n_dev, T, RB, CB), np.float32)
        TCOL = np.zeros((n_dev, T), np.int32)
        TROW = np.zeros((n_dev, T), np.int32)
        for d, (t, tcol, trow) in enumerate(per_shard):
            TILES[d, : t.shape[0]] = t
            TCOL[d, : len(tcol)] = tcol
            TROW[d, : len(trow)] = trow
            # Pad the tail with the LAST real row-block index (trow is
            # sorted ascending), keeping the indices_are_sorted=True hint
            # on the tiled segment ops honest — zero-padding after larger
            # values violated it (ADVICE r3); padded tiles are all-zero so
            # they contribute 0 to sums and NEG to maxes either way.
            TROW[d, len(trow):] = trow[-1] if len(trow) else 0

    H = max(
        max((len(ids) for nd in need for ids in nd), default=1), 1)
    H = _round_up(H, 8)

    # send plan: what d sends to p = need[p][d], as LOCAL row idx of d
    send_idx = np.zeros((n_dev, n_dev, H), np.int32)
    for d in range(n_dev):
        for p in range(n_dev):
            ids = need[p][d]
            send_idx[d, p, :len(ids)] = (ids - d * nps).astype(np.int32)

    def pack(key_s, key_r, key_w, remap=None, ob=None, d=None):
        """Sort by receiver, pad, spans."""
        s, r, w = key_s, key_r, key_w
        order = np.argsort(r, kind="stable")
        s, r, w = s[order], r[order], w[order]
        if remap is not None:
            s = remap(s, ob[order])
        return s.astype(np.int64), r, w

    Ei = max(_round_up(max((len(sh["si"]) for sh in shards), default=1),
                       EDGE_CHUNK), EDGE_CHUNK)
    Eb = max(_round_up(max((len(sh["sb"]) for sh in shards), default=1),
                       EDGE_CHUNK), EDGE_CHUNK)
    B = nps // ROW_BLOCK

    SI = np.zeros((n_dev, Ei), np.int32)
    RI = np.zeros((n_dev, Ei), np.int32)
    WI = np.zeros((n_dev, Ei), np.float32)
    OFF_I = np.zeros((n_dev, B), np.int32)
    CNT_I = np.zeros((n_dev, B), np.int32)
    SB = np.zeros((n_dev, Eb), np.int32)
    RB = np.zeros((n_dev, Eb), np.int32)
    WB = np.zeros((n_dev, Eb), np.float32)
    OFF_B = np.zeros((n_dev, B), np.int32)
    CNT_B = np.zeros((n_dev, B), np.int32)
    mc_i = mc_b = 1
    for d, sh in enumerate(shards):
        # interior
        s, r, w = pack(sh["si"], sh["ri"], sh["wi"])
        k = len(s)
        SI[d, :k], RI[d, :k], WI[d, :k] = s, r, w
        if k < Ei:
            RI[d, k:] = nps - 1
        lo_, cnt_, mc = compute_chunk_spans(RI[d], nps)
        OFF_I[d], CNT_I[d] = lo_, cnt_
        mc_i = max(mc_i, mc)
        # boundary: remap sender global id → halo slot p*H + rank
        slot_map = {}
        for p in range(n_dev):
            for kk, gid in enumerate(need[d][p]):
                slot_map[int(gid)] = p * H + kk

        def remap(s_arr, ob_arr):
            return np.array([slot_map[int(g)] for g in s_arr], np.int64)

        s, r, w = pack(sh["sb"], sh["rb"], sh["wb"],
                       remap=remap, ob=sh["ob"], d=d)
        k = len(s)
        SB[d, :k], RB[d, :k], WB[d, :k] = s, r, w
        if k < Eb:
            RB[d, k:] = nps - 1
        lo_, cnt_, mc = compute_chunk_spans(RB[d], nps)
        OFF_B[d], CNT_B[d] = lo_, cnt_
        mc_b = max(mc_b, mc)

    sh_ = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(jnp.asarray(a), sh_)
    return HaloGraph(
        int_senders=put(SI), int_receivers=put(RI), int_weight=put(WI),
        int_off=put(OFF_I), int_cnt=put(CNT_I),
        bnd_senders=put(SB), bnd_receivers=put(RB), bnd_weight=put(WB),
        bnd_off=put(OFF_B), bnd_cnt=put(CNT_B),
        send_idx=put(send_idx),
        n_nodes=int(n_nodes), n_node_pad=int(nps * n_dev),
        nodes_per_shard=int(nps), halo_size=int(H),
        int_max_chunks=int(mc_i), bnd_max_chunks=int(mc_b),
        axis=axis, mesh=mesh,
        int_tiles=put(TILES) if TILES is not None else None,
        int_tile_col=put(TCOL) if TCOL is not None else None,
        int_tile_row=put(TROW) if TROW is not None else None,
        unit_edge_weights=unit_weights,
    )


def _pack_clusters(labels: np.ndarray, n_dev: int, nps: int,
                   n_nodes: int) -> np.ndarray:
    """Best-fit-decreasing packing of whole clusters into shard slices.

    Shard d owns ids [d·nps, (d+1)·nps) ∩ [0, n); placing each cluster
    wholly inside one shard's range (splitting only clusters larger than
    a shard) keeps intra-cluster edges off the boundary. Returns
    ``perm[new] = old`` filling every position exactly.
    """
    caps = [max(0, min(nps, n_nodes - d * nps)) for d in range(n_dev)]
    uniq, counts = np.unique(labels, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    bins: list[list[np.ndarray]] = [[] for _ in range(n_dev)]
    free = list(caps)
    for k in order:
        nodes = np.flatnonzero(labels == uniq[k])
        while len(nodes):
            d = int(np.argmax(free))
            take = min(len(nodes), free[d])
            if take == 0:
                break
            bins[d].append(nodes[:take])
            free[d] -= take
            nodes = nodes[take:]
    out = np.concatenate(
        [np.concatenate(b) if b else np.zeros(0, np.int64)
         for b in bins]).astype(np.int64)
    assert len(out) == n_nodes, (len(out), n_nodes)
    return out


def partition_graph_halo_clustered(
    senders: np.ndarray, receivers: np.ndarray, n_nodes: int,
    edge_weight: Optional[np.ndarray] = None, *,
    mesh: Mesh, axis: str = "data",
    tiled_interior: bool = True, min_edges_per_tile: int = 192,
):
    """Locality-cluster the nodes first (core/reorder.py), THEN partition:
    contiguous shard slices then align with communities, so far fewer
    edges cross shards (lower ICI traffic) and the interior tiles densify.
    This is the graph analogue of METIS-partition-then-distribute.

    Returns ``(halo_graph, perm)`` with ``perm[new] = old`` — permute node
    features/labels by ``perm`` before ``shard_nodes_halo``.
    """
    from ..core.reorder import (cluster_order, label_propagation,
                                rcm_order, relabel_edges)

    # Pick the ordering that minimises CROSS-SHARD edges (the partition
    # objective — different from BCSR's tile-count objective): bin-packed
    # label-propagation clusters for community graphs (naive cluster
    # concatenation lets a slice boundary cut a big cluster in half,
    # which turns ~half its intra edges into boundary edges), plain
    # cluster order, or RCM for banded graphs.
    n_dev = mesh.shape[axis]
    nps = _round_up(max(n_nodes, 1), ROW_BLOCK * n_dev) // n_dev
    lab = label_propagation(senders, receivers, n_nodes)
    best_perm, best_cross = None, None
    for cand in (_pack_clusters(lab, n_dev, nps, n_nodes),
                 cluster_order(senders, receivers, n_nodes),
                 rcm_order(senders, receivers, n_nodes)):
        s2, r2 = relabel_edges(cand, senders, receivers)
        cross = int(np.sum((s2 // nps) != (r2 // nps)))
        if best_cross is None or cross < best_cross:
            best_perm, best_cross = cand, cross
    perm = best_perm
    s2, r2 = relabel_edges(perm, senders, receivers)
    hg = partition_graph_halo(
        s2, r2, n_nodes, edge_weight, mesh=mesh, axis=axis,
        tiled_interior=tiled_interior,
        min_edges_per_tile=min_edges_per_tile)
    return hg, perm


def boundary_edge_fraction(hg: HaloGraph) -> float:
    """Fraction of real edges whose sender lives on another shard — the
    quantity that bounds ICI traffic (PERF_NOTES SCALING)."""
    bnd = int(np.asarray((hg.bnd_weight != 0).sum()))
    interior = int(np.asarray((hg.int_weight != 0).sum()))
    tiled = 0
    if hg.int_tiles is not None:
        tiled = int(np.asarray((hg.int_tiles != 0).sum()))
    total = bnd + interior + tiled
    return bnd / max(total, 1)


def spmm_halo(hg: HaloGraph, x: jax.Array) -> jax.Array:
    """out = Â @ x with x sharded P(axis) on rows.

    Per device: start the all_to_all of needed boundary rows, aggregate
    interior edges from local x (overlappable), aggregate boundary edges
    from the received halo slab, add.
    """
    from ..ops.aggregate import _aggregate_core

    n_dev = hg.n_devices
    H = hg.halo_size
    tiled = hg.int_tiles is not None
    n_extra = 3 if tiled else 0

    @partial(
        jax.shard_map, mesh=hg.mesh,
        in_specs=(P(hg.axis),) * (12 + n_extra),
        out_specs=P(hg.axis),
    )
    def f(si, ri, wi, oi, ci, sb, rb, wb, ob, cb, send_idx_, x_local,
          *tile_args):
        si, ri, wi, oi, ci = si[0], ri[0], wi[0], oi[0], ci[0]
        sb, rb, wb, ob, cb = sb[0], rb[0], wb[0], ob[0], cb[0]
        send_idx_ = send_idx_[0]                      # [D, H]

        # launch boundary exchange: rows we owe each peer
        sends = x_local[send_idx_.reshape(-1)]        # [D*H, F]
        halo = jax.lax.all_to_all(
            sends, hg.axis, split_axis=0, concat_axis=0, tiled=True)

        # interior aggregation (overlaps with the collective)
        vi = x_local[si] * wi[:, None].astype(x_local.dtype)
        out = _aggregate_core(ri, vi, oi, ci,
                              hg.nodes_per_shard, hg.int_max_chunks)

        if tiled:
            # dense-tile interior (core/bcsr.py on the local block):
            # block gather → batched MXU matmul → block segment-sum.
            from ..core.bcsr import COL_BLOCK as CB, ROW_BLOCK as RB
            tiles, tcol, trow = (a[0] for a in tile_args)
            f_dim = x_local.shape[1]
            xb = x_local.reshape(hg.nodes_per_shard // CB, CB, f_dim)
            gath = xb[tcol]                           # [T, CB, F]
            prec = (jax.lax.Precision.HIGHEST
                    if x_local.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            prod = jnp.einsum("trc,tcf->trf",
                              tiles.astype(x_local.dtype), gath,
                              precision=prec,
                              preferred_element_type=jnp.float32)
            outb = jax.ops.segment_sum(
                prod, trow, num_segments=hg.nodes_per_shard // RB,
                indices_are_sorted=True)
            out = out + outb.reshape(hg.nodes_per_shard,
                                     f_dim).astype(out.dtype)

        # boundary aggregation from halo slots
        vb = halo[sb] * wb[:, None].astype(x_local.dtype)
        out = out + _aggregate_core(rb, vb, ob, cb,
                                    hg.nodes_per_shard, hg.bnd_max_chunks)
        return out

    extra = ((hg.int_tiles, hg.int_tile_col, hg.int_tile_row)
             if tiled else ())
    return f(hg.int_senders, hg.int_receivers, hg.int_weight,
             hg.int_off, hg.int_cnt,
             hg.bnd_senders, hg.bnd_receivers, hg.bnd_weight,
             hg.bnd_off, hg.bnd_cnt,
             hg.send_idx, x, *extra)


def segment_max_halo(hg: HaloGraph, x: jax.Array) -> jax.Array:
    """out[r] = max over in-neighbours' rows — the distributed form of
    ops.segment_max (SAGE max-pool aggregation,
    GraphSAGE_Pytorch/models/Aggregator.py:18-33). Same exchange plan as
    spmm_halo: one all_to_all of boundary rows, then a local masked
    segment-max over interior ∪ boundary edges; empty segments yield 0
    (the single-device semantics).  On tiled partitions the dense-tile
    interior contributes a shard-local masked tile max (the multi-chip
    form of ops.bcsr_attention.bcsr_neighbor_max)."""
    tiled = hg.int_tiles is not None
    n_extra = 3 if tiled else 0
    n_dev = hg.n_devices
    H = hg.halo_size

    @partial(
        jax.shard_map, mesh=hg.mesh,
        in_specs=(P(hg.axis),) * (8 + n_extra),
        out_specs=P(hg.axis),
    )
    def f(si, wi, ri, sb, wb, rb, send_idx_, *rest):
        if tiled:
            tiles, tcol, trow = (a[0] for a in rest[:3])
            x_local = rest[3]
        else:
            (x_local,) = rest
        si, ri, wi = si[0], ri[0], wi[0]
        sb, rb, wb = sb[0], rb[0], wb[0]
        send_idx_ = send_idx_[0]

        sends = x_local[send_idx_.reshape(-1)]
        halo = jax.lax.all_to_all(
            sends, hg.axis, split_axis=0, concat_axis=0, tiled=True)

        neg = jnp.finfo(jnp.float32).min
        nps = hg.nodes_per_shard

        def seg_max(vals, recv, mask):
            v = jnp.where(mask[:, None], vals.astype(jnp.float32), neg)
            return jax.ops.segment_max(v, recv, num_segments=nps,
                                       indices_are_sorted=True)

        m = jnp.maximum(seg_max(x_local[si], ri, wi > 0),
                        seg_max(halo[sb], rb, wb > 0))
        if tiled:
            from ..core.bcsr import COL_BLOCK as CBK, ROW_BLOCK as RBK
            xb = x_local.astype(jnp.float32).reshape(
                nps // CBK, CBK, x_local.shape[1])
            gath = xb[tcol]                               # [T, CB, F]
            tmask = (tiles != 0)[:, :, :, None]
            contrib = jnp.max(
                jnp.where(tmask, gath[:, None, :, :], neg), axis=2)
            tmax = jax.ops.segment_max(
                contrib, trow, num_segments=nps // RBK,
                indices_are_sorted=True).reshape(nps, x_local.shape[1])
            m = jnp.maximum(m, tmax)
        # Empty segments: COO segment_max yields -inf, but the tiled path's
        # masked rows and zero-padded tile slots contribute the *finite*
        # finfo.min, so the guard must be a threshold, not isfinite
        # (ADVICE r3: isfinite leaked -3.4e38 into in-degree-0 nodes).
        return jnp.where(m > neg / 2, m, 0.0).astype(x_local.dtype)

    extra = ((hg.int_tiles, hg.int_tile_col, hg.int_tile_row)
             if tiled else ())
    return f(hg.int_senders, hg.int_weight, hg.int_receivers,
             hg.bnd_senders, hg.bnd_weight, hg.bnd_receivers,
             hg.send_idx, *extra, x)


def shard_nodes_halo(x: np.ndarray, hg: HaloGraph) -> jax.Array:
    x = np.asarray(x)
    pad = hg.n_node_pad - x.shape[0]
    if pad > 0:
        x = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    spec = P(hg.axis, *([None] * (x.ndim - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(hg.mesh, spec))
