"""Multi-chip GAT attention over the halo-partitioned graph.

The attention analogue of spmm_halo (parallel/halo.py): with receiver-owned
(owner-computes) edge partitioning, the segment softmax over each node's
incoming edges is **entirely local** — every edge of a receiver lives on
its owner shard — so a full GAT layer costs exactly ONE all_to_all:

  1. per shard: h = x_local·W, source/dest logits f_src/f_dst (local);
  2. exchange [h ‖ f_src] rows for boundary senders (one padded all_to_all
     over ICI — the same plan spmm_halo uses, widened by H logit columns);
  3. everything else is local: edge scores (interior from local rows,
     boundary from the halo slab), per-receiver max/exp/denominator, and
     the weighted aggregation (Pallas kernel on TPU).

This distributes GAT (GAT/models/layers.py:94-131) the way the reference
never could — its DataParallel replicates the whole graph per GPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .halo import HaloGraph


def _seg_max_raw(scores, seg, n, mask):
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(mask[:, None], scores, neg)
    return jax.ops.segment_max(s, seg, num_segments=n,
                               indices_are_sorted=True)


def _seg_max(scores, seg, n, mask):
    neg = jnp.finfo(jnp.float32).min
    m = _seg_max_raw(scores, seg, n, mask)
    return jnp.where(m > neg / 2, m, 0.0)


def gat_halo(
    hg: HaloGraph,
    x: jax.Array,
    w: jax.Array,
    a_src: jax.Array,
    a_dst: jax.Array,
    *,
    negative_slope: float = 0.2,
) -> jax.Array:
    """One multi-head GAT layer, edge-partitioned over ``hg.mesh``.

    ``x``: [n_node_pad, F_in] row-sharded P(axis); ``w``: [F_in, H·F]
    replicated; ``a_src``/``a_dst``: [H, F] replicated. Returns
    [n_node_pad, H·F] row-sharded (heads concatenated).
    """
    n_heads, feat = a_src.shape
    h = (x @ w).reshape(x.shape[0], n_heads, feat)   # GSPMD: row-sharded
    hf32 = h.astype(jnp.float32)
    f_src = jnp.einsum("nhf,hf->nh", hf32, a_src)
    f_dst = jnp.einsum("nhf,hf->nh", hf32, a_dst)
    return gat_halo_attend(hg, h, f_src, f_dst,
                           negative_slope=negative_slope)


def gat_halo_attend(
    hg: HaloGraph,
    h: jax.Array,
    f_src: jax.Array,
    f_dst: jax.Array,
    *,
    negative_slope: float = 0.2,
    attn_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention + aggregation given per-node projections.

    ``h``: [n_node_pad, H, F] per-head features, ``f_src``/``f_dst``:
    [n_node_pad, H] attention logits — all row-sharded P(axis) (the dense
    projections happen outside under GSPMD, so flax layers like GATConv
    can compute them normally and only the edge-wise part runs in
    shard_map). Returns [n_node_pad, H·F] row-sharded.

    ``attn_dropout`` implements the reference's dropout on the attention
    matrix (GAT/models/layers.py:33 F.dropout(attention)) without ever
    materialising α: each edge's softmax numerator is dropped with a
    shard-local PRNG (key folded with the mesh axis index) and survivors
    scale by 1/(1-p); the denominator keeps the full softmax mass —
    exactly dropout applied to α.
    """
    n_heads, feat = h.shape[1], h.shape[2]
    hf = n_heads * feat
    tiled = hg.int_tiles is not None
    n_extra = 3 if tiled else 0
    if tiled and not hg.unit_edge_weights:
        # The tiled softmax below multiplies exp(S) by the tile values —
        # correct only when those are 0/1 edge indicators. A partition
        # built with non-unit weights (e.g. GCN sym-normalization) would
        # silently compute a *weighted* softmax here while its COO and
        # boundary edges use weights as masks only (ADVICE r3). Rebuild
        # the partition with edge_weight=None for attention models.
        raise ValueError(
            "gat_halo_attend requires a partition with unit (0/1) tile "
            "weights; this HaloGraph was built with non-binary edge "
            "weights. Build a separate partition_graph_halo(..., "
            "edge_weight=None) for the attention layers.")
    if attn_dropout > 0.0 and dropout_rng is None:
        raise ValueError("attn_dropout > 0 requires dropout_rng")
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)   # unused when rate == 0

    @partial(
        jax.shard_map, mesh=hg.mesh,
        in_specs=(P(hg.axis),) * (11 + n_extra) + (P(hg.axis),) * 3
        + (P(),),
        out_specs=P(hg.axis),
    )
    def f(si, ri, wi, oi, ci, sb, rb, wb, ob, cb, send_idx_,
          *rest):
        from ..ops.aggregate import _aggregate_core

        if tiled:
            tiles, tcol, trow = (a[0] for a in rest[:3])
            h_in, fsrc_in, f_dst, rng_key = rest[3:]
        else:
            h_in, fsrc_in, f_dst, rng_key = rest
        si, ri, wi, oi, ci = si[0], ri[0], wi[0], oi[0], ci[0]
        sb, rb, wb, ob, cb = sb[0], rb[0], wb[0], ob[0], cb[0]
        send_idx_ = send_idx_[0]                       # [D, H_halo]
        nps = hg.nodes_per_shard
        h = h_in
        hfl = h.reshape(nps, hf)
        f_src = fsrc_in

        # ONE exchange: [h ‖ f_src] rows each peer needs.
        payload = jnp.concatenate(
            [hfl.astype(jnp.float32), f_src], axis=1)   # [nps, hf+H]
        sends = payload[send_idx_.reshape(-1)]          # [D*H_halo, hf+H]
        halo = jax.lax.all_to_all(
            sends, hg.axis, split_axis=0, concat_axis=0, tiled=True)
        halo_h = halo[:, :hf].astype(hfl.dtype)
        halo_fs = halo[:, hf:]

        # edge scores (padding edges carry weight 0 → masked out)
        mask_i, mask_b = wi > 0, wb > 0
        sc_i = jax.nn.leaky_relu(
            f_src[si] + f_dst[ri], negative_slope)       # [Ei, H]
        sc_b = jax.nn.leaky_relu(
            halo_fs[sb] + f_dst[rb], negative_slope)     # [Eb, H]

        # receiver-local softmax max across interior + boundary + tiled
        # edges (raw NEG for empty segments; default 0 applied after the
        # three-way combine so a tiles-only receiver still gets its true
        # max).
        neg = jnp.finfo(jnp.float32).min
        m = jnp.maximum(
            _seg_max_raw(sc_i, ri, nps, mask_i),
            _seg_max_raw(sc_b, rb, nps, mask_b))          # [nps, H]
        if tiled:
            # Tiled interior scores are the outer sum f_dst[row]+f_src[col]
            # over each dense tile (ops/bcsr_attention.py, shard-local):
            # the per-row max rides LeakyReLU's monotonicity —
            # max leaky(fd + fs) = leaky(fd + max fs) over tile neighbors.
            from ..core.bcsr import COL_BLOCK as CBK, ROW_BLOCK as RBK
            fs_blk = f_src.reshape(nps // CBK, CBK, n_heads)
            gath_fs = fs_blk[tcol]                        # [T, CB, H]
            tmask = (tiles != 0)[:, :, :, None]
            contrib = jnp.max(
                jnp.where(tmask, gath_fs[:, None, :, :], neg), axis=2)
            tnmax = jax.ops.segment_max(
                contrib, trow, num_segments=nps // RBK,
                indices_are_sorted=True).reshape(nps, n_heads)
            m_t = jax.nn.leaky_relu(f_dst + tnmax, negative_slope)
            m = jnp.maximum(m, jnp.where(tnmax > neg / 2, m_t, neg))
        m = jnp.where(m > neg / 2, m, 0.0)

        e_i = jnp.where(mask_i[:, None], jnp.exp(sc_i - m[ri]), 0.0)
        e_b = jnp.where(mask_b[:, None], jnp.exp(sc_b - m[rb]), 0.0)
        denom = (
            jax.ops.segment_sum(e_i, ri, num_segments=nps,
                                indices_are_sorted=True)
            + jax.ops.segment_sum(e_b, rb, num_segments=nps,
                                  indices_are_sorted=True))

        dropping = attn_dropout > 0.0
        if dropping:
            # α-dropout: numerators dropped per edge×head, denominator
            # keeps full mass; shard-local independent streams.
            local = jax.random.fold_in(rng_key,
                                       jax.lax.axis_index(hg.axis))
            ki, kb, kt = jax.random.split(local, 3)
            keep = 1.0 - attn_dropout
            e_i = e_i * jax.random.bernoulli(
                ki, keep, e_i.shape).astype(e_i.dtype) / keep
            e_b = e_b * jax.random.bernoulli(
                kb, keep, e_b.shape).astype(e_b.dtype) / keep

        # weighted aggregation, all heads in one kernel pass per edge set
        vi = (h[si] * e_i[:, :, None].astype(h.dtype)).reshape(-1, hf)
        num = _aggregate_core(ri, vi, oi, ci, nps, hg.int_max_chunks)
        vb = (halo_h.reshape(-1, n_heads, feat)[sb]
              * e_b[:, :, None].astype(h.dtype)).reshape(-1, hf)
        num = num + _aggregate_core(rb, vb, ob, cb, nps, hg.bnd_max_chunks)
        num = num.reshape(nps, n_heads, feat)

        if tiled:
            # numerator/denominator from the dense tiles (shard-local
            # mirror of ops/bcsr_attention._parts_chunk): P = W ⊙ exp(S−m)
            # on each tile, then one batched MXU matmul per tile stack.
            s_t = jax.nn.leaky_relu(
                f_dst.reshape(nps // RBK, RBK, n_heads)[trow][:, :, None, :]
                + gath_fs[:, None, :, :], negative_slope)
            s_t = s_t - m.reshape(nps // RBK, RBK, n_heads)[
                trow][:, :, None, :]
            # clamp (not exclude) s_t > 0: for real slots it happens only
            # at float-noise ties with the max, where exp(0)=1 is exact;
            # fake slots zero out through the tile weights.
            p_t = tiles[:, :, :, None] \
                * jnp.exp(jnp.where(s_t > 0, 0.0, s_t))
            den_t = jax.ops.segment_sum(
                p_t.sum(axis=2), trow, num_segments=nps // RBK,
                indices_are_sorted=True).reshape(nps, n_heads)
            denom = denom + den_t
            if dropping:
                keep_t = jax.random.bernoulli(kt, keep, p_t.shape)
                p_t = jnp.where(keep_t, p_t / keep, 0.0)
            h_blk = h.reshape(nps // CBK, CBK, n_heads, feat)
            num_t = jnp.einsum(
                "trch,tchf->trhf", p_t.astype(h.dtype), h_blk[tcol],
                precision=(jax.lax.Precision.HIGHEST
                           if h.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32)
            num = num + jax.ops.segment_sum(
                num_t, trow, num_segments=nps // RBK,
                indices_are_sorted=True).reshape(
                    nps, n_heads, feat).astype(num.dtype)

        denom = jnp.maximum(denom, 1e-16)
        out = num / denom[:, :, None].astype(num.dtype)
        return out.reshape(nps, hf)

    extra = ((hg.int_tiles, hg.int_tile_col, hg.int_tile_row)
             if tiled else ())
    return f(hg.int_senders, hg.int_receivers, hg.int_weight,
             hg.int_off, hg.int_cnt,
             hg.bnd_senders, hg.bnd_receivers, hg.bnd_weight,
             hg.bnd_off, hg.bnd_cnt,
             hg.send_idx, *extra, h, f_src, f_dst, dropout_rng)
