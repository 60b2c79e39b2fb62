"""Tiled graph attention: GAT softmax-aggregation on dense MXU tiles.

Extends the hybrid BCSR layout (core/bcsr.py) to *per-step dynamic* edge
scores.  The COO attention path gathers one x row per edge — with H heads
it materialises an [E, H, F] tensor (8.6 GB for 2M edges × 8 heads × 128
features f32), which is both the HBM-traffic wall measured for SpMM
(PERF_NOTES.md) and a memory cliff.  The tiled path never materialises
per-edge anything:

GAT's additive score (``GAT/models/layers.py:105-108``, decomposed as
``a·[Wh_s ‖ Wh_r] = f_src[s] + f_dst[r]``) is an OUTER SUM over a dense
tile — for tile t with receiver rows i and sender cols j,

    S[i, j] = LeakyReLU(f_dst[row_i] + f_src[col_j])

so the whole softmax-weighted aggregation becomes, per tile,

    P = W_t ⊙ exp(S − m_rows)        # W_t = dense tile (edge counts)
    num_block += P @ x_block         # MXU
    den_block += P · 1               # row sums

with the global per-(node, head) softmax max ``m`` computed exactly and
cheaply first: LeakyReLU is monotone, so

    max_{s ∈ N(r)} LeakyReLU(f_dst[r] + f_src[s])
        = LeakyReLU(f_dst[r] + max_{s ∈ N(r)} f_src[s])

i.e. one *scalar-per-node* neighbor-max pass (``bcsr_neighbor_max``, which
reads tiles but not x) replaces the per-edge segment-max.  The COO
remainder (stragglers outside well-filled tiles) contributes to the same
m / numerator / denominator through the existing edge-wise ops, so the
result is the exact softmax over ALL edges — equal to ``edge_softmax`` +
``spmm_weighted`` on the full COO graph (parity-tested).

Attention dropout follows the halo path's numerator-masking design
(parallel/halo_attention.py): α is never materialised, so the Bernoulli
mask multiplies the numerator term P/keep while the denominator keeps the
full P — algebraically identical to dropping the normalised α.  Tile-slot
masks derive from one uint32 lattice per tile (an explicit operand, so
forward and backward see identical masks by construction); per-head
streams are decorrelated by wrapping multiplication with distinct odd
constants (a bijection on uint32, so each stream stays uniform).

Backward: custom VJP.  ``m`` is a stop-gradient (softmax shift
invariance), tiles are constants.  On TPU both directions are Pallas
kernels: the forward is the one-kernel online-softmax attend
(ops/pallas/attend_online_kernel.py) and the gradient is two passes
over the forward and TRANSPOSE tile layouts
(ops/pallas/attend_bwd_kernel.py) with dropout masks aligned by
build-time maps; off-TPU, gradients run through the chunk-scanned XLA
formulation under jax.checkpoint, which bounds residual memory to one
tile chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bcsr import COL_BLOCK, ROW_BLOCK, BCSRGraph, HybridGraph

NEG = -1e30  # "-inf" stand-in that survives f32 arithmetic

def _head_mul(h: int) -> np.uint32:
    """Odd multiplier decorrelating head ``h``'s dropout stream from the
    shared uint32 lattice (computed inline — a fixed table capped the
    head count, ADVICE r3)."""
    return np.uint32((0x9E3779B1 * (2 * h + 1)) & 0xFFFFFFFF)


def _pad_rows(v: jax.Array, n_pad: int) -> jax.Array:
    if v.shape[0] == n_pad:
        return v
    return jnp.pad(v, ((0, n_pad - v.shape[0]),) + ((0, 0),) * (v.ndim - 1))


def _leaky(v, slope):
    return jnp.where(v > 0, v, slope * v)


def _keep_thresh(keep_prob: float) -> np.uint32:
    return np.uint32(min(int(round(keep_prob * 2.0 ** 32)), 2 ** 32 - 1))


def _head_keep(bits: jax.Array, h: int, keep_prob: float) -> jax.Array:
    """Per-head Bernoulli(keep_prob) from the shared uint32 lattice.

    Wrapping-multiply by a per-head odd constant is a bijection (keeps the
    stream uniform) but leaves heads linearly related; the xorshift-mul
    avalanche rounds break that relation (measured joint keep rate matches
    the product of marginals to <1e-3)."""
    v = bits * jnp.uint32(_head_mul(h))
    v = v ^ (v >> jnp.uint32(13))
    v = v * jnp.uint32(0x5BD1E995)
    v = v ^ (v >> jnp.uint32(15))
    return v < jnp.uint32(_keep_thresh(keep_prob))


def _chunked(arr_len: int, per_item_bytes: int, target: int = 1 << 26):
    """(chunk, n_chunks) bounding scan-step memory to ~``target`` bytes."""
    chunk = max(int(target // max(per_item_bytes, 1)), 1)
    chunk = min(chunk, max(arr_len, 1))
    n_chunks = -(-arr_len // chunk)
    return chunk, n_chunks


def _pad_tiles(bg: BCSRGraph, extra, chunk: int):
    """Pad tile arrays to a multiple of ``chunk`` (zero tiles are inert)."""
    t = bg.tiles.shape[0]
    t_pad = -(-t // chunk) * chunk
    tiles, col_ids, row_ids = bg.tiles, bg.col_ids, bg.row_ids
    if t_pad != t:
        tiles = jnp.pad(tiles, ((0, t_pad - t), (0, 0), (0, 0)))
        col_ids = jnp.pad(col_ids, (0, t_pad - t))
        row_ids = jnp.pad(row_ids, (0, t_pad - t))
        extra = [jnp.pad(e, ((0, t_pad - t),) + ((0, 0),) * (e.ndim - 1))
                 for e in extra]
    return tiles, col_ids, row_ids, extra


# ---------------------------------------------------------------------------
# neighbor-max over tiles (the softmax stabiliser; also SAGE max-pool)
# ---------------------------------------------------------------------------


def _nmax_kernel(off_ref, cnt_ref, col_ref, tile_ref, v_ref, out_ref,
                 *, cols):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, NEG)

    @pl.when(j < cnt_ref[i])
    def _():
        w = tile_ref[0]                                # [RB, CB]
        for c in range(cols):
            masked = jnp.where(w != 0, v_ref[c][None, :], NEG)
            out_ref[:, c:c + 1] = jnp.maximum(
                out_ref[:, c:c + 1], masked.max(axis=1, keepdims=True))


@functools.partial(jax.jit, static_argnames=("cols", "n_node_pad",
                                             "max_tiles"))
def _nmax_pallas(tiles, col_ids, tile_off, tile_cnt, vp, cols, n_node_pad,
                 max_tiles):
    """vp: [C, N_pad] col-major. Returns [N_pad, C] (NEG where empty)."""
    n_rb = n_node_pad // ROW_BLOCK
    t_pad = tiles.shape[0]

    def tile_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (t, 0, 0)

    def colv_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (0, col[t])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_rb, max_tiles),
        in_specs=[
            pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cols, COL_BLOCK), colv_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, cols),
                               lambda i, j, o, c, cl: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_nmax_kernel, cols=cols),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_node_pad, cols), jnp.float32),
    )(tile_off, tile_cnt, col_ids, tiles, vp)


def _nmax_xla(bg: BCSRGraph, v: jax.Array) -> jax.Array:
    n_rb = bg.n_node_pad // ROW_BLOCK
    c = v.shape[1]
    vb = _pad_rows(v.astype(jnp.float32), bg.n_node_pad)
    vb = vb.reshape(-1, COL_BLOCK, c)

    chunk, n_chunks = _chunked(bg.tiles.shape[0],
                               ROW_BLOCK * COL_BLOCK * c * 4, 1 << 27)
    tiles, col_ids, row_ids, _ = _pad_tiles(bg, [], chunk)

    def body(out, xs):
        w, cid, rid = xs
        gath = vb[cid]                                     # [c, CB, C]
        mask = (w != 0)[:, :, :, None]                     # [c, RB, CB, 1]
        contrib = jnp.max(jnp.where(mask, gath[:, None, :, :], NEG),
                          axis=2)                          # [c, RB, C]
        return out.at[rid].max(contrib), None

    out0 = jnp.full((n_rb, ROW_BLOCK, c), NEG, jnp.float32)
    out, _ = jax.lax.scan(
        body, out0,
        (tiles.reshape(n_chunks, chunk, ROW_BLOCK, COL_BLOCK),
         col_ids.reshape(n_chunks, chunk),
         row_ids.reshape(n_chunks, chunk)))
    return out.reshape(-1, c)[: bg.n_nodes]


@jax.custom_vjp
def bcsr_neighbor_max(bg: BCSRGraph, v: jax.Array) -> jax.Array:
    """max over tiled in-neighbors: out[r, c] = max_{s: W[r,s]≠0} v[s, c].

    Returns ``NEG`` where a node has no tiled in-edges (callers combine
    with the COO remainder before substituting an empty-segment default).
    Pallas on TPU (max accumulates in the resident out block — no XLA
    scatter); chunk-scanned XLA formulation elsewhere, where the
    [chunk, RB, CB, C] select-max fuses into the reduction so only the
    [chunk, CB, C] gather materialises.  Backward (SAGE max-pool routes
    the cotangent to the argmax neighbor) runs through the XLA
    formulation's VJP.
    """
    from . import _use_pallas

    if _use_pallas(v):
        vp = _pad_rows(v.astype(jnp.float32), bg.n_node_pad).T
        out = _nmax_pallas(bg.tiles, bg.col_ids, bg.tile_off, bg.tile_cnt,
                           vp, v.shape[1], bg.n_node_pad, bg.max_tiles)
        return out[: bg.n_nodes]
    return _nmax_xla(bg, v)


def _nmax_fwd(bg, v):
    return bcsr_neighbor_max(bg, v), (bg, v)


def _nmax_bwd(res, g):
    bg, v = res
    _, vjp = jax.vjp(lambda vv: _nmax_xla(bg, vv), v)
    (dv,) = vjp(g)
    dbg = jax.tree_util.tree_map(
        lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                   if jnp.issubdtype(a.dtype, jnp.integer)
                   else jnp.zeros_like(a)), bg)
    return (dbg, dv.astype(v.dtype))


bcsr_neighbor_max.defvjp(_nmax_fwd, _nmax_bwd)


@jax.custom_vjp
def _rem_segment_max(rem, gathered: jax.Array) -> jax.Array:
    """Per-receiver max of pre-gathered, pre-masked edge values — Pallas
    scatter-free kernel on TPU (XLA's scatter-max costs ~60 ns/edge),
    XLA segment_max elsewhere. Empty segments yield NEG-ish sentinels."""
    from . import _use_pallas

    if _use_pallas(gathered):
        from .pallas.segment_max_kernel import segment_max_pallas
        return segment_max_pallas(
            rem.chunk_off, rem.chunk_cnt, rem.receivers.reshape(-1, 1),
            gathered, rem.n_nodes, rem.max_chunks)
    return jax.ops.segment_max(gathered, rem.receivers,
                               num_segments=rem.n_nodes,
                               indices_are_sorted=True)


def _rem_segment_max_fwd(rem, gathered):
    return _rem_segment_max(rem, gathered), (rem, gathered)


def _rem_segment_max_bwd(res, g):
    rem, gathered = res
    # max-pool gradient (cotangent to the argmax edges) via the XLA
    # formulation's VJP — pallas_call itself is never differentiated
    _, vjp = jax.vjp(
        lambda gg: jax.ops.segment_max(gg, rem.receivers,
                                       num_segments=rem.n_nodes,
                                       indices_are_sorted=True), gathered)
    (dg,) = vjp(g)
    drem = jax.tree_util.tree_map(
        lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                   if jnp.issubdtype(a.dtype, jnp.integer)
                   else jnp.zeros_like(a)), rem)
    return (drem, dg)


_rem_segment_max.defvjp(_rem_segment_max_fwd, _rem_segment_max_bwd)


def hybrid_segment_max(hg: HybridGraph, x: jax.Array,
                       empty_value: float = 0.0) -> jax.Array:
    """Per-node max over ALL in-neighbors of a HybridGraph (tiles + COO
    remainder) — SAGE max-pool aggregation (``GraphSAGE_Pytorch/models/
    Aggregator.py:18-33``) on the tiled layout.  Nodes with no in-edges
    get ``empty_value`` (matching ops.segment.segment_max)."""
    tmax = bcsr_neighbor_max(hg.bcsr, x.astype(jnp.float32))
    rem = hg.rem
    gathered = jnp.where(rem.edge_mask[:, None],
                         x.astype(jnp.float32)[rem.senders], NEG)
    rmax = _rem_segment_max(rem, gathered)
    out = jnp.maximum(tmax, rmax)
    out = jnp.where(out > NEG / 2, out, empty_value)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# tiled softmax numerator / denominator — XLA chunk-scan formulation
# ---------------------------------------------------------------------------


def _parts_xla(bg, bits, x, f_src, f_dst, m, slope, keep_prob):
    """Row-block-gather formulation: each row block gathers its (≤
    max_tiles) tiles, so the scan STACKS per-chunk outputs instead of
    scatter-adding into a full-size accumulator (the scatter version
    re-read the [N, H, F] accumulator every chunk — measured 2× the
    Pallas kernel's whole runtime).  This is also the gradient path of
    the custom VJP: autodiff turns the gathers into index-adds over the
    compact fsb/x2/tile operands.  Padding waste is max_tiles/mean_tiles
    per row block — small on locality-ordered graphs (max_tiles=2 on the
    bench community graph)."""
    n, heads, feat = x.shape
    n_pad = bg.n_node_pad
    n_rb = n_pad // ROW_BLOCK
    mt = bg.max_tiles
    t_pad = bg.tiles.shape[0]
    x2 = _pad_rows(x, n_pad).reshape(-1, COL_BLOCK, heads, feat)
    fsb = _pad_rows(f_src.astype(jnp.float32), n_pad)
    fsb = fsb.reshape(-1, COL_BLOCK, heads)
    fdb = _pad_rows(f_dst.astype(jnp.float32), n_pad)
    fdb = fdb.reshape(-1, ROW_BLOCK, heads)
    mb = _pad_rows(m, n_pad).reshape(-1, ROW_BLOCK, heads)

    kk = jnp.arange(mt)
    idx = jnp.minimum(bg.tile_off[:, None] + kk[None, :],
                      t_pad - 1)                       # [n_rb, mt]
    valid = kk[None, :] < bg.tile_cnt[:, None]         # [n_rb, mt]

    per_row = mt * ROW_BLOCK * COL_BLOCK * heads * 4 * 2
    chunk, n_chunks = _chunked(n_rb, per_row)
    pad_rb = n_chunks * chunk - n_rb
    if pad_rb:
        idx = jnp.pad(idx, ((0, pad_rb), (0, 0)))
        valid = jnp.pad(valid, ((0, pad_rb), (0, 0)))

    rb_ids = jnp.arange(n_chunks * chunk) % n_rb       # clamped row ids
    dropping = keep_prob < 1.0

    @functools.partial(jax.checkpoint, static_argnums=())
    def body(_, xs):
        idx_c, valid_c, rb_c = xs                      # [c, mt], [c]
        w = bg.tiles[idx_c] * valid_c[:, :, None, None]  # [c, mt, RB, CB]
        cid = bg.col_ids[idx_c]                        # [c, mt]
        fs = fsb[cid]                                  # [c, mt, CB, H]
        fd = fdb[rb_c]                                 # [c, RB, H]
        mm = mb[rb_c]
        s = _leaky(fd[:, None, :, None, :] + fs[:, :, None, :, :], slope)
        s = s - mm[:, None, :, None, :]
        p = w[..., None] * jnp.exp(jnp.where(s > 0, 0.0, s))
        den_c = p.sum(axis=(1, 3))                     # [c, RB, H]
        if dropping:
            b = bits[idx_c]                            # [c, mt, RB, CB]
            keep = jnp.stack([_head_keep(b, h, keep_prob)
                              for h in range(heads)], axis=-1)
            p = jnp.where(keep, p / keep_prob, 0.0)
        xg = x2[cid]                                   # [c, mt, CB, H, F]
        num_c = jnp.einsum(
            "tmrch,tmchf->trhf", p.astype(x2.dtype), xg,
            precision=(jax.lax.Precision.HIGHEST
                       if x2.dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32)
        return None, (num_c, den_c)

    _, (num, den) = jax.lax.scan(
        body, None,
        (idx.reshape(n_chunks, chunk, mt),
         valid.reshape(n_chunks, chunk, mt),
         rb_ids.reshape(n_chunks, chunk)))
    num = num.reshape(-1, ROW_BLOCK, heads, feat)[:n_rb]
    den = den.reshape(-1, ROW_BLOCK, heads)[:n_rb]
    return (num.reshape(-1, heads, feat)[:n],
            den.reshape(-1, heads)[:n])


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------


def _attend_body(tile_ref, bits_ref, x_ref, fs_ref, fd_ref, m_ref,
                 num_ref, den_ref, *, heads, feat, slope, keep_prob):
    w = tile_ref[0]                                    # [RB, CB] f32
    for h in range(heads):
        fd = fd_ref[:, h:h + 1]                        # [RB, 1]
        fs = fs_ref[h][None, :]                        # [1, CB]
        s = _leaky(fd + fs, slope) - m_ref[:, h:h + 1]
        p = w * jnp.exp(jnp.where(s > 0, 0.0, s))      # [RB, CB]
        den_ref[:, h:h + 1] += p.sum(axis=1, keepdims=True)
        if keep_prob < 1.0:
            keep = _head_keep(bits_ref[0], h, keep_prob)
            p = jnp.where(keep, p * (1.0 / keep_prob), 0.0)
        acc = jax.lax.dot_general(
            p.astype(x_ref.dtype), x_ref[:, h * feat:(h + 1) * feat],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=(jax.lax.Precision.HIGHEST
                       if x_ref.dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32)
        num_ref[:, h * feat:(h + 1) * feat] += acc


def _attend_kernel(off_ref, cnt_ref, col_ref, *refs, heads, feat, slope,
                   keep_prob, has_bits):
    i = pl.program_id(0)
    j = pl.program_id(1)
    if has_bits:
        tile_ref, bits_ref, x_ref, fs_ref, fd_ref, m_ref, num_ref, \
            den_ref = refs
    else:
        tile_ref, x_ref, fs_ref, fd_ref, m_ref, num_ref, den_ref = refs
        bits_ref = None

    @pl.when(j == 0)
    def _():
        num_ref[:] = jnp.zeros_like(num_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(j < cnt_ref[i])
    def _():
        _attend_body(tile_ref, bits_ref, x_ref, fs_ref, fd_ref, m_ref,
                     num_ref, den_ref, heads=heads, feat=feat,
                     slope=slope, keep_prob=keep_prob)


def _attend_fused_kernel(off_ref, cnt_ref, col_ref, *refs, heads, feat,
                         slope, keep_prob, has_bits):
    """Fused variant: accumulators initialise from the COO remainder's
    num/den partials and the softmax division happens in-register at the
    last tile slot — the [N, H·F] numerator never round-trips HBM between
    the tile pass and the epilogue."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    if has_bits:
        tile_ref, bits_ref, ninit_ref, dinit_ref, x_ref, fs_ref, fd_ref, \
            m_ref, num_ref, den_ref = refs
    else:
        tile_ref, ninit_ref, dinit_ref, x_ref, fs_ref, fd_ref, m_ref, \
            num_ref, den_ref = refs
        bits_ref = None

    @pl.when(j == 0)
    def _():
        num_ref[:] = ninit_ref[:]
        den_ref[:] = dinit_ref[:]

    @pl.when(j < cnt_ref[i])
    def _():
        _attend_body(tile_ref, bits_ref, x_ref, fs_ref, fd_ref, m_ref,
                     num_ref, den_ref, heads=heads, feat=feat,
                     slope=slope, keep_prob=keep_prob)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        # den_ref keeps the RAW softmax mass (the VJP re-derives the
        # clamped divisor); only the division clamps.
        for h in range(heads):
            d = jnp.maximum(den_ref[:, h:h + 1], 1e-16)
            num_ref[:, h * feat:(h + 1) * feat] = (
                num_ref[:, h * feat:(h + 1) * feat] / d)


@functools.partial(jax.jit, static_argnames=("heads", "feat", "n_node_pad",
                                             "max_tiles", "slope",
                                             "keep_prob"))
def _parts_pallas(tiles, col_ids, tile_off, tile_cnt, bits, x2f, fsp, fdp,
                  mp, heads, feat, n_node_pad, max_tiles, slope,
                  keep_prob):
    """fsp: [H, N_pad] (head-major — sublane-row reads broadcast across
    rows); fdp/mp: [N_pad, H] (node-major — lane-column reads broadcast
    across cols); x2f: [N_pad, H·F].  Returns num [N_pad, H·F],
    den [N_pad, H] — node-major, so the caller reshapes for free."""
    n_rb = n_node_pad // ROW_BLOCK
    t_pad = tiles.shape[0]
    hf = heads * feat
    has_bits = keep_prob < 1.0

    def tile_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (t, 0, 0)

    def col2_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (col[t], 0)

    def colh_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (0, col[t])

    in_specs = [
        pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [tiles]
    if has_bits:
        in_specs.append(pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(bits)
    in_specs += [
        pl.BlockSpec((COL_BLOCK, hf), col2_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, COL_BLOCK), colh_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), lambda i, j, o, c, cl: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), lambda i, j, o, c, cl: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs += [x2f, fsp, fdp, mp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_rb, max_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, hf),
                         lambda i, j, o, c, cl: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, heads),
                         lambda i, j, o, c, cl: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _attend_kernel, heads=heads, feat=feat, slope=slope,
        keep_prob=keep_prob, has_bits=has_bits)
    num, den = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_node_pad, hf), jnp.float32),
            jax.ShapeDtypeStruct((n_node_pad, heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * ROW_BLOCK * COL_BLOCK * hf,
            bytes_accessed=(t_pad * ROW_BLOCK * COL_BLOCK
                            * (8 if has_bits else 4)
                            + t_pad * COL_BLOCK * hf * x2f.dtype.itemsize
                            + n_node_pad * hf * 4),
            transcendentals=t_pad * ROW_BLOCK * COL_BLOCK * heads,
        ),
    )(tile_off, tile_cnt, col_ids, *inputs)
    return num, den


@functools.partial(jax.jit, static_argnames=("heads", "feat", "n_node_pad",
                                             "max_tiles", "slope",
                                             "keep_prob"))
def _fused_pallas(tiles, col_ids, tile_off, tile_cnt, bits, ninit, dinit,
                  x2f, fsp, fdp, mp, heads, feat, n_node_pad, max_tiles,
                  slope, keep_prob):
    """Layouts as _parts_pallas, plus ninit [N_pad, H·F] / dinit
    [N_pad, H] f32 remainder partials. Returns (out, den_raw)."""
    n_rb = n_node_pad // ROW_BLOCK
    t_pad = tiles.shape[0]
    hf = heads * feat
    has_bits = keep_prob < 1.0

    def tile_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (t, 0, 0)

    def col2_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (col[t], 0)

    def colh_map(i, j, off, cnt, col):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        t = jnp.minimum(jnp.minimum(off[i] + j, last), t_pad - 1)
        return (0, col[t])

    def row_map(i, j, o, c, cl):
        return (i, 0)

    in_specs = [
        pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [tiles]
    if has_bits:
        in_specs.append(pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(bits)
    in_specs += [
        pl.BlockSpec((ROW_BLOCK, hf), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((COL_BLOCK, hf), col2_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, COL_BLOCK), colh_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), row_map,
                     memory_space=pltpu.VMEM),
    ]
    inputs += [ninit, dinit, x2f, fsp, fdp, mp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_rb, max_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, hf), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, heads), row_map,
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _attend_fused_kernel, heads=heads, feat=feat, slope=slope,
        keep_prob=keep_prob, has_bits=has_bits)
    out, den = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_node_pad, hf), jnp.float32),
            jax.ShapeDtypeStruct((n_node_pad, heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * ROW_BLOCK * COL_BLOCK * hf,
            bytes_accessed=(t_pad * ROW_BLOCK * COL_BLOCK
                            * (8 if has_bits else 4)
                            + t_pad * COL_BLOCK * hf * x2f.dtype.itemsize
                            + n_node_pad * hf * 8),
            transcendentals=t_pad * ROW_BLOCK * COL_BLOCK * heads,
        ),
    )(tile_off, tile_cnt, col_ids, *inputs)
    return out, den


def _fused_impl(bg: BCSRGraph, bits, x, f_src, f_dst, m, num_init,
                den_init, slope, keep_prob):
    """out = (tiles_num + num_init) / max(tiles_den + den_init, eps);
    also returns the raw total den. Pallas on TPU, XLA elsewhere."""
    from . import _use_pallas

    n, heads, feat = x.shape
    n_pad = bg.n_node_pad
    if _use_pallas(x):
        x2f = _pad_rows(x.reshape(n, heads * feat), n_pad)
        fsp = _pad_rows(f_src.astype(jnp.float32), n_pad).T
        fdp = _pad_rows(f_dst.astype(jnp.float32), n_pad)
        mp = _pad_rows(m, n_pad)
        ninit = _pad_rows(num_init.reshape(n, heads * feat)
                          .astype(jnp.float32), n_pad)
        dinit = _pad_rows(den_init.astype(jnp.float32), n_pad)
        out, den = _fused_pallas(
            bg.tiles, bg.col_ids, bg.tile_off, bg.tile_cnt, bits, ninit,
            dinit, x2f, fsp, fdp, mp, heads, feat, n_pad, bg.max_tiles,
            float(slope), float(keep_prob))
        return out[:n].reshape(n, heads, feat), den[:n]
    num, den = _parts_xla(bg, bits, x, f_src, f_dst, m, float(slope),
                          float(keep_prob))
    den_tot = den + den_init.astype(jnp.float32)
    out = (num + num_init.astype(jnp.float32)) \
        / jnp.maximum(den_tot, 1e-16)[:, :, None]
    return out, den_tot


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _attend_fused(bg, bits, x, f_src, f_dst, m, num_init, den_init,
                  slope, keep_prob):
    return _fused_impl(bg, bits, x, f_src, f_dst, m, num_init, den_init,
                       slope, keep_prob)


def _attend_fused_fwd(bg, bits, x, f_src, f_dst, m, num_init, den_init,
                      slope, keep_prob):
    out, den_tot = _fused_impl(bg, bits, x, f_src, f_dst, m, num_init,
                               den_init, slope, keep_prob)
    return (out, den_tot), (bg, bits, x, f_src, f_dst, m, out, den_tot)


def _attend_fused_bwd(slope, keep_prob, res, g):
    bg, bits, x, f_src, f_dst, m, out, den_tot = res
    g_out, g_den = g
    den_c = jnp.maximum(den_tot, 1e-16)
    g_out32 = g_out.astype(jnp.float32)
    # out = num_tot / clamp(den_tot):  d num = g/den,  d den = -g·out/den
    gn = g_out32 / den_c[:, :, None]
    gd = g_den.astype(jnp.float32) - jnp.sum(
        g_out32 * out.astype(jnp.float32), axis=-1) / den_c

    _, vjp = jax.vjp(
        lambda xx, fs, fd: _parts_xla(bg, bits, xx, fs, fd, m, slope,
                                      keep_prob),
        x, f_src, f_dst)
    dx, dfs, dfd = vjp((gn, gd))

    def zeros(tree):
        return jax.tree_util.tree_map(
            lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                       if jnp.issubdtype(a.dtype, jnp.integer)
                       else jnp.zeros_like(a)), tree)

    return (zeros(bg), zeros(bits), dx, dfs, dfd, jnp.zeros_like(m),
            gn, gd)


_attend_fused.defvjp(_attend_fused_fwd, _attend_fused_bwd)


def _tile_parts_impl(bg: BCSRGraph, bits, x, f_src, f_dst, m, slope,
                     keep_prob):
    """Dispatch Pallas/XLA; returns (num [N,H,F] f32, den [N,H] f32)."""
    from . import _use_pallas

    n, heads, feat = x.shape
    n_pad = bg.n_node_pad
    if _use_pallas(x):
        x2f = _pad_rows(x.reshape(n, heads * feat), n_pad)
        fsp = _pad_rows(f_src.astype(jnp.float32), n_pad).T
        fdp = _pad_rows(f_dst.astype(jnp.float32), n_pad)
        mp = _pad_rows(m, n_pad)
        num, den = _parts_pallas(
            bg.tiles, bg.col_ids, bg.tile_off, bg.tile_cnt, bits, x2f,
            fsp, fdp, mp, heads, feat, n_pad, bg.max_tiles, float(slope),
            float(keep_prob))
        return (num[:n].reshape(n, heads, feat), den[:n])
    return _parts_xla(bg, bits, x, f_src, f_dst, m, float(slope),
                      float(keep_prob))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _tile_parts(bg, bits, x, f_src, f_dst, m, slope, keep_prob):
    return _tile_parts_impl(bg, bits, x, f_src, f_dst, m, slope, keep_prob)


def _tile_parts_fwd(bg, bits, x, f_src, f_dst, m, slope, keep_prob):
    out = _tile_parts_impl(bg, bits, x, f_src, f_dst, m, slope, keep_prob)
    return out, (bg, bits, x, f_src, f_dst, m)


def _tile_parts_bwd(slope, keep_prob, res, g):
    bg, bits, x, f_src, f_dst, m = res

    # The XLA chunk-scan path (checkpointed) defines the gradient; `bits`
    # is the same operand the forward consumed, so dropout masks match.
    _, vjp = jax.vjp(
        lambda xx, fs, fd: _parts_xla(bg, bits, xx, fs, fd, m, slope,
                                      keep_prob),
        x, f_src, f_dst)
    dx, dfs, dfd = vjp(g)

    def zeros(tree):
        return jax.tree_util.tree_map(
            lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                       if jnp.issubdtype(a.dtype, jnp.integer)
                       else jnp.zeros_like(a)), tree)

    return (zeros(bg), zeros(bits), dx, dfs, dfd, jnp.zeros_like(m))


_tile_parts.defvjp(_tile_parts_fwd, _tile_parts_bwd)


# ---------------------------------------------------------------------------
# fused COO-remainder softmax partials
# ---------------------------------------------------------------------------


def _rem_parts_xla(rem, x, f_src, f_dst, m, keep_mul, slope):
    """Reference composition of the remainder partials (CPU forward AND
    the gradient path of _rem_parts): sddmm -> leaky -> exp(shift m) ->
    den segment-sum; numerator dropout-masks p then weighted-aggregates.
    ``keep_mul`` is the [E_pad, H] keep/keep_prob multiplier (or None)."""
    from .aggregate import aggregate_edges
    from .spmm import sddmm_additive, spmm_weighted

    fs32 = f_src.astype(jnp.float32)
    fd32 = f_dst.astype(jnp.float32)
    s_rem = sddmm_additive(rem.senders, rem.receivers, fs32, fd32)
    s_rem = _leaky(s_rem, slope) - m[rem.receivers]
    s_rem = jnp.where(s_rem > 0, 0.0, s_rem)
    w_rem = rem.edge_weight[:, None] * rem.edge_mask[:, None]
    p = w_rem * jnp.exp(s_rem)                                 # [E, H]
    den = aggregate_edges(rem, p)                              # [N, H]
    p_num = p * keep_mul if keep_mul is not None else p
    num = spmm_weighted(rem, p_num.astype(x.dtype),
                        x).astype(jnp.float32)                 # [N, H, F]
    return num, den


def _rem_parts_impl(rem, x, f_src, f_dst, m, keep_mul, slope):
    from . import _use_pallas

    n, heads, feat = x.shape
    if _use_pallas(x):
        from .pallas.rem_attend_kernel import rem_attend_pallas

        fs32 = f_src.astype(jnp.float32)
        fsg = fs32[rem.senders]                                # [E, H]
        w_col = (rem.edge_weight
                 * rem.edge_mask).astype(jnp.float32).reshape(-1, 1)
        xg = x.reshape(n, heads * feat)[rem.senders]           # [E, H·F]
        n_pad = (-(-n // ROW_BLOCK)) * ROW_BLOCK
        fd_pad = _pad_rows(f_dst.astype(jnp.float32), n_pad)
        m_pad = _pad_rows(m, n_pad)
        num, den = rem_attend_pallas(
            rem.chunk_off, rem.chunk_cnt,
            rem.receivers.reshape(-1, 1), fsg, w_col, xg, keep_mul,
            fd_pad, m_pad, heads, feat, n, rem.max_chunks,
            float(slope), keep_mul is not None)
        return num[:n].reshape(n, heads, feat), den[:n]
    return _rem_parts_xla(rem, x, f_src, f_dst, m, keep_mul, slope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _rem_parts(rem, x, f_src, f_dst, m, keep_mul, slope):
    """Remainder softmax partials (num [N,H,F] f32, den [N,H] f32) —
    fused Pallas pass on TPU (ops/pallas/rem_attend_kernel.py), the XLA
    composition elsewhere; backward through the XLA formulation."""
    return _rem_parts_impl(rem, x, f_src, f_dst, m, keep_mul, slope)


def _rem_parts_fwd(rem, x, f_src, f_dst, m, keep_mul, slope):
    out = _rem_parts_impl(rem, x, f_src, f_dst, m, keep_mul, slope)
    return out, (rem, x, f_src, f_dst, m, keep_mul)


def _rem_parts_bwd(slope, res, g):
    rem, x, f_src, f_dst, m, keep_mul = res
    _, vjp = jax.vjp(
        lambda xx, fs, fd: _rem_parts_xla(rem, xx, fs, fd, m, keep_mul,
                                          slope),
        x, f_src, f_dst)
    dx, dfs, dfd = vjp(g)

    def zeros(tree):
        return jax.tree_util.tree_map(
            lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                       if jnp.issubdtype(a.dtype, jnp.integer)
                       else jnp.zeros_like(a)), tree)

    return (zeros(rem), dx, dfs, dfd, jnp.zeros_like(m),
            zeros(keep_mul))


_rem_parts.defvjp(_rem_parts_fwd, _rem_parts_bwd)


# ---------------------------------------------------------------------------
# one-kernel online-softmax attend (TPU forward path)
# ---------------------------------------------------------------------------


def _attend_online_impl(hg, bits, keep_mul, x, f_src, f_dst, slope,
                        keep_prob):
    """Forward via the single online-softmax kernel
    (ops/pallas/attend_online_kernel.py): no stabiliser pre-passes, no
    partial round-trips. Returns (out [N,H,F] f32, m [N,H] f32 — the
    exact softmax shift, zeroed where a node has no in-edges)."""
    from .pallas.attend_online_kernel import attend_online_pallas

    bg, rem = hg.bcsr, hg.rem
    n, heads, feat = x.shape
    n_pad = bg.n_node_pad
    fs32 = f_src.astype(jnp.float32)
    fd32 = f_dst.astype(jnp.float32)
    x2f = _pad_rows(x.reshape(n, heads * feat), n_pad)
    fsp = _pad_rows(fs32, n_pad).T
    fdp = _pad_rows(fd32, n_pad)
    fsg = fs32[rem.senders]                                   # [E, H]
    w_col = (rem.edge_weight
             * rem.edge_mask).astype(jnp.float32).reshape(-1, 1)
    xg = x.reshape(n, heads * feat)[rem.senders]              # [E, H·F]
    from ..core.bcsr import ATTEND_CHUNK
    out, den, m = attend_online_pallas(
        bg.tile_off, bg.tile_cnt, bg.col_ids, hg.rem_fine_off,
        hg.rem_fine_cnt, bg.tiles, bits, x2f, fsp,
        rem.receivers.reshape(-1, 1), fsg, w_col, xg, keep_mul, fdp,
        heads, feat, n, bg.max_tiles, hg.rem_fine_max, float(slope),
        float(keep_prob), keep_prob < 1.0, keep_mul is not None,
        echunk=ATTEND_CHUNK)
    # zero the shift on empty rows so the backward formulation (which
    # clamps exp args at 0 anyway) sees finite values everywhere
    m = jnp.where(den[:n] > 0, m[:n], 0.0)
    return out[:n].reshape(n, heads, feat), m, den[:n]


def _attend_bwd_kernels(hg, bits, keep_mul, x, f_src, f_dst, m, out,
                        den, g, slope, keep_prob, interpret=False):
    """Kernelised gradient of the online attend: pass A (forward
    tiles/remainder, receiver rows) -> dfd; pass B (transpose
    tiles/remainder, sender rows) -> dx + dfs
    (ops/pallas/attend_bwd_kernel.py). Dropout masks are the forward's
    own operands, viewed in the transpose layout via the build-time
    alignment maps (HybridGraph.bits_tmap / rem_t_eperm)."""
    from ..core.bcsr import ATTEND_CHUNK
    from .pallas.attend_bwd_kernel import (attend_bwd_a_pallas,
                                           attend_bwd_b_pallas)

    bg, bg_t, rem, rem_t = hg.bcsr, hg.bcsr_t, hg.rem, hg.rem_t
    n, heads, feat = x.shape
    hf = heads * feat
    n_pad = bg.n_node_pad
    xdt = x.dtype

    den_c = jnp.maximum(den, 1e-16)
    g32 = g.astype(jnp.float32)
    out32 = out.astype(jnp.float32)
    live = (den > 0)[:, :, None]
    gn = jnp.where(live, g32 / den_c[:, :, None], 0.0)     # [n, H, F]
    dden = -jnp.where(den > 0,
                      jnp.sum(g32 * out32, axis=-1) / den_c, 0.0)
    fs32 = f_src.astype(jnp.float32)
    fd32 = f_dst.astype(jnp.float32)

    gn_flat = gn.reshape(n, hf).astype(xdt)
    gn2f = _pad_rows(gn_flat, n_pad)
    x_flat = x.reshape(n, hf)
    x2f = _pad_rows(x_flat, n_pad)
    fsp = _pad_rows(fs32, n_pad).T
    fdm3_n = jnp.concatenate([fd32, m, dden], axis=1)      # [n, 3H]
    fdm3 = _pad_rows(fdm3_n, n_pad)

    dropping = keep_prob < 1.0
    if dropping:
        # pass B views of the forward masks: transposed lattice per
        # matched tile; remainder multiplier permuted to rem_t order
        bits_t = jnp.transpose(bits[hg.bits_tmap], (0, 2, 1))
        keepm_t = keep_mul[hg.rem_t_eperm]
    else:
        bits_t = keepm_t = None

    # pass A: receiver-owned dfd over forward tiles + remainder
    sxg = x_flat[rem.senders]
    fsg = fs32[rem.senders]
    w_col = (rem.edge_weight
             * rem.edge_mask).astype(jnp.float32).reshape(-1, 1)
    dfd = attend_bwd_a_pallas(
        bg.tile_off, bg.tile_cnt, bg.col_ids, hg.rem_fine_off,
        hg.rem_fine_cnt, bg.tiles, bits, x2f, fsp, gn2f, fdm3,
        rem.receivers.reshape(-1, 1), sxg, fsg, w_col, keep_mul, heads,
        feat, n, bg.max_tiles, hg.rem_fine_max, float(slope),
        ATTEND_CHUNK, keep_prob=float(keep_prob), has_keep=dropping,
        interpret=interpret)

    # pass B: sender-owned dx + dfs over transpose tiles + remainder
    fsr = _pad_rows(fs32, n_pad)
    gng = gn_flat[rem_t.senders]                 # receiver-side per edge
    rdm3 = fdm3_n[rem_t.senders]
    wt_col = (rem_t.edge_weight
              * rem_t.edge_mask).astype(jnp.float32).reshape(-1, 1)
    dx, dfs = attend_bwd_b_pallas(
        bg_t.tile_off, bg_t.tile_cnt, bg_t.col_ids, hg.rem_t_fine_off,
        hg.rem_t_fine_cnt, bg_t.tiles, bits_t, gn2f, fdm3.T, x2f, fsr,
        rem_t.receivers.reshape(-1, 1), gng, rdm3, wt_col, keepm_t,
        heads, feat, n, bg_t.max_tiles, hg.rem_t_fine_max, float(slope),
        ATTEND_CHUNK, keep_prob=float(keep_prob), has_keep=dropping,
        interpret=interpret)
    return (dx[:n].reshape(n, heads, feat), dfs[:n], dfd[:n])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _attend_online(hg, bits, keep_mul, x, f_src, f_dst, slope, keep_prob):
    out, _, _ = _attend_online_impl(hg, bits, keep_mul, x, f_src, f_dst,
                                    slope, keep_prob)
    return out


def _attend_online_fwd(hg, bits, keep_mul, x, f_src, f_dst, slope,
                       keep_prob):
    out, m, den = _attend_online_impl(hg, bits, keep_mul, x, f_src,
                                      f_dst, slope, keep_prob)
    return out, (hg, bits, keep_mul, x, f_src, f_dst, m, out, den)


def _attend_online_bwd(slope, keep_prob, res, g):
    hg, bits, keep_mul, x, f_src, f_dst, m, out, den = res

    def zeros(tree):
        return jax.tree_util.tree_map(
            lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                       if jnp.issubdtype(a.dtype, jnp.integer)
                       else jnp.zeros_like(a)), tree)

    # kernelised backward (pass A dfd, pass B dx+dfs —
    # ops/pallas/attend_bwd_kernel.py); dropout masks are the residual
    # operands, viewed in the transpose layout via the alignment maps
    dx, dfs, dfd = _attend_bwd_kernels(hg, bits, keep_mul, x, f_src,
                                       f_dst, m, out, den, g, slope,
                                       keep_prob)
    return (zeros(hg), zeros(bits), zeros(keep_mul), dx, dfs, dfd)


_attend_online.defvjp(_attend_online_fwd, _attend_online_bwd)


# ---------------------------------------------------------------------------
# public entry: full hybrid GAT attention
# ---------------------------------------------------------------------------


def gat_tiled_attend(hg: HybridGraph, x: jax.Array, f_src: jax.Array,
                     f_dst: jax.Array, *, negative_slope: float = 0.2,
                     attn_dropout: float = 0.0, dropout_rng=None
                     ) -> jax.Array:
    """Softmax attention aggregation over a HybridGraph.

    ``x``: [N, H, F] projected features; ``f_src``/``f_dst``: [N, H]
    per-node attention logits.  Returns [N, H, F] — exactly
    ``spmm_weighted(g, edge_softmax(g, scores), x)`` on the equivalent
    full COO graph (``GAT/models/layers.py:94-131`` semantics; duplicate
    edges contribute once per multiplicity via the tile counts and the
    remainder's edge weights).  Build the hybrid with unit edge weights
    (``build_hybrid(s, r, n)``) — GAT's adjacency is binary.
    """
    from . import _use_pallas

    rem = hg.rem
    bg = hg.bcsr
    n, heads, feat = x.shape
    fs32 = f_src.astype(jnp.float32)
    fd32 = f_dst.astype(jnp.float32)

    dropping = attn_dropout > 0.0 and dropout_rng is not None
    keep_prob = 1.0 - attn_dropout if dropping else 1.0

    if dropping:
        bits = jax.random.bits(
            jax.random.fold_in(dropout_rng, 0),
            (bg.tiles.shape[0], ROW_BLOCK, COL_BLOCK), jnp.uint32)
        keep = jax.random.bernoulli(
            jax.random.fold_in(dropout_rng, 1), keep_prob,
            (rem.senders.shape[0], heads))
        keep_mul = keep.astype(jnp.float32) / keep_prob
    else:
        # inert placeholder (keep_prob == 1 paths never read it)
        bits = jnp.zeros((bg.tiles.shape[0], 1, 1), jnp.uint32)
        keep_mul = None

    if _use_pallas(x):
        # TPU: ONE kernel — remainder chunks + tiles share a grid with
        # flash-style online softmax (exact per-slot score bounds), the
        # division happens in-register, and no stabiliser pre-pass or
        # partial round-trip touches HBM (round-5 redesign; the two-pass
        # pipeline below spent ~14.5 ms of its 28.5 ms computing m).
        out = _attend_online(hg, bits, keep_mul, x, fs32, fd32,
                             float(negative_slope), float(keep_prob))
        return out.astype(x.dtype)

    # --- XLA/CPU path: exact softmax max via the monotone-LeakyReLU
    # reduction, then remainder partials seeding the tile formulation ---
    nmax_t = bcsr_neighbor_max(bg, fs32)                       # [N, H]
    gathered = jnp.where(rem.edge_mask[:, None], fs32[rem.senders], NEG)
    nmax_r = _rem_segment_max(rem, jax.lax.stop_gradient(gathered))
    nmax = jnp.maximum(nmax_t, nmax_r)
    m = _leaky(fd32 + nmax, negative_slope)
    m = jnp.where(nmax > NEG / 2, m, 0.0)
    m = jax.lax.stop_gradient(m)

    num_r, den_r = _rem_parts(rem, x, fs32, fd32, m, keep_mul,
                              float(negative_slope))

    out, _ = _attend_fused(bg, bits, x, f_src, f_dst, m, num_r, den_r,
                           float(negative_slope), float(keep_prob))
    return out.astype(x.dtype)
