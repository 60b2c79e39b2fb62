"""One-kernel hybrid GAT attention with online (flash-style) softmax.

The round-4 attend pipeline was three device passes — (1) exact softmax
max via a tile neighbor-max kernel + a remainder segment-max kernel
(~14.5 ms at the 2M-edge bench shape), (2) remainder partials, (3) the
fused tile kernel seeded with them (round-tripping a [N, H·F] f32
partial through HBM). This kernel is the whole thing: remainder chunks
and dense tiles share one grid, per row block the kernel keeps a
resident f32 numerator scratch, denominator, and running score max m,
and every slot applies the online-softmax update — compute the slot's
EXACT per-row score bound b, lift m to max(m, b), rescale num/den by
exp(m_old − m_new), accumulate exp(score − m_new) terms, divide at the
last slot. Exactness matches the two-pass design (the bounds are true
per-slot maxima, so the final m is the global max and the softmax is
the exact stable softmax), the extreme-logit guarantee included, and
the final m comes out for free (the backward feeds it to the XLA
formulation; softmax shift invariance makes that gradient exact).

Two grid layouts, chosen by slot count:

  * **unrolled** (the common case, mc + mt small): grid (row_blocks,)
    — every slot has its OWN input specs and the kernel processes the
    row block's whole span in one grid step. Motivation: the measured
    per-grid-step fixed cost is ~4 µs (index maps, DMA descriptors,
    branch scalars — a zeroed-span "no-op" run of the 2-D grid costs
    16.4 of the 28.7 ms total at the bench shape), so collapsing
    1024×4 steps to 1024 deletes most of it.
  * **2-D fallback** (grid (row_blocks, mc + mt)) for graphs whose hub
    row blocks would not fit unrolled operands in VMEM.

Remainder slots fetch per-edge receiver logits with a one-hot MXU
matmul against the row block (mt @ fd) — receiver-sorted order
guarantees every in-span edge's receiver lies in the block, and the
one-hot transpose masks boundary-chunk strays out of both
contractions. Tile slots use the outer-sum score identity of
ops/bcsr_attention.py. Dropout matches ops/bcsr_attention.py exactly:
tiles mask the numerator from the shared uint32 lattice, remainder
edges carry a precomputed keep/keep_prob multiplier.

Replaces GAT/models/layers.py:94-131 (edge softmax + scatter) on the
hybrid layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.bcsr import COL_BLOCK, ROW_BLOCK
from .spmm_kernel import EDGE_CHUNK

NEG = -1e30
_HI = jax.lax.Precision.HIGHEST

#: VMEM gate for the unrolled layout (operand bytes grow with mc + mt).
UNROLL_MAX_CHUNKS = 8
UNROLL_MAX_TILES = 6


def _leaky(v, slope):
    return jnp.where(v > 0, v, slope * v)


def _head_keep(bits, h, keep_prob):
    """Per-head Bernoulli from the shared uint32 lattice — identical to
    ops/bcsr_attention._head_keep (kept in sync; duplicated to avoid an
    ops-module import from kernel code)."""
    import numpy as np

    mul = np.uint32((0x9E3779B1 * (2 * h + 1)) & 0xFFFFFFFF)
    thresh = np.uint32(min(int(round(keep_prob * 2.0 ** 32)), 2 ** 32 - 1))
    v = bits * jnp.uint32(mul)
    v = v ^ (v >> jnp.uint32(13))
    v = v * jnp.uint32(0x5BD1E995)
    v = v ^ (v >> jnp.uint32(15))
    return v < jnp.uint32(thresh)


def _rescale(num_ref, den_ref, m_ref, b, heads, feat):
    """Online-softmax lift: m <- max(m, b); scale both accumulators."""
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, b)
    scale = jnp.exp(m_old - m_new)        # <= 1; exp(NEG - x) == 0 exact
    den_ref[:] = den_ref[:] * scale
    for h in range(heads):
        num_ref[:, h * feat:(h + 1) * feat] *= scale[:, h:h + 1]
    m_ref[:] = m_new
    return m_new


def _rem_slot(i, recv_ref, fsg_ref, w_ref, xg_ref, keep_ref, fdp_ref,
              num_ref, den_ref, m_ref, *, heads, feat, slope, has_keep,
              echunk):
    """Process one receiver-sorted COO remainder chunk."""
    cols = i * ROW_BLOCK + jax.lax.broadcasted_iota(
        jnp.int32, (echunk, ROW_BLOCK), 1)
    mt_b = recv_ref[:] == cols                       # [E, RB]
    mt_f = mt_b.astype(jnp.float32)
    fd_e = jax.lax.dot_general(
        mt_f, fdp_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)
    s = _leaky(fsg_ref[:] + fd_e, slope)             # [E, H]
    live = mt_b & (w_ref[:] > 0)                     # [E, RB]
    # exact per-row score bound over this chunk's live edges. The
    # sublane (axis-0) reduction lands row-oriented [1, RB]; an identity
    # matmul transposes [H, RB] -> [RB, H] on the MXU (an in-kernel
    # relayout is not a Mosaic-friendly op, a dot is).
    b_rows = []
    for h in range(heads):
        masked = jnp.where(live, s[:, h:h + 1], NEG)
        b_rows.append(masked.max(axis=0, keepdims=True))  # [1, RB]
    b_hrb = jnp.concatenate(b_rows, axis=0)          # [H, RB]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, ROW_BLOCK), 0)
           == jax.lax.broadcasted_iota(jnp.int32,
                                       (ROW_BLOCK, ROW_BLOCK), 1)
           ).astype(jnp.float32)
    b = jax.lax.dot_general(
        eye, b_hrb, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)
    m_new = _rescale(num_ref, den_ref, m_ref, b, heads, feat)
    m_e = jax.lax.dot_general(
        mt_f, m_new, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)
    # clamp at 0: exact in-block (m_new >= any live score here); bounds
    # strays/padding whose contributions the one-hot masks out anyway
    p = w_ref[:] * jnp.exp(jnp.minimum(s - m_e, 0.0))
    den_ref[:] += jax.lax.dot_general(
        mt_f, p, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)
    if has_keep:
        p = p * keep_ref[:]
    xdt = xg_ref.dtype
    px = p.astype(xdt)
    mt_x = mt_b.astype(xdt)
    for h in range(heads):
        vals = px[:, h:h + 1] * xg_ref[:, h * feat:(h + 1) * feat]
        num_ref[:, h * feat:(h + 1) * feat] += jax.lax.dot_general(
            mt_x, vals, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=(_HI if xdt == jnp.float32
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32)


def _tile_slot(tile_ref, bits_ref, xt_ref, fsp_ref, fdp_ref, num_ref,
               den_ref, m_ref, *, heads, feat, slope, keep_prob,
               has_bits):
    """Process one dense tile of the row block's span."""
    # f32 view of the tile: Mosaic rejects the i1-mask relayout that a
    # bf16-sourced compare produces, and the elementwise softmax math
    # is f32 anyway (the MXU dot re-casts to x's dtype below)
    w = tile_ref[0].astype(jnp.float32)              # [RB, CB]
    nz = w != 0
    b_cols = []
    for h in range(heads):
        fs_row = fsp_ref[h][None, :]                 # [1, CB]
        nm = jnp.where(nz, fs_row, NEG).max(axis=1, keepdims=True)
        # LeakyReLU is monotone: max leaky(fd+fs) = leaky(fd + max fs).
        # Empty rows get leaky(fd+NEG) ~ NEG-ish — harmless (their
        # rescale multiplies zeros; real slots override the max).
        b_cols.append(_leaky(fdp_ref[:, h:h + 1] + nm, slope))
    m_new = _rescale(num_ref, den_ref, m_ref,
                     jnp.concatenate(b_cols, axis=1), heads, feat)
    xdt = xt_ref.dtype
    for h in range(heads):
        fd_col = fdp_ref[:, h:h + 1]                 # [RB, 1]
        fs_row = fsp_ref[h][None, :]                 # [1, CB]
        s = _leaky(fd_col + fs_row, slope) - m_new[:, h:h + 1]
        p = w * jnp.exp(jnp.minimum(s, 0.0))         # [RB, CB]
        den_ref[:, h:h + 1] += p.sum(axis=1, keepdims=True)
        if has_bits:
            keep = _head_keep(bits_ref[0], h, keep_prob)
            p = jnp.where(keep, p * (1.0 / keep_prob), 0.0)
        num_ref[:, h * feat:(h + 1) * feat] += jax.lax.dot_general(
            p.astype(xdt), xt_ref[:, h * feat:(h + 1) * feat],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=(_HI if xdt == jnp.float32
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32)


def _epilogue(out_ref, num_ref, den_ref, heads, feat):
    for h in range(heads):
        d = jnp.maximum(den_ref[:, h:h + 1], 1e-16)
        out_ref[:, h * feat:(h + 1) * feat] = (
            num_ref[:, h * feat:(h + 1) * feat] / d).astype(out_ref.dtype)


def _init(num_ref, den_ref, m_ref):
    num_ref[:] = jnp.zeros_like(num_ref)
    den_ref[:] = jnp.zeros_like(den_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG)


def _attend_2d_kernel(toff_ref, tcnt_ref, col_ref, coff_ref, ccnt_ref,
                      *refs, heads, feat, mc, mt, slope, keep_prob,
                      has_bits, has_keep, echunk):
    """Fallback 2-D grid: one slot per grid step."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    it = iter(refs)
    tile_ref = next(it)
    bits_ref = next(it) if has_bits else None
    xt_ref = next(it)
    fsp_ref = next(it)
    recv_ref = next(it)
    fsg_ref = next(it)
    w_ref = next(it)
    xg_ref = next(it)
    keep_ref = next(it) if has_keep else None
    fdp_ref = next(it)
    out_ref, den_ref, m_ref = next(it), next(it), next(it)
    num_ref = next(it)

    @pl.when(j == 0)
    def _():
        _init(num_ref, den_ref, m_ref)

    @pl.when(jnp.logical_and(j < mc, j < ccnt_ref[i]))
    def _():
        _rem_slot(i, recv_ref, fsg_ref, w_ref, xg_ref, keep_ref, fdp_ref,
                  num_ref, den_ref, m_ref, heads=heads, feat=feat,
                  slope=slope, has_keep=has_keep, echunk=echunk)

    @pl.when(jnp.logical_and(j >= mc, j - mc < tcnt_ref[i]))
    def _():
        _tile_slot(tile_ref, bits_ref, xt_ref, fsp_ref, fdp_ref, num_ref,
                   den_ref, m_ref, heads=heads, feat=feat, slope=slope,
                   keep_prob=keep_prob, has_bits=has_bits)

    @pl.when(j == mc + mt - 1)
    def _():
        _epilogue(out_ref, num_ref, den_ref, heads, feat)


def _attend_unrolled_kernel(toff_ref, tcnt_ref, col_ref, coff_ref,
                            ccnt_ref, *refs, heads, feat, mc, mt, slope,
                            keep_prob, has_bits, has_keep, echunk):
    """Unrolled grid (row_blocks,): all slots in one step — per-slot
    operands arrive through per-slot input specs."""
    i = pl.program_id(0)
    it = iter(refs)
    tile_refs = [next(it) for _ in range(mt)]
    bits_refs = [next(it) for _ in range(mt)] if has_bits else [None] * mt
    xt_refs = [next(it) for _ in range(mt)]
    fsp_refs = [next(it) for _ in range(mt)]
    recv_refs = [next(it) for _ in range(mc)]
    fsg_refs = [next(it) for _ in range(mc)]
    w_refs = [next(it) for _ in range(mc)]
    xg_refs = [next(it) for _ in range(mc)]
    keep_refs = [next(it) for _ in range(mc)] if has_keep else [None] * mc
    fdp_ref = next(it)
    out_ref, den_ref, m_ref = next(it), next(it), next(it)
    num_ref = next(it)

    _init(num_ref, den_ref, m_ref)
    for k in range(mc):
        @pl.when(k < ccnt_ref[i])
        def _(k=k):
            _rem_slot(i, recv_refs[k], fsg_refs[k], w_refs[k], xg_refs[k],
                      keep_refs[k], fdp_ref, num_ref, den_ref, m_ref,
                      heads=heads, feat=feat, slope=slope,
                      has_keep=has_keep, echunk=echunk)
    for k in range(mt):
        @pl.when(k < tcnt_ref[i])
        def _(k=k):
            _tile_slot(tile_refs[k], bits_refs[k], xt_refs[k],
                       fsp_refs[k], fdp_ref, num_ref, den_ref, m_ref,
                       heads=heads, feat=feat, slope=slope,
                       keep_prob=keep_prob, has_bits=has_bits)
    _epilogue(out_ref, num_ref, den_ref, heads, feat)


@functools.partial(jax.jit, static_argnames=("heads", "feat", "n_out",
                                             "max_tiles", "max_chunks",
                                             "slope", "keep_prob",
                                             "has_bits", "has_keep",
                                             "interpret", "echunk"))
def attend_online_pallas(tile_off, tile_cnt, col_ids, chunk_off,
                         chunk_cnt, tiles, bits, x2f, fsp, recv_col, fsg,
                         w_col, xg, keep_mul, fdp, heads, feat, n_out,
                         max_tiles, max_chunks, slope, keep_prob,
                         has_bits, has_keep, interpret=False,
                         echunk=EDGE_CHUNK):
    """Whole hybrid attend in one pallas_call.

    Layouts: ``x2f`` [N_pad128, H·F] (tile col blocks); ``fsp`` [H,
    N_pad128] head-major (tile col reads); ``fdp`` [N_pad128, H];
    ``recv_col``/``w_col`` [E_pad, 1]; ``fsg``/``keep_mul`` [E_pad, H];
    ``xg`` [E_pad, H·F] (gathered x rows). Returns (out [N_pad128, H·F]
    in x's dtype — already divided (f32 VMEM scratch accumulates),
    den_raw [N_pad128, H] f32, m [N_pad128, H] f32 — the exact softmax
    shift, NEG where a node saw no edges).
    """
    e_pad = recv_col.shape[0]
    n_chunks = e_pad // echunk
    t_pad = tiles.shape[0]
    n_row_blocks = pl.cdiv(n_out, ROW_BLOCK)
    n_out_pad = n_row_blocks * ROW_BLOCK
    hf = heads * feat
    mc, mt = max_chunks, max_tiles
    unrolled = mc <= UNROLL_MAX_CHUNKS and mt <= UNROLL_MAX_TILES

    def tile_idx(i, jt, toff, tcnt):
        last = toff[i] + jnp.maximum(tcnt[i], 1) - 1
        return jnp.minimum(jnp.minimum(toff[i] + jt, last), t_pad - 1)

    def chunk_idx(i, jj, coff, ccnt):
        last = coff[i] + jnp.maximum(ccnt[i], 1) - 1
        return jnp.minimum(jnp.minimum(coff[i] + jj, last), n_chunks - 1)

    tile_shape = pl.BlockSpec  # alias for brevity below

    if unrolled:
        def tmap(k):
            return lambda i, toff, tcnt, col, coff, ccnt: (
                tile_idx(i, k, toff, tcnt), 0, 0)

        def xtmap(k):
            return lambda i, toff, tcnt, col, coff, ccnt: (
                col[tile_idx(i, k, toff, tcnt)], 0)

        def fspmap(k):
            return lambda i, toff, tcnt, col, coff, ccnt: (
                0, col[tile_idx(i, k, toff, tcnt)])

        def cmap(k):
            return lambda i, toff, tcnt, col, coff, ccnt: (
                chunk_idx(i, k, coff, ccnt), 0)

        def row_map(i, toff, tcnt, col, coff, ccnt):
            return (i, 0)

        grid = (n_row_blocks,)
        kernel_fn = _attend_unrolled_kernel
        in_specs, inputs = [], []
        for k in range(mt):
            in_specs.append(tile_shape((1, ROW_BLOCK, COL_BLOCK),
                                       tmap(k), memory_space=pltpu.VMEM))
            inputs.append(tiles)
        if has_bits:
            for k in range(mt):
                in_specs.append(tile_shape(
                    (1, ROW_BLOCK, COL_BLOCK), tmap(k),
                    memory_space=pltpu.VMEM))
                inputs.append(bits)
        for k in range(mt):
            in_specs.append(tile_shape((COL_BLOCK, hf), xtmap(k),
                                       memory_space=pltpu.VMEM))
            inputs.append(x2f)
        for k in range(mt):
            in_specs.append(tile_shape((heads, COL_BLOCK), fspmap(k),
                                       memory_space=pltpu.VMEM))
            inputs.append(fsp)
        for arr, width in ((recv_col, 1), (fsg, heads), (w_col, 1),
                           (xg, hf)):
            for k in range(mc):
                in_specs.append(tile_shape((echunk, width), cmap(k),
                                           memory_space=pltpu.VMEM))
                inputs.append(arr)
        if has_keep:
            for k in range(mc):
                in_specs.append(tile_shape((echunk, heads), cmap(k),
                                           memory_space=pltpu.VMEM))
                inputs.append(keep_mul)
        in_specs.append(tile_shape((ROW_BLOCK, heads), row_map,
                                   memory_space=pltpu.VMEM))
        inputs.append(fdp)
    else:
        def tile_map(i, j, toff, tcnt, col, coff, ccnt):
            return (tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt), 0, 0)

        def xt_map(i, j, toff, tcnt, col, coff, ccnt):
            return (col[tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt)],
                    0)

        def fsp_map(i, j, toff, tcnt, col, coff, ccnt):
            return (0,
                    col[tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt)])

        def chunk_map(i, j, toff, tcnt, col, coff, ccnt):
            return (chunk_idx(i, jnp.minimum(j, mc - 1), coff, ccnt), 0)

        def row_map(i, j, toff, tcnt, col, coff, ccnt):
            return (i, 0)

        grid = (n_row_blocks, mc + mt)
        kernel_fn = _attend_2d_kernel
        in_specs = [tile_shape((1, ROW_BLOCK, COL_BLOCK), tile_map,
                               memory_space=pltpu.VMEM)]
        inputs = [tiles]
        if has_bits:
            in_specs.append(tile_shape((1, ROW_BLOCK, COL_BLOCK),
                                       tile_map, memory_space=pltpu.VMEM))
            inputs.append(bits)
        in_specs += [
            tile_shape((COL_BLOCK, hf), xt_map, memory_space=pltpu.VMEM),
            tile_shape((heads, COL_BLOCK), fsp_map,
                       memory_space=pltpu.VMEM),
            tile_shape((echunk, 1), chunk_map,
                       memory_space=pltpu.VMEM),
            tile_shape((echunk, heads), chunk_map,
                       memory_space=pltpu.VMEM),
            tile_shape((echunk, 1), chunk_map,
                       memory_space=pltpu.VMEM),
            tile_shape((echunk, hf), chunk_map,
                       memory_space=pltpu.VMEM),
        ]
        inputs += [x2f, fsp, recv_col, fsg, w_col, xg]
        if has_keep:
            in_specs.append(tile_shape((echunk, heads), chunk_map,
                                       memory_space=pltpu.VMEM))
            inputs.append(keep_mul)
        in_specs.append(tile_shape((ROW_BLOCK, heads), row_map,
                                   memory_space=pltpu.VMEM))
        inputs.append(fdp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            tile_shape((ROW_BLOCK, hf), row_map,
                       memory_space=pltpu.VMEM),
            tile_shape((ROW_BLOCK, heads), row_map,
                       memory_space=pltpu.VMEM),
            tile_shape((ROW_BLOCK, heads), row_map,
                       memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((ROW_BLOCK, hf), jnp.float32)],
    )
    kernel = functools.partial(
        kernel_fn, heads=heads, feat=feat, mc=mc, mt=mt, slope=slope,
        keep_prob=keep_prob, has_bits=has_bits, has_keep=has_keep,
        echunk=echunk)
    xb = x2f.dtype.itemsize
    out, den, m = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # interpret=True runs the kernel logic on CPU (CI parity tests)
        interpret=interpret,
        # the unrolled layout holds mc xg chunks + mt x/tile blocks
        # resident at once (double-buffered) — past the default 16 MB
        # scoped-vmem soft limit at H·F = 1024; v5e VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((n_out_pad, hf), x2f.dtype),
            jax.ShapeDtypeStruct((n_out_pad, heads), jnp.float32),
            jax.ShapeDtypeStruct((n_out_pad, heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (t_pad * ROW_BLOCK * COL_BLOCK
                       + e_pad * ROW_BLOCK) * hf,
            bytes_accessed=(t_pad * ROW_BLOCK * COL_BLOCK
                            * (8 if has_bits else 4)
                            + t_pad * COL_BLOCK * hf * xb
                            + e_pad * (hf * xb + heads * 4 + 8)
                            + n_out_pad * (hf * xb + 2 * heads * 4)),
            transcendentals=(t_pad * ROW_BLOCK * COL_BLOCK * heads
                             + 2 * e_pad * heads),
        ),
    )(tile_off, tile_cnt, col_ids, chunk_off, chunk_cnt, *inputs)
    return out, den, m
