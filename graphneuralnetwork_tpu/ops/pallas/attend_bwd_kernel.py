"""Backward kernels for the one-kernel hybrid GAT attend.

The forward (attend_online_kernel.py) emits out, den and the exact
softmax shift m. With gn = g/den and dden = −Σ_f(g·out)/den precomputed
(two cheap XLA passes), the cotangents decompose into two passes that
both recompute p = w·exp(leaky(·)−m) from the residual node arrays and
never materialise per-edge tensors:

  * **pass A** (receiver rows; forward tiles + forward remainder):
      ds   = p ⊙ (gn_r·x_s + dden_r) ⊙ leaky'        # per slot
      dfd_r = Σ_s ds                                  # row-owned
  * **pass B** (sender rows; TRANSPOSE tiles + transpose remainder):
      dx_s  = Σ_r p ⊙ gn_r                            # row-owned MXU
      dfs_s = Σ_r ds                                  # row-owned

The q = gn_r·x_s inner products are per-tile MXU matmuls (contract the
feature dim), the same cost class as the forward's aggregation matmuls;
remainder chunks fetch row-side values through the one-hot matmul
exactly like the forward. m is a stop-gradient (softmax shift
invariance), tiles are constants, so these two passes are the complete
gradient w.r.t. (x, f_src, f_dst).

Attention dropout is fully supported: pass A reuses the forward tile
lattice and remainder keep multiplier directly (its rows are receiver-
owned, like the forward), and pass B views the SAME masks in the
transpose layout through build-time alignment maps — bits_t[t'] is the
transposed lattice of forward tile ``HybridGraph.bits_tmap[t']`` and
keepm_t the remainder multiplier permuted by ``rem_t_eperm`` — so
forward and backward see identical Bernoulli draws by construction.

Replaces the gradient of GAT/models/layers.py:94-131 (the reference's
SpecialSpmmFunction.backward dense-index trick at :54-64) on the hybrid
layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.bcsr import COL_BLOCK, ROW_BLOCK
from .attend_online_kernel import _head_keep

_HI = jax.lax.Precision.HIGHEST


def _lk(v, slope):
    return jnp.where(v > 0, v, slope * v)


def _lkp(v, slope):
    return jnp.where(v > 0, 1.0, slope)


def _xprec(xdt):
    return _HI if xdt == jnp.float32 else jax.lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# pass A: dfd over receiver rows (forward tiles + forward remainder)
# ---------------------------------------------------------------------------


def _bwd_a_kernel(toff_ref, tcnt_ref, col_ref, coff_ref, ccnt_ref,
                  *refs, heads, feat, mc, mt, slope, echunk, keep_prob,
                  has_keep):
    """fdm3_ref: [RB, 3H] = [fd ‖ m ‖ dden] row block (one operand).
    With dropout, ``bits_ref`` is the forward tile lattice and
    ``keepm_ref`` the remainder keep/keep_prob multiplier — the q
    (numerator) term is masked exactly as the forward masked p."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    it = iter(refs)
    tile_ref = next(it)
    bits_ref = next(it) if has_keep else None
    xt_ref, fsp_ref, gn_ref, fdm3_ref = (next(it), next(it), next(it),
                                         next(it))
    recv_ref, sxg_ref, fsg_ref, w_ref = (next(it), next(it), next(it),
                                         next(it))
    keepm_ref = next(it) if has_keep else None
    dfd_ref = next(it)

    @pl.when(j == 0)
    def _():
        dfd_ref[:] = jnp.zeros_like(dfd_ref)

    # ---- remainder chunk ----
    @pl.when(jnp.logical_and(j < mc, j < ccnt_ref[i]))
    def _():
        cols = i * ROW_BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (echunk, ROW_BLOCK), 1)
        mt_b = recv_ref[:] == cols                   # [E, RB]
        mt_f = mt_b.astype(jnp.float32)
        fdm = jax.lax.dot_general(
            mt_f, fdm3_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)
        s_pre = fsg_ref[:] + fdm[:, :heads]          # [E, H]
        p = w_ref[:] * jnp.exp(
            jnp.minimum(_lk(s_pre, slope) - fdm[:, heads:2 * heads], 0.0))
        xdt = sxg_ref.dtype
        mt_x = mt_b.astype(xdt)
        gn_e = jax.lax.dot_general(
            mt_x, gn_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_xprec(xdt), preferred_element_type=jnp.float32)
        q_cols = []
        for h in range(heads):
            prod = gn_e[:, h * feat:(h + 1) * feat] \
                * sxg_ref[:, h * feat:(h + 1) * feat].astype(jnp.float32)
            q_cols.append(prod.sum(axis=1, keepdims=True))   # [E, 1]
        q = jnp.concatenate(q_cols, axis=1)                  # [E, H]
        if has_keep:
            q = q * keepm_ref[:]
        ds = p * (q + fdm[:, 2 * heads:]) * _lkp(s_pre, slope)
        dfd_ref[:] += jax.lax.dot_general(
            mt_f, ds, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)

    # ---- dense tile ----
    @pl.when(jnp.logical_and(j >= mc, j - mc < tcnt_ref[i]))
    def _():
        w = tile_ref[0].astype(jnp.float32)          # [RB, CB]
        xdt = xt_ref.dtype
        for h in range(heads):
            fd_col = fdm3_ref[:, h:h + 1]            # [RB, 1]
            m_col = fdm3_ref[:, heads + h:heads + h + 1]
            dd_col = fdm3_ref[:, 2 * heads + h:2 * heads + h + 1]
            fs_row = fsp_ref[h][None, :]             # [1, CB]
            s_pre = fd_col + fs_row                  # [RB, CB]
            p = w * jnp.exp(jnp.minimum(_lk(s_pre, slope) - m_col, 0.0))
            q = jax.lax.dot_general(
                gn_ref[:, h * feat:(h + 1) * feat].astype(xdt),
                xt_ref[:, h * feat:(h + 1) * feat],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=_xprec(xdt),
                preferred_element_type=jnp.float32)  # [RB, CB]
            if has_keep:
                keep = _head_keep(bits_ref[0], h, keep_prob)
                q = jnp.where(keep, q * (1.0 / keep_prob), 0.0)
            ds = p * (q + dd_col) * _lkp(s_pre, slope)
            dfd_ref[:, h:h + 1] += ds.sum(axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("heads", "feat", "n_out",
                                             "max_tiles", "max_chunks",
                                             "slope", "echunk",
                                             "keep_prob", "has_keep",
                                             "interpret"))
def attend_bwd_a_pallas(tile_off, tile_cnt, col_ids, chunk_off, chunk_cnt,
                        tiles, bits, x2f, fsp, gn2f, fdm3, recv_col, sxg,
                        fsg, w_col, keepm, heads, feat, n_out, max_tiles,
                        max_chunks, slope, echunk, keep_prob=1.0,
                        has_keep=False, interpret=False):
    """dfd [N_pad128, H] f32. Layouts: x2f/gn2f [N_pad, H·F]; fsp
    [H, N_pad]; fdm3 [N_pad, 3H] = [fd ‖ m ‖ dden]; remainder operands
    per edge (receiver-sorted, fine chunks)."""
    e_pad = recv_col.shape[0]
    n_chunks = e_pad // echunk
    t_pad = tiles.shape[0]
    n_rb = pl.cdiv(n_out, ROW_BLOCK)
    n_out_pad = n_rb * ROW_BLOCK
    hf = heads * feat
    mc, mt = max_chunks, max_tiles

    def tile_idx(i, jt, toff, tcnt):
        last = toff[i] + jnp.maximum(tcnt[i], 1) - 1
        return jnp.minimum(jnp.minimum(toff[i] + jt, last), t_pad - 1)

    def tile_map(i, j, toff, tcnt, col, coff, ccnt):
        return (tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt), 0, 0)

    def xt_map(i, j, toff, tcnt, col, coff, ccnt):
        return (col[tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt)], 0)

    def fsp_map(i, j, toff, tcnt, col, coff, ccnt):
        return (0, col[tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt)])

    def chunk_map(i, j, toff, tcnt, col, coff, ccnt):
        jj = jnp.minimum(j, mc - 1)
        last = coff[i] + jnp.maximum(ccnt[i], 1) - 1
        return (jnp.minimum(jnp.minimum(coff[i] + jj, last),
                            n_chunks - 1), 0)

    def row_map(i, j, toff, tcnt, col, coff, ccnt):
        return (i, 0)

    in_specs = [pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                             memory_space=pltpu.VMEM)]
    inputs = [tiles]
    if has_keep:
        in_specs.append(pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(bits)
    in_specs += [
        pl.BlockSpec((COL_BLOCK, hf), xt_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, COL_BLOCK), fsp_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, hf), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, 3 * heads), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, 1), chunk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, hf), chunk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, heads), chunk_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, 1), chunk_map, memory_space=pltpu.VMEM),
    ]
    inputs += [x2f, fsp, gn2f, fdm3, recv_col, sxg, fsg, w_col]
    if has_keep:
        in_specs.append(pl.BlockSpec((echunk, heads), chunk_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(keepm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_rb, mc + mt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_BLOCK, heads), row_map,
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _bwd_a_kernel, heads=heads, feat=feat, mc=mc, mt=mt, slope=slope,
        echunk=echunk, keep_prob=keep_prob, has_keep=has_keep)
    xb = x2f.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((n_out_pad, heads), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * (t_pad * ROW_BLOCK * COL_BLOCK
                       + e_pad * ROW_BLOCK) * hf,
            bytes_accessed=(t_pad * (ROW_BLOCK * COL_BLOCK * 4
                                     + 2 * COL_BLOCK * hf * xb)
                            + e_pad * (2 * hf * xb + heads * 4 + 8)
                            + n_out_pad * heads * 4),
            transcendentals=(t_pad * ROW_BLOCK * COL_BLOCK * heads
                             + e_pad * heads),
        ),
    )(tile_off, tile_cnt, col_ids, chunk_off, chunk_cnt, *inputs)


# ---------------------------------------------------------------------------
# pass B: dx + dfs over sender rows (transpose tiles + transpose remainder)
# ---------------------------------------------------------------------------


def _bwd_b_kernel(toff_ref, tcnt_ref, col_ref, coff_ref, ccnt_ref,
                  *refs, heads, feat, mc, mt, slope, echunk, keep_prob,
                  has_keep):
    """Transpose layout: rows = senders. rcol3_ref [3H, CB] head-major
    = [fd ‖ m ‖ dden] of the tile's RECEIVER column block; xr_ref/
    fsr_ref row-side x and f_src; gng/rdm3: per-transpose-edge gathered
    gn [E, H·F] and [fd ‖ m ‖ dden] [E, 3H]."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    it = iter(refs)
    tile_ref = next(it)
    bits_t_ref = next(it) if has_keep else None
    gnc_ref, rcol3_ref, xr_ref, fsr_ref = (next(it), next(it), next(it),
                                           next(it))
    srecv_ref, gng_ref, rdm3_ref, w_ref = (next(it), next(it), next(it),
                                           next(it))
    keepm_t_ref = next(it) if has_keep else None
    dx_ref, dfs_ref = next(it), next(it)
    dxacc_ref = next(it)

    @pl.when(j == 0)
    def _():
        dxacc_ref[:] = jnp.zeros_like(dxacc_ref)
        dfs_ref[:] = jnp.zeros_like(dfs_ref)

    # ---- transpose remainder chunk ----
    @pl.when(jnp.logical_and(j < mc, j < ccnt_ref[i]))
    def _():
        cols = i * ROW_BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (echunk, ROW_BLOCK), 1)
        mt_b = srecv_ref[:] == cols                  # [E, RB]
        mt_f = mt_b.astype(jnp.float32)
        fs_e = jax.lax.dot_general(
            mt_f, fsr_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)  # [E, H]
        s_pre = fs_e + rdm3_ref[:, :heads]
        p = w_ref[:] * jnp.exp(jnp.minimum(
            _lk(s_pre, slope) - rdm3_ref[:, heads:2 * heads], 0.0))
        xdt = gng_ref.dtype
        mt_x = mt_b.astype(xdt)
        x_e = jax.lax.dot_general(
            mt_x, xr_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_xprec(xdt), preferred_element_type=jnp.float32)
        q_cols = []
        for h in range(heads):
            prod = x_e[:, h * feat:(h + 1) * feat] \
                * gng_ref[:, h * feat:(h + 1) * feat].astype(jnp.float32)
            q_cols.append(prod.sum(axis=1, keepdims=True))
        q = jnp.concatenate(q_cols, axis=1)          # [E, H]
        if has_keep:
            q = q * keepm_t_ref[:]
        ds = p * (q + rdm3_ref[:, 2 * heads:]) * _lkp(s_pre, slope)
        dfs_ref[:] += jax.lax.dot_general(
            mt_f, ds, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)
        p_num = p * keepm_t_ref[:] if has_keep else p
        px = p_num.astype(xdt)
        for h in range(heads):
            vals = px[:, h:h + 1] * gng_ref[:, h * feat:(h + 1) * feat]
            dxacc_ref[:, h * feat:(h + 1) * feat] += jax.lax.dot_general(
                mt_x, vals, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=_xprec(xdt), preferred_element_type=jnp.float32)

    # ---- transpose dense tile ----
    @pl.when(jnp.logical_and(j >= mc, j - mc < tcnt_ref[i]))
    def _():
        w = tile_ref[0].astype(jnp.float32)          # [RB, CB] (Aᵀ)
        xdt = gnc_ref.dtype
        for h in range(heads):
            fs_col = fsr_ref[:, h:h + 1]             # [RB, 1] sender fs
            fd_row = rcol3_ref[h][None, :]           # [1, CB] recv fd
            m_row = rcol3_ref[heads + h][None, :]
            dd_row = rcol3_ref[2 * heads + h][None, :]
            s_pre = fs_col + fd_row                  # [RB, CB]
            p = w * jnp.exp(jnp.minimum(_lk(s_pre, slope) - m_row, 0.0))
            if has_keep:
                keep = _head_keep(bits_t_ref[0], h, keep_prob)
                p_num = jnp.where(keep, p * (1.0 / keep_prob), 0.0)
            else:
                p_num = p
            dxacc_ref[:, h * feat:(h + 1) * feat] += jax.lax.dot_general(
                p_num.astype(xdt), gnc_ref[:, h * feat:(h + 1) * feat],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=_xprec(xdt),
                preferred_element_type=jnp.float32)
            q = jax.lax.dot_general(
                xr_ref[:, h * feat:(h + 1) * feat],
                gnc_ref[:, h * feat:(h + 1) * feat],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=_xprec(xdt),
                preferred_element_type=jnp.float32)  # [RB, CB]
            if has_keep:
                q = jnp.where(keep, q * (1.0 / keep_prob), 0.0)
            ds = p * (q + dd_row) * _lkp(s_pre, slope)
            dfs_ref[:, h:h + 1] += ds.sum(axis=1, keepdims=True)

    @pl.when(j == mc + mt - 1)
    def _():
        dx_ref[:] = dxacc_ref[:].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "feat", "n_out",
                                             "max_tiles", "max_chunks",
                                             "slope", "echunk",
                                             "keep_prob", "has_keep",
                                             "interpret"))
def attend_bwd_b_pallas(tile_off, tile_cnt, col_ids, chunk_off, chunk_cnt,
                        tiles_t, bits_t, gn2f, rcol3, x2f, fsr, srecv_col,
                        gng, rdm3, w_col, keepm_t, heads, feat, n_out,
                        max_tiles, max_chunks, slope, echunk,
                        keep_prob=1.0, has_keep=False, interpret=False):
    """(dx [N_pad128, H·F] in x dtype, dfs [N_pad128, H] f32).

    ``tiles_t`` etc. describe Aᵀ (rows = senders); ``rcol3`` is
    [3H, N_pad] head-major [fd ‖ m ‖ dden] for column reads; ``fsr``
    [N_pad, H] node-major f_src; ``gng``/``rdm3`` per-transpose-edge
    gathered receiver-side gn and [fd ‖ m ‖ dden]."""
    e_pad = srecv_col.shape[0]
    n_chunks = e_pad // echunk
    t_pad = tiles_t.shape[0]
    n_rb = pl.cdiv(n_out, ROW_BLOCK)
    n_out_pad = n_rb * ROW_BLOCK
    hf = heads * feat
    mc, mt = max_chunks, max_tiles

    def tile_idx(i, jt, toff, tcnt):
        last = toff[i] + jnp.maximum(tcnt[i], 1) - 1
        return jnp.minimum(jnp.minimum(toff[i] + jt, last), t_pad - 1)

    def tile_map(i, j, toff, tcnt, col, coff, ccnt):
        return (tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt), 0, 0)

    def gnc_map(i, j, toff, tcnt, col, coff, ccnt):
        return (col[tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt)], 0)

    def rcol3_map(i, j, toff, tcnt, col, coff, ccnt):
        return (0, col[tile_idx(i, jnp.maximum(j - mc, 0), toff, tcnt)])

    def chunk_map(i, j, toff, tcnt, col, coff, ccnt):
        jj = jnp.minimum(j, mc - 1)
        last = coff[i] + jnp.maximum(ccnt[i], 1) - 1
        return (jnp.minimum(jnp.minimum(coff[i] + jj, last),
                            n_chunks - 1), 0)

    def row_map(i, j, toff, tcnt, col, coff, ccnt):
        return (i, 0)

    in_specs = [pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                             memory_space=pltpu.VMEM)]
    inputs = [tiles_t]
    if has_keep:
        in_specs.append(pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(bits_t)
    in_specs += [
        pl.BlockSpec((COL_BLOCK, hf), gnc_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * heads, COL_BLOCK), rcol3_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, hf), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, 1), chunk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, hf), chunk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, 3 * heads), chunk_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((echunk, 1), chunk_map, memory_space=pltpu.VMEM),
    ]
    inputs += [gn2f, rcol3, x2f, fsr, srecv_col, gng, rdm3, w_col]
    if has_keep:
        in_specs.append(pl.BlockSpec((echunk, heads), chunk_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(keepm_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_rb, mc + mt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, hf), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, heads), row_map,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((ROW_BLOCK, hf), jnp.float32)],
    )
    kernel = functools.partial(
        _bwd_b_kernel, heads=heads, feat=feat, mc=mc, mt=mt, slope=slope,
        echunk=echunk, keep_prob=keep_prob, has_keep=has_keep)
    xb = x2f.dtype.itemsize
    dx, dfs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((n_out_pad, hf), x2f.dtype),
            jax.ShapeDtypeStruct((n_out_pad, heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * (t_pad * ROW_BLOCK * COL_BLOCK
                       + e_pad * ROW_BLOCK) * hf,
            bytes_accessed=(t_pad * (ROW_BLOCK * COL_BLOCK * 4
                                     + 2 * COL_BLOCK * hf * xb)
                            + e_pad * (2 * hf * xb + 3 * heads * 4 + 8)
                            + n_out_pad * (hf * xb + heads * 4)),
            transcendentals=(t_pad * ROW_BLOCK * COL_BLOCK * heads
                             + e_pad * heads),
        ),
    )(tile_off, tile_cnt, col_ids, chunk_off, chunk_cnt, *inputs)
    return dx, dfs
