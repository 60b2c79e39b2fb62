"""Fused COO-remainder attention pass: score+exp+aggregate in one kernel.

The hybrid GAT attend (ops/bcsr_attention.py) routes straggler edges
outside well-filled tiles through a COO composition of sddmm -> leaky ->
exp -> segment-sum (den) -> gather*mult -> segment-sum (num). On TPU the
glue around those edge ops measured ~100 ns/edge (PERF_NOTES round 4) —
dominated by the [E, H] intermediates (lane-padded 16x at H=8) and the
extra [E, H*F] round trips between XLA fusions and the aggregation
kernels. This kernel computes BOTH softmax partials in ONE pass over the
receiver-sorted remainder edges, with the same chunk-span machinery as
the SpMM kernel (ops/pallas/spmm_kernel.py):

  per (row_block i, edge_chunk j):
    mt[e, r]  = (receivers[e] == i*RB + r)          # one-hot (MXU lhs)
    fd_e      = mt @ fd_block                       # per-edge receiver
    m_e       = mt @ m_block                        #   logits via MXU
    p         = w_e * exp(min(leaky(fsg_e + fd_e) - m_e, 0))   # [E, H]
    den_blk  += mt^T @ p                            # [RB, H]
    num_blk  += mt^T @ (keep_e * p * xg_e)          # [RB, H*F] per head

Out-of-block edges (boundary chunks visited by two row blocks) get a
zero one-hot row, so their (garbage-fd) contributions vanish in both
mt^T contractions; the exp argument is clamped at 0 (exact for in-block
edges — ``m`` is the global score max) so no inf*0 NaNs can form.
Padding edges carry w=0. Only the [E, H*F] gathered-x stream and the
narrow [E, H] f_src gather are materialised outside; the [E, H] score/
probability intermediates never touch HBM.

Replaces the composition only on the forward path; the backward runs
through the XLA formulation's VJP (ops/bcsr_attention._rem_parts).

Reference being replaced: the per-edge attention of
GAT/models/layers.py:105-122 (E x 2F concat, edge softmax, scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_kernel import EDGE_CHUNK, ROW_BLOCK


def _rem_attend_kernel(off_ref, cnt_ref, recv_ref, *refs, heads, feat,
                       slope, has_keep):
    i = pl.program_id(0)
    j = pl.program_id(1)
    if has_keep:
        (fsg_ref, w_ref, xg_ref, keep_ref, fd_ref, m_ref,
         num_ref, den_ref) = refs
    else:
        fsg_ref, w_ref, xg_ref, fd_ref, m_ref, num_ref, den_ref = refs
        keep_ref = None

    @pl.when(j == 0)
    def _():
        num_ref[:] = jnp.zeros_like(num_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(j < cnt_ref[i])
    def _():
        cols = i * ROW_BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (EDGE_CHUNK, ROW_BLOCK), 1)
        mt = (recv_ref[:] == cols)                       # [E, RB] bool
        mt_f = mt.astype(jnp.float32)
        # per-edge receiver logits via one small MXU matmul: fd and m
        # are [RB, H] blocks, fdm = mt @ [fd ‖ m] -> [E, 2H].
        # HIGHEST: TPU f32 matmuls at DEFAULT run one bf16 pass, which
        # quantises the logits to ~1e-2 relative (measured 3e-3 grad
        # error); these side dots are tiny, so full precision is free.
        fdm = jax.lax.dot_general(
            mt_f, jnp.concatenate([fd_ref[:], m_ref[:]], axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        s = fsg_ref[:] + fdm[:, :heads]
        s = jnp.where(s > 0, s, slope * s) - fdm[:, heads:]
        # clamp at 0: exact for in-block edges (m is the global max) and
        # bounds exp <= 1 for out-of-block edges whose fd/m are zeros —
        # their mt row is zero so the contractions drop them exactly,
        # but an unclamped exp could overflow to inf and 0*inf = NaN.
        p = w_ref[:] * jnp.exp(jnp.minimum(s, 0.0))      # [E, H]
        den_ref[:] += jax.lax.dot_general(
            mt_f, p, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        if has_keep:
            p = p * keep_ref[:]
        xdt = xg_ref.dtype
        px = p.astype(xdt)
        mt_x = mt.astype(xdt)
        for h in range(heads):
            vals = px[:, h:h + 1] * xg_ref[:, h * feat:(h + 1) * feat]
            num_ref[:, h * feat:(h + 1) * feat] += jax.lax.dot_general(
                mt_x, vals,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=(jax.lax.Precision.HIGHEST
                           if xdt == jnp.float32
                           else jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("heads", "feat", "n_out",
                                             "max_chunks", "slope",
                                             "has_keep"))
def rem_attend_pallas(chunk_off, chunk_cnt, recv_col, fsg, w_col, xg,
                      keep_mul, fd_pad, m_pad, heads, feat, n_out,
                      max_chunks, slope, has_keep):
    """One fused pass over receiver-sorted remainder edges.

    ``recv_col``/``w_col``: [E_pad, 1]; ``fsg`` (gathered f_src) and
    ``keep_mul``: [E_pad, H] f32; ``xg`` (gathered x): [E_pad, H*F];
    ``fd_pad``/``m_pad``: [N_pad128, H] f32 (node-major, padded to the
    row-block multiple). Returns (num [N_pad128, H*F] f32,
    den [N_pad128, H] f32).
    """
    e_pad = recv_col.shape[0]
    n_chunks = e_pad // EDGE_CHUNK
    n_row_blocks = pl.cdiv(n_out, ROW_BLOCK)
    n_out_pad = n_row_blocks * ROW_BLOCK
    hf = heads * feat

    def chunk_map(i, j, off, cnt):
        # same clamped map as the SpMM kernel: out-of-span steps revisit
        # the block's last chunk (Pallas elides the repeat DMA)
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        return (jnp.minimum(jnp.minimum(off[i] + j, last),
                            n_chunks - 1), 0)

    def row_map(i, j, off, cnt):
        return (i, 0)

    in_specs = [
        pl.BlockSpec((EDGE_CHUNK, 1), chunk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((EDGE_CHUNK, heads), chunk_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((EDGE_CHUNK, 1), chunk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((EDGE_CHUNK, hf), chunk_map,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [recv_col, fsg, w_col, xg]
    if has_keep:
        in_specs.append(pl.BlockSpec((EDGE_CHUNK, heads), chunk_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(keep_mul)
    in_specs += [
        pl.BlockSpec((ROW_BLOCK, heads), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, heads), row_map,
                     memory_space=pltpu.VMEM),
    ]
    inputs += [fd_pad, m_pad]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_row_blocks, max_chunks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, hf), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, heads), row_map,
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _rem_attend_kernel, heads=heads, feat=feat, slope=slope,
        has_keep=has_keep)
    xb = xg.dtype.itemsize
    num, den = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_out_pad, hf), jnp.float32),
            jax.ShapeDtypeStruct((n_out_pad, heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_row_blocks * max_chunks * EDGE_CHUNK
            * ROW_BLOCK * (hf + 3 * heads),
            bytes_accessed=(e_pad * (hf * xb + heads * 4 + 8)
                            + n_out_pad * (hf + heads) * 4),
            transcendentals=e_pad * heads * 2,
        ),
    )(chunk_off, chunk_cnt, *inputs)
    return num, den
