"""Pallas TPU kernel for receiver-sorted COO SpMM (scatter-free segment sum).

Replaces ``torch.spmm`` (GCN/GCN.py:43) / ``SpecialSpmmFunction``
(GAT/models/layers.py:43-64) with a TPU-first design:

XLA performs the sender-row gather (``x[senders] * w``), which TPUs do well;
the kernel eliminates the slow part — scatter-add — by exploiting the
receiver-sorted edge order: each 128-row output block owns a contiguous span
of edge chunks, and the within-block scatter becomes a one-hot selection
matmul that runs on the MXU:

    M[r, e]   = (receivers[e] == row_base + r)
    out_block += M @ gathered_chunk          # (BR, BE) @ (BE, F)

Grid is (row_blocks, max_chunks_per_block); the per-row-block first-chunk
index is scalar-prefetched so BlockSpec index maps can steer the DMA.
Chunks shared by two row blocks are visited by both; the one-hot mask makes
each block count only its own rows. Out-of-span chunk visits are clamped
in-bounds and masked to contribute zero.

The per-row-block spans (``chunk_off``/``chunk_cnt``/``max_chunks``) are
precomputed on host at graph build time (core/graph.py:build_graph) because
they depend only on the static edge ordering, and ``max_chunks`` must be a
static grid bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 128    # output rows per grid step (one-hot matmul M rows)
# Edges per chunk (one-hot matmul contraction dim). Large chunks matter:
# per-grid-step overhead (~1-2us) dominates small chunks — 512-edge chunks
# ran the kernel at ~90GB/s effective, 2048 approaches DMA-bound.
EDGE_CHUNK = 1024


def compute_chunk_spans(receivers_sorted: np.ndarray, n_out: int,
                        chunk: int = EDGE_CHUNK):
    """Host precompute: per-128-row-block (first edge chunk, chunk count).

    Returns (chunk_off int32[n_row_blocks], chunk_cnt int32[n_row_blocks],
    max_chunks int). Padding edges (receiver == n_nodes-1, weight 0) are
    included in the last block's span — harmless, they aggregate zeros.
    ``chunk`` defaults to the SpMM kernel's EDGE_CHUNK; callers with
    their own chunk width (the attend kernel's finer remainder chunks)
    pass it explicitly.
    """
    n_row_blocks = -(-max(n_out, 1) // ROW_BLOCK)
    bounds = np.arange(n_row_blocks + 1) * ROW_BLOCK
    row_start = np.searchsorted(receivers_sorted, bounds, side="left")
    row_start[-1] = receivers_sorted.shape[0]
    lo = row_start[:-1] // chunk
    hi = -(-row_start[1:] // chunk)
    cnt = np.maximum(hi - lo, 0).astype(np.int32)
    return (
        lo.astype(np.int32),
        cnt,
        int(max(cnt.max(initial=1), 1)),
    )


def _onehot_t(recv_ref, row_base):
    # Transposed one-hot: mt[e, r] = (receivers[e] == row_base + r).
    # recv_ref is (EDGE_CHUNK, 1) — column layout keeps the block tiling
    # legal ((512, 1): sublane 512 % 8 == 0, lane == array dim). bf16 holds
    # 0/1 exactly, so the lhs costs no precision.
    cols = row_base + jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_CHUNK, ROW_BLOCK), 1)
    return (recv_ref[:] == cols).astype(jnp.bfloat16)


def _seg_dot(mt, gath):
    # (EDGE_CHUNK, ROW_BLOCK)ᵀ contracted with (EDGE_CHUNK, F) on the MXU,
    # native bf16 rate, f32 accumulate.
    return jax.lax.dot_general(
        mt, gath,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


#: lo values are scaled by 2**8 (exact power-of-two) so bf16 keeps 8 extra
#: mantissa bits of the residual.
LO_SCALE = 256.0


def _spmm_kernel_hilo(off_ref, cnt_ref, recv_ref, gath_ref, out_ref):
    """f32-accurate path: split each gathered f32 chunk into hi/lo bf16
    halves in VMEM (hi = bf16(v), lo = bf16((v - hi) * LO_SCALE)); two
    native-rate bf16 MXU dots give ~16 mantissa bits (bf16x2) at 2/3 the MXU
    passes of precision=HIGHEST. The split must happen inside the kernel:
    XLA's excess-precision folding erases bf16→f32→bf16 round trips when the
    split is staged through HBM."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < cnt_ref[i])
    def _():
        mt = _onehot_t(recv_ref, i * ROW_BLOCK)
        v = gath_ref[:]
        hi = v.astype(jnp.bfloat16)
        lo = ((v - hi.astype(jnp.float32)) * LO_SCALE).astype(jnp.bfloat16)
        acc = _seg_dot(mt, hi)
        acc += _seg_dot(mt, lo) * (1.0 / LO_SCALE)
        out_ref[:] += acc.astype(out_ref.dtype)


def _spmm_kernel_bf16(off_ref, cnt_ref, recv_ref, gath_ref, out_ref):
    """Fast path for bf16 inputs: single native-rate dot per chunk."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < cnt_ref[i])
    def _():
        mt = _onehot_t(recv_ref, i * ROW_BLOCK)
        out_ref[:] += _seg_dot(mt, gath_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_out", "max_chunks"))
def _spmm_pallas_call(chunk_off, chunk_cnt, recv_col, gathered, n_out,
                      max_chunks):
    e_pad = recv_col.shape[0]
    f = gathered.shape[1]
    n_chunks = e_pad // EDGE_CHUNK
    n_row_blocks = pl.cdiv(n_out, ROW_BLOCK)
    n_out_pad = n_row_blocks * ROW_BLOCK

    f32_in = gathered.dtype == jnp.float32
    if f32_in:
        tensor_inputs = (gathered,)
        kernel = _spmm_kernel_hilo
    else:
        tensor_inputs = (gathered,)
        kernel = _spmm_kernel_bf16

    def chunk_map(i, j, off, cnt):
        # Clamp out-of-span steps (j >= cnt[i]) to the block's LAST in-span
        # chunk, not a moving index: Pallas elides the copy when consecutive
        # grid steps map to the same block, so masked steps cost no DMA.
        # Adjacent row blocks sharing a boundary chunk get the same elision
        # (block i's last chunk == block i+1's first). With avg ~3 chunks
        # per 128-row block and max_chunks up to 2x that, this cuts HBM
        # reads by ~40% on random graphs.
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        return (jnp.minimum(jnp.minimum(off[i] + j, last), n_chunks - 1), 0)

    gath_spec = pl.BlockSpec((EDGE_CHUNK, f), chunk_map,
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_row_blocks, max_chunks),
        in_specs=[
            pl.BlockSpec((EDGE_CHUNK, 1), chunk_map,
                         memory_space=pltpu.VMEM),
        ] + [gath_spec] * len(tensor_inputs),
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, f),
            lambda i, j, off, cnt: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_row_blocks * max_chunks * ROW_BLOCK * EDGE_CHUNK * f
            * len(tensor_inputs),
            bytes_accessed=(e_pad * f * 4 + n_out_pad * f * 4),
            transcendentals=0,
        ),
    )(chunk_off, chunk_cnt, recv_col, *tensor_inputs)
    return out[:n_out].astype(gathered.dtype)


def spmm_pallas(senders, receivers, weights, x, n_out: int,
                chunk_off=None, chunk_cnt=None, max_chunks: int | None = None):
    """Receiver-sorted COO SpMM via the one-hot matmul kernel.

    If the spans are not provided (raw-array call sites), they are computed —
    on host when ``receivers`` is concrete, else on device with the
    worst-case static grid bound.
    """
    e_pad = receivers.shape[0]
    assert e_pad % EDGE_CHUNK == 0, (
        f"edge padding {e_pad} not a multiple of {EDGE_CHUNK}")
    gathered = x[senders] * weights[:, None].astype(x.dtype)
    recv_col = receivers.reshape(e_pad, 1)

    if chunk_off is None:
        if isinstance(receivers, jax.core.Tracer):
            n_chunks = e_pad // EDGE_CHUNK
            n_row_blocks = -(-n_out // ROW_BLOCK)
            bounds = jnp.arange(
                n_row_blocks + 1, dtype=jnp.int32) * ROW_BLOCK
            row_start = jnp.searchsorted(receivers, bounds, side="left")
            chunk_off = (row_start[:-1] // EDGE_CHUNK).astype(jnp.int32)
            hi = -(-row_start[1:] // EDGE_CHUNK)
            chunk_cnt = jnp.maximum(hi - chunk_off, 0).astype(jnp.int32)
            max_chunks = n_chunks
        else:
            lo, cnt, max_chunks = compute_chunk_spans(
                np.asarray(receivers), n_out)
            chunk_off, chunk_cnt = jnp.asarray(lo), jnp.asarray(cnt)

    return _spmm_pallas_call(
        chunk_off, chunk_cnt, recv_col, gathered, n_out, int(max_chunks))
