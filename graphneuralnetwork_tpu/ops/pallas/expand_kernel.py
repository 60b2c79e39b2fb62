"""Pallas TPU kernel: expand per-node values to (receiver-sorted) edges.

``out[e] = values[receivers[e]]`` — the transpose of the SpMM aggregation
kernel, and the replacement for XLA's 1-D gather, which on TPU is per-row
bound (~7ns/row regardless of width) and costs as much for an [E] scalar
gather as for full 512-byte rows. Receiver-sortedness makes the expand
structured: each 1024-edge chunk touches a handful of 128-row node blocks,
so the gather becomes a one-hot selection matmul on the MXU:

    M[e, r]    = (receivers[e] == row_base + r)        # [E_c, BR]
    out_chunk += M @ values_block                      # (E_c,BR) @ (BR,H)

Grid is (edge_chunks, max_row_blocks_per_chunk); the per-chunk first
row-block index is scalar-prefetched (the inverse of the SpMM kernel's
per-row-block chunk spans). Selection must be exact for f32 values, so the
value block is split hi/lo bf16 in VMEM (same trick as the SpMM kernel)
— two native-rate dots reconstruct the f32 value bit-ranges.

Used for the receiver-side reads of GAT attention (f_dst[receivers],
softmax max/denominator expands) that XLA would gather row-by-row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_kernel import EDGE_CHUNK, LO_SCALE, ROW_BLOCK


def compute_rowblock_spans(receivers_sorted: np.ndarray, n_out: int):
    """Host precompute: per-1024-edge-chunk (first 128-row block, count).

    Padding edges keep the last real receiver, so they stay in-range.
    Returns (rb_off int32[n_chunks], rb_cnt int32[n_chunks], max_rb int).
    """
    e_pad = receivers_sorted.shape[0]
    n_chunks = max(e_pad // EDGE_CHUNK, 1)
    r = receivers_sorted.reshape(n_chunks, EDGE_CHUNK)
    lo = r[:, 0] // ROW_BLOCK
    hi = r[:, -1] // ROW_BLOCK
    cnt = (hi - lo + 1).astype(np.int32)
    return lo.astype(np.int32), cnt, int(max(cnt.max(initial=1), 1))


def _expand_kernel(off_ref, cnt_ref, recv_ref, val_ref, out_ref):
    i = pl.program_id(0)   # edge chunk
    j = pl.program_id(1)   # row block within the chunk's span

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < cnt_ref[i])
    def _():
        row_base = (off_ref[i] + j) * ROW_BLOCK
        cols = row_base + jax.lax.broadcasted_iota(
            jnp.int32, (EDGE_CHUNK, ROW_BLOCK), 1)
        m = (recv_ref[:] == cols).astype(jnp.bfloat16)   # exact 0/1
        v = val_ref[:]
        hi = v.astype(jnp.bfloat16)
        lo = ((v - hi.astype(jnp.float32)) * LO_SCALE).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            m, hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            m, lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / LO_SCALE)
        out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("max_rb",))
def expand_pallas(rb_off, rb_cnt, recv_col, values, max_rb):
    """values: f32[n_nodes, H] → f32[E_pad, H] with out[e] = values[recv[e]].

    ``recv_col``: int32[E_pad, 1] receiver-sorted; ``rb_off``/``rb_cnt``/
    ``max_rb`` from ``compute_rowblock_spans``.
    """
    e_pad = recv_col.shape[0]
    n, h = values.shape
    n_chunks = e_pad // EDGE_CHUNK
    n_row_blocks = pl.cdiv(n, ROW_BLOCK)
    n_pad = n_row_blocks * ROW_BLOCK
    if n_pad != n:
        values = jnp.pad(values, ((0, n_pad - n), (0, 0)))

    def val_map(i, j, off, cnt):
        # Clamp masked steps to the chunk's last in-span block so Pallas
        # elides the copy (same trick as the SpMM kernel's chunk_map).
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        return (jnp.minimum(jnp.minimum(off[i] + j, last),
                            n_row_blocks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, max_rb),
        in_specs=[
            pl.BlockSpec((EDGE_CHUNK, 1), lambda i, j, off, cnt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, h), val_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (EDGE_CHUNK, h), lambda i, j, off, cnt: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, h), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * max_rb * EDGE_CHUNK * ROW_BLOCK * h * 2,
            bytes_accessed=(e_pad * (h + 1) * 4 + n_pad * h * 4),
            transcendentals=0,
        ),
    )(rb_off, rb_cnt, recv_col, values.astype(jnp.float32))
    return out
