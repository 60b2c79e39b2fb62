"""Pallas TPU kernel: per-receiver max of edge scores (segment max).

Companion to the SpMM kernel (same receiver-sorted chunk spans): for each
128-row output block, scan its edge chunks and VPU-max-accumulate scores
whose receiver matches each row:

    out[r, h] = max over edges e in span (recv[e] == row_base+r ?
                score[e, h] : -inf)

Used by the segment-softmax fast path (ops/segment.py:edge_softmax) that
replaces GAT's spmm-rowsum/divide trick (GAT/models/layers.py:112-122).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_kernel import EDGE_CHUNK, ROW_BLOCK

_NEG = -3.0e38  # sentinel lower than any finite f32 score


def _segmax_kernel(off_ref, cnt_ref, recv_ref, score_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _NEG)

    @pl.when(j < cnt_ref[i])
    def _():
        row_base = i * ROW_BLOCK
        cols = row_base + jax.lax.broadcasted_iota(
            jnp.int32, (EDGE_CHUNK, ROW_BLOCK), 1)
        match = recv_ref[:] == cols                     # [E_c, BR]
        h = score_ref.shape[1]
        for hh in range(h):                              # H is small/static
            s = score_ref[:, hh][:, None]                # [E_c, 1]
            masked = jnp.where(match, s, _NEG)
            out_ref[:, hh] = jnp.maximum(
                out_ref[:, hh], jnp.max(masked, axis=0))


@functools.partial(jax.jit, static_argnames=("n_out", "max_chunks"))
def segment_max_pallas(chunk_off, chunk_cnt, recv_col, scores, n_out,
                       max_chunks):
    """scores: f32[E_pad, H] (mask padding to -inf upstream); returns
    f32[n_out, H] per-receiver max; empty rows get the _NEG sentinel."""
    e_pad, h = scores.shape
    n_chunks = e_pad // EDGE_CHUNK
    n_row_blocks = pl.cdiv(n_out, ROW_BLOCK)
    n_out_pad = n_row_blocks * ROW_BLOCK

    def chunk_map(i, j, off, cnt):
        return (jnp.minimum(off[i] + j, n_chunks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_row_blocks, max_chunks),
        in_specs=[
            pl.BlockSpec((EDGE_CHUNK, 1), chunk_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_CHUNK, h), chunk_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, h), lambda i, j, off, cnt: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _segmax_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad, h), jnp.float32),
    )(chunk_off, chunk_cnt, recv_col, scores.astype(jnp.float32))
    return out[:n_out]
