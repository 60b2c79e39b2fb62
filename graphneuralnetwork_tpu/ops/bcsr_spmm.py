"""BCSR SpMM: dense-tile aggregation on the MXU.

``bcsr_spmm(bg, x, bg_t)`` computes the same ``out[r] = Σ w_sr·x[s]`` as
``ops.spmm`` (torch.spmm semantics, GCN/GCN.py:43) but over the dense-tile
layout of ``core/bcsr.py``: a block gather of x (sequential HBM reads), a
batched tile matmul, and a block-level segment sum. On locality-reordered
graphs this removes the per-edge random row gather that caps the COO path
(PERF_NOTES.md).

Backward d/dx is the transpose operator: ``bcsr_spmm(bg_t, g)`` with the
Aᵀ tiles built once at graph-build time (``build_bcsr_transpose``) —
the BCSR analogue of SpecialSpmmFunction.backward
(GAT/models/layers.py:54-64). Tile values are treated as constants (static
adjacency weights); their cotangent is a symbolic zero that XLA removes.

Two implementations behind the usual switch (ops.set_ops_impl):
  * XLA: block gather + einsum + segment_sum — already fast, fully fused.
  * Pallas: one kernel, grid (row_block, tile_slot); per step DMAs one
    tile [RB, CB] and one x block [CB, F] (index-mapped through the
    scalar-prefetched ``col_ids``) and accumulates ``tile @ x_block``
    into the resident out block. Same span/clamp scheme as the COO kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bcsr import COL_BLOCK, ROW_BLOCK, BCSRGraph


def _pad_rows(x: jax.Array, n_pad: int) -> jax.Array:
    if x.shape[0] == n_pad:
        return x
    return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


def _precision(dtype):
    # f32: bf16x3 passes ≈ f32 accuracy; bf16: single native pass.
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _bcsr_xla(bg: BCSRGraph, x: jax.Array) -> jax.Array:
    n_rb = bg.n_node_pad // ROW_BLOCK
    xp = _pad_rows(x, bg.n_node_pad)
    xb = xp.reshape(-1, COL_BLOCK, x.shape[1])
    gath = xb[bg.col_ids]                                # [T, CB, F]
    prod = jnp.einsum(
        "trc,tcf->trf", bg.tiles.astype(x.dtype), gath,
        precision=_precision(x.dtype),
        preferred_element_type=jnp.float32)
    outb = jax.ops.segment_sum(prod, bg.row_ids, num_segments=n_rb,
                               indices_are_sorted=True)
    return outb.reshape(-1, x.shape[1])[: bg.n_nodes].astype(x.dtype)


def _bcsr_kernel(off_ref, cnt_ref, col_ref, tile_ref, x_ref, out_ref,
                 *, precision):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < cnt_ref[i])
    def _():
        acc = jax.lax.dot_general(
            tile_ref[0], x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        out_ref[:] += acc.astype(out_ref.dtype)


def _bcsr_unrolled_kernel(off_ref, cnt_ref, col_ref, *refs, mt,
                          precision):
    """Unrolled grid (row_blocks,): each row block's whole tile span in
    one grid step — at F=128 the per-slot blocks are 64 KB, so the 2-D
    grid is bound by per-step fixed cost (index maps, DMA descriptors),
    not bytes; collapsing the slot dimension deletes most of it."""
    i = pl.program_id(0)
    tile_refs = list(refs[:mt])
    x_refs = list(refs[mt:2 * mt])
    out_ref = refs[2 * mt]

    out_ref[:] = jnp.zeros_like(out_ref)
    for k in range(mt):
        @pl.when(k < cnt_ref[i])
        def _(k=k):
            acc = jax.lax.dot_general(
                tile_refs[k][0], x_refs[k][:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)
            out_ref[:] += acc.astype(out_ref.dtype)


#: VMEM gate for the unrolled SpMM layout.
UNROLL_MAX_TILES = 8


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_node_pad",
                                             "max_tiles"))
def _bcsr_pallas(tiles, col_ids, tile_off, tile_cnt, x, n_nodes,
                 n_node_pad, max_tiles):
    f = x.shape[1]
    n_rb = n_node_pad // ROW_BLOCK
    t_pad = tiles.shape[0]
    xp = _pad_rows(x, n_node_pad)
    tiles = tiles.astype(x.dtype)
    unrolled = (max_tiles <= UNROLL_MAX_TILES
                and max_tiles * COL_BLOCK * f * x.dtype.itemsize
                <= 8 << 20)

    def tile_idx(i, jt, off, cnt):
        last = off[i] + jnp.maximum(cnt[i], 1) - 1
        return jnp.minimum(jnp.minimum(off[i] + jt, last), t_pad - 1)

    if unrolled:
        def tmap(k):
            return lambda i, off, cnt, col: (tile_idx(i, k, off, cnt),
                                             0, 0)

        def xmap(k):
            return lambda i, off, cnt, col: (
                col[tile_idx(i, k, off, cnt)], 0)

        in_specs = [pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tmap(k),
                                 memory_space=pltpu.VMEM)
                    for k in range(max_tiles)]
        in_specs += [pl.BlockSpec((COL_BLOCK, f), xmap(k),
                                  memory_space=pltpu.VMEM)
                     for k in range(max_tiles)]
        inputs = [tiles] * max_tiles + [xp] * max_tiles
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_rb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ROW_BLOCK, f),
                                   lambda i, off, cnt, col: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(_bcsr_unrolled_kernel, mt=max_tiles,
                                   precision=_precision(x.dtype))
    else:
        def tile_map(i, j, off, cnt, col):
            return (tile_idx(i, j, off, cnt), 0, 0)

        def x_map(i, j, off, cnt, col):
            return (col[tile_idx(i, j, off, cnt)], 0)

        inputs = [tiles, xp]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_rb, max_tiles),
            in_specs=[
                pl.BlockSpec((1, ROW_BLOCK, COL_BLOCK), tile_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((COL_BLOCK, f), x_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROW_BLOCK, f),
                                   lambda i, j, off, cnt, col: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(_bcsr_kernel,
                                   precision=_precision(x.dtype))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((n_node_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rb * max_tiles * ROW_BLOCK * COL_BLOCK * f,
            bytes_accessed=(t_pad * ROW_BLOCK * COL_BLOCK * 4
                            + t_pad * COL_BLOCK * f * 4
                            + n_node_pad * f * 4),
            transcendentals=0,
        ),
    )(tile_off, tile_cnt, col_ids, *inputs)
    return out[:n_nodes].astype(x.dtype)


def _bcsr_impl(bg: BCSRGraph, x: jax.Array) -> jax.Array:
    from . import _use_pallas
    if _use_pallas(x):
        return _bcsr_pallas(bg.tiles, bg.col_ids, bg.tile_off, bg.tile_cnt,
                            x, bg.n_nodes, bg.n_node_pad, bg.max_tiles)
    return _bcsr_xla(bg, x)


@jax.custom_vjp
def _bcsr_core(bg: BCSRGraph, bg_t: BCSRGraph, x: jax.Array) -> jax.Array:
    return _bcsr_impl(bg, x)


def _bcsr_fwd(bg, bg_t, x):
    return _bcsr_impl(bg, x), (bg, bg_t)


def _bcsr_bwd(res, g):
    bg, bg_t = res

    def zero_like_graph(b):
        # int leaves get float0 (zero-size); float leaves symbolic zeros
        # that XLA dead-code-eliminates (graphs are never diff targets).
        return jax.tree_util.tree_map(
            lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                       if jnp.issubdtype(a.dtype, jnp.integer)
                       else jnp.zeros_like(a)), b)

    dx = _bcsr_impl(bg_t, g)
    return (zero_like_graph(bg), zero_like_graph(bg_t), dx)


_bcsr_core.defvjp(_bcsr_fwd, _bcsr_bwd)


def bcsr_spmm(bg: BCSRGraph, x: jax.Array,
              bg_t: BCSRGraph | None = None) -> jax.Array:
    """out[r] = Σ w_sr · x[s] over the dense-tile layout.

    ``bg_t`` (Aᵀ tiles) drives the backward pass; omit it for symmetric
    adjacencies (GCN's D^-1/2(A+I)D^-1/2 is symmetric), where A == Aᵀ.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    out = _bcsr_core(bg, bg if bg_t is None else bg_t, x)
    return out[:, 0] if squeeze else out
