"""Segment reductions and segment softmax on padded edge lists (XLA path).

These are the TPU-native replacements for the reference's aggregation
primitives:

  * segment_sum/mean/max  — replaces ``Aggregator`` MEAN/MAX
    (GraphSAGE/graph_utils.py:4-11 — whose MAX is a bug returning argmax —
    and GraphSAGE_Pytorch/models/Aggregator.py:18-33).
  * segment_softmax       — replaces GAT's spmm-rowsum/divide trick
    (GAT/models/layers.py:112-122) and the dense ``-9e15`` mask softmax
    (GAT/models/layers.py:28-30).

All functions take static ``num_segments`` so shapes stay static under jit.
The Pallas fast path (ops/pallas) shares these signatures; this module is the
always-correct XLA fallback and the CPU test oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )


def segment_sum_unsorted(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, mask=None):
    """Mean over segments; padding handled via ``mask`` (bool per element)."""
    if mask is not None:
        bmask = mask.astype(data.dtype)
        data = data * bmask.reshape(bmask.shape + (1,) * (data.ndim - 1))
        counts = jax.ops.segment_sum(bmask, segment_ids, num_segments=num_segments,
                                     indices_are_sorted=True)
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(data.shape[0], dtype=data.dtype), segment_ids,
            num_segments=num_segments, indices_are_sorted=True)
    totals = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                                 indices_are_sorted=True)
    counts = jnp.maximum(counts, 1.0)
    return totals / counts.reshape(counts.shape + (1,) * (totals.ndim - 1))


def segment_max(data, segment_ids, num_segments: int, mask=None):
    """Max over segments (the *fixed* semantics of the reference's broken MAX
    aggregator, GraphSAGE/graph_utils.py:8). Empty segments yield 0."""
    if mask is not None:
        neg = jnp.finfo(data.dtype).min
        data = jnp.where(
            mask.reshape(mask.shape + (1,) * (data.ndim - 1)), data, neg)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=True)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_softmax(
    scores, segment_ids, num_segments: int,
    mask: Optional[jax.Array] = None,
    stable: bool = True,
):
    """Softmax of edge scores over incoming-edge segments.

    ``scores``: float[E, ...] (trailing dims e.g. heads), ``segment_ids``:
    int[E]. Padding edges must be excluded via ``mask``; they get weight 0.

    With ``stable=True`` subtracts the per-segment max (the fast path).
    With ``stable=False`` reproduces the reference's raw ``exp`` formulation
    (GAT/models/layers.py:108,112,122) for bit-level parity testing.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - 1))
        scores = jnp.where(m, scores, jnp.finfo(scores.dtype).min)
    if stable:
        seg_max = jax.ops.segment_max(
            scores, segment_ids, num_segments=num_segments,
            indices_are_sorted=True)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        scores = scores - seg_max[segment_ids]
    e = jnp.exp(scores)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - 1))
        e = jnp.where(m, e, 0.0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments,
                                indices_are_sorted=True)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, dtype=e.dtype))
    return e / denom[segment_ids]


def edge_softmax(graph, scores, mask=None, stable: bool = True):
    """Graph-aware segment softmax over incoming edges.

    Same semantics as ``segment_softmax`` but routed through the Pallas
    scatter-free kernels on TPU (segment-max kernel for the stabiliser +
    the aggregation kernel for the denominator), using the graph's
    precomputed chunk spans. ``scores``: [E_pad] or [E_pad, H].
    """
    from . import _use_pallas

    if mask is None:
        mask = graph.edge_mask
    if not _use_pallas(scores):
        return segment_softmax(scores, graph.receivers, graph.n_nodes,
                               mask=mask, stable=stable)

    from .aggregate import aggregate_edges
    from .pallas.segment_max_kernel import segment_max_pallas

    squeeze = scores.ndim == 1
    s2 = scores[:, None] if squeeze else scores
    m2 = mask[:, None] if squeeze else mask.reshape(
        mask.shape + (1,) * (s2.ndim - 1))
    neg = jnp.finfo(jnp.float32).min
    s2 = jnp.where(m2, s2.astype(jnp.float32), neg)
    if stable:
        # softmax is invariant to the subtracted constant — stop gradients
        # BEFORE the kernel so autodiff never differentiates pallas_call
        seg_max = segment_max_pallas(
            graph.chunk_off, graph.chunk_cnt,
            graph.receivers.reshape(-1, 1), jax.lax.stop_gradient(s2),
            graph.n_nodes, graph.max_chunks)
        seg_max = jnp.where(seg_max > neg / 2, seg_max, 0.0)
        s2 = s2 - seg_max[graph.receivers]
    e = jnp.where(m2, jnp.exp(s2), 0.0)
    denom = aggregate_edges(graph, e)
    denom = jnp.maximum(denom, 1e-16)
    alpha = e / denom[graph.receivers]
    alpha = alpha.astype(scores.dtype)
    return alpha[:, 0] if squeeze else alpha
