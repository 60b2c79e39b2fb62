"""The core aggregation primitive: sum per-edge values into receiver nodes.

``aggregate_edges(graph, values)`` computes ``out[r] = Σ_{e: recv_e = r}
values[e]`` for ``values`` of shape [E_pad, F]. Everything else — SpMM,
attention-weighted aggregation, SAGE sum/mean — is a cheap composition of a
gather and this primitive, so the Pallas scatter-free kernel is written once.

Backward is a pure gather: d values = g[receivers] (cf. the dense index
trick in SpecialSpmmFunction.backward, GAT/models/layers.py:54-64).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph


def _int_zero_grad(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _aggregate_core(receivers, values, chunk_off, chunk_cnt, n_out,
                    max_chunks):
    return _aggregate_impl(receivers, values, chunk_off, chunk_cnt, n_out,
                           max_chunks)


def _aggregate_impl(receivers, values, chunk_off, chunk_cnt, n_out,
                    max_chunks):
    from . import _use_pallas
    if _use_pallas(values):
        from .pallas.spmm_kernel import _spmm_pallas_call
        return _spmm_pallas_call(
            chunk_off, chunk_cnt, receivers.reshape(-1, 1), values, n_out,
            int(max_chunks))
    return jax.ops.segment_sum(values, receivers, num_segments=n_out,
                               indices_are_sorted=True)


def _aggregate_fwd(receivers, values, chunk_off, chunk_cnt, n_out,
                   max_chunks):
    out = _aggregate_impl(receivers, values, chunk_off, chunk_cnt, n_out,
                          max_chunks)
    return out, (receivers, chunk_off, chunk_cnt)


def _aggregate_bwd(n_out, max_chunks, res, g):
    receivers, chunk_off, chunk_cnt = res
    return (_int_zero_grad(receivers), g[receivers],
            _int_zero_grad(chunk_off), _int_zero_grad(chunk_cnt))


_aggregate_core.defvjp(_aggregate_fwd, _aggregate_bwd)


def aggregate_edges(graph: Graph, values: jax.Array) -> jax.Array:
    """Sum [E_pad, F] edge values into [n_nodes, F] receiver buckets.

    Padding edges must carry zero values (weighted paths do this for free;
    mask explicitly otherwise).
    """
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    out = _aggregate_core(graph.receivers, values, graph.chunk_off,
                          graph.chunk_cnt, graph.n_nodes, graph.max_chunks)
    return out[:, 0] if squeeze else out
