"""Multi-chip edge-partitioned graph execution (owner-computes).

The reference's only multi-device story is single-process
``nn.DataParallel`` (HAN/train_utils/train_eval.py:46) — replicate module,
scatter batch. The TPU-native design instead shards the *graph*:

  * nodes are sharded row-wise over the mesh axis (owner-computes);
  * each device owns exactly the edges whose **receiver** it owns, so the
    aggregation (segment-sum) is purely local;
  * sender features cross the mesh: v1 all-gathers node features over ICI
    (``jax.lax.all_gather`` tiled) before the local gather+aggregate; the
    halo-exchange (all-to-all of only boundary features, overlapped with
    local aggregation) is the planned fast path on the same layout.

``ShardedGraph`` mirrors ``core.graph.Graph`` per shard with stacked
[D, ...] arrays; ``ops.spmm``/``ops.aggregate_edges`` dispatch on it, so the
same flax models run unchanged on a mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import Graph
from ..ops.pallas.spmm_kernel import EDGE_CHUNK, ROW_BLOCK, compute_chunk_spans


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Edge-partitioned graph over a 1-D mesh axis.

    Stacked leaves have leading device dim D and are placed with sharding
    P(axis) so each device holds its own shard. Senders are GLOBAL node ids;
    receivers are LOCAL (0..nodes_per_shard).
    """

    senders: jax.Array         # int32[D, E_s] global ids
    receivers: jax.Array       # int32[D, E_s] local ids
    edge_weight: jax.Array     # f32[D, E_s]
    chunk_off: jax.Array       # int32[D, B_s]
    chunk_cnt: jax.Array       # int32[D, B_s]
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_node_pad: int = dataclasses.field(metadata=dict(static=True))
    nodes_per_shard: int = dataclasses.field(metadata=dict(static=True))
    max_chunks: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))

    @property
    def n_devices(self):
        return self.senders.shape[0]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def partition_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    mesh: Mesh,
    axis: str = "data",
) -> ShardedGraph:
    """Host-side partitioner: receiver-owner edge partition + per-shard
    receiver-sorted padding, placed on the mesh."""
    n_dev = mesh.shape[axis]
    senders = np.asarray(senders, np.int32).ravel()
    receivers = np.asarray(receivers, np.int32).ravel()
    if edge_weight is None:
        edge_weight = np.ones(len(senders), np.float32)
    edge_weight = np.asarray(edge_weight, np.float32).ravel()

    nps = _round_up(max(n_nodes, 1), ROW_BLOCK * n_dev) // n_dev
    n_node_pad = nps * n_dev

    shard_edges = []
    for d in range(n_dev):
        lo, hi = d * nps, (d + 1) * nps
        m = (receivers >= lo) & (receivers < hi)
        s, r, w = senders[m], receivers[m] - lo, edge_weight[m]
        order = np.argsort(r, kind="stable")
        shard_edges.append((s[order], r[order], w[order]))

    e_s = max(
        _round_up(max((len(s) for s, _, _ in shard_edges), default=1),
                  EDGE_CHUNK), EDGE_CHUNK)
    S = np.zeros((n_dev, e_s), np.int32)
    R = np.zeros((n_dev, e_s), np.int32)
    W = np.zeros((n_dev, e_s), np.float32)
    OFF, CNT = [], []
    max_chunks = 1
    for d, (s, r, w) in enumerate(shard_edges):
        k = len(s)
        S[d, :k] = s
        R[d, :k] = r
        W[d, :k] = w
        if k < e_s:  # padding: last local row, zero weight
            R[d, k:] = nps - 1
            S[d, k:] = 0
        lo_, cnt_, mc = compute_chunk_spans(R[d], nps)
        OFF.append(lo_)
        CNT.append(cnt_)
        max_chunks = max(max_chunks, mc)

    sh = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(jnp.asarray(a), sh)
    return ShardedGraph(
        senders=put(S), receivers=put(R), edge_weight=put(W),
        chunk_off=put(np.stack(OFF)), chunk_cnt=put(np.stack(CNT)),
        n_nodes=int(n_nodes), n_node_pad=int(n_node_pad),
        nodes_per_shard=int(nps), max_chunks=int(max_chunks), axis=axis,
        mesh=mesh,
    )


def shard_nodes(x: np.ndarray, sg: ShardedGraph) -> jax.Array:
    """Pad a [N, ...] node array to n_node_pad and shard row-wise."""
    mesh = sg.mesh
    x = np.asarray(x)
    pad = sg.n_node_pad - x.shape[0]
    if pad > 0:
        x = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    spec = P(sg.axis, *([None] * (x.ndim - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def spmm_sharded(sg: ShardedGraph, x: jax.Array) -> jax.Array:
    """out = Â @ x with x sharded P(axis) on rows; returns same sharding.

    Per device: all_gather x over ICI → local gather of global senders →
    local scatter-free aggregation into owned rows.
    """
    gathered_vals = _gather_edge_values(sg, x, sg.edge_weight)
    return aggregate_sharded(sg, gathered_vals)


def _gather_edge_values(sg: ShardedGraph, x, weights):
    @partial(
        jax.shard_map, mesh=sg.mesh,
        in_specs=(P(sg.axis), P(sg.axis), P(sg.axis)),
        out_specs=P(sg.axis),
    )
    def f(senders, w, x_local):
        senders, w = senders[0], w[0]
        x_full = jax.lax.all_gather(
            x_local, sg.axis, axis=0, tiled=True)
        vals = x_full[senders] * w[:, None].astype(x_local.dtype)
        return vals[None]

    return f(sg.senders, weights, x)


def aggregate_sharded(sg: ShardedGraph, edge_values) -> jax.Array:
    """Sum stacked per-edge values [D, E_s, F] into owned node rows."""
    from ..ops.aggregate import _aggregate_core

    @partial(
        jax.shard_map, mesh=sg.mesh,
        in_specs=(P(sg.axis), P(sg.axis), P(sg.axis), P(sg.axis)),
        out_specs=P(sg.axis),
    )
    def f(recv, off, cnt, vals):
        out = _aggregate_core(
            recv[0], vals[0], off[0], cnt[0],
            sg.nodes_per_shard, sg.max_chunks)
        return out

    return f(sg.receivers, sg.chunk_off, sg.chunk_cnt, edge_values)
