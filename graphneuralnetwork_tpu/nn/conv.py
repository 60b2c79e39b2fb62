"""Message-passing convolution layers (flax.linen).

TPU-native re-designs of the reference models' layers:

  * ``GCNConv``  — GCN/GCN.py:30-52 (dense X·W then spmm(adj,·) + bias).
  * ``GATConv``  — GAT/models/layers.py:6-40 (dense) and :70-131 (sparse
    SDDMM + segment-softmax + SpMM). Uses the additive-attention
    decomposition a·[Wh_i ‖ Wh_j] = a_src·Wh_i + a_dst·Wh_j, which avoids
    materialising the concatenated edge features the reference builds at
    GAT/models/layers.py:105 — same math, no E×2F tensor.
  * ``SAGEConv`` — GraphSAGE_Pytorch/models/SageGCN.py:7-40 +
    models/Aggregator.py:5-37 (mean/sum/max neighbor aggregation, sum or
    concat combine) in full-graph form; the sampled mini-batch form lives in
    nn/sage.py.

All layers take a static-shape ``Graph`` and node features ``x`` of shape
[N, F]; everything is jit-safe.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.graph import Graph
from ..ops import (
    aggregate_edges,
    edge_softmax,
    segment_max,
    segment_mean,
    segment_softmax,
)
from ..ops.spmm import spmm, spmm_weighted


class GCNConv(nn.Module):
    """out = spmm(Â, X·W) + b with Â the pre-normalised adjacency
    (weights built by core.graph.gcn_graph). Mirrors Graph_conv_layer
    (GCN/GCN.py:30-52).

    ``dtype`` sets the compute dtype (mixed precision): params stay f32,
    the dense matmul and the SpMM run in ``dtype`` (bf16 = native MXU rate,
    single-dot aggregation kernel) with f32 accumulation inside both.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable = nn.initializers.glorot_uniform()

    @nn.compact
    def __call__(self, graph: Graph, x: jax.Array) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        support = nn.Dense(
            self.features, use_bias=False, kernel_init=self.kernel_init,
            dtype=self.dtype, name="linear")(x)
        out = spmm(graph, support)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


class GATConv(nn.Module):
    """Multi-head graph attention over the edge list.

    Per head: e_ij = LeakyReLU(a_src·Wh_j + a_dst·Wh_i) for edge j→i,
    α = segment_softmax(e over incoming edges of i), out_i = Σ α_ij Wh_j.
    Equivalent to GAT/models/layers.py:94-131 without the E×2F concat.

    ``concat_heads=True`` concatenates head outputs (hidden layers),
    ``False`` averages them (output layer) — GAT/models/GAT.py:21-38.
    """

    features: int            # per-head output features
    num_heads: int = 8
    concat_heads: bool = True
    negative_slope: float = 0.2   # LeakyReLU alpha (GAT/run.py:8-9)
    attn_dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None   # compute dtype; params stay f32
    kernel_init: Callable = nn.initializers.glorot_uniform()

    @nn.compact
    def __call__(self, graph: Graph, x: jax.Array) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = nn.Dense(self.features * self.num_heads, use_bias=False,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name="linear")(x)
        h = h.reshape(x.shape[0], self.num_heads, self.features)

        a_src = self.param("attn_src", nn.initializers.glorot_uniform(),
                           (self.num_heads, self.features), jnp.float32)
        a_dst = self.param("attn_dst", nn.initializers.glorot_uniform(),
                           (self.num_heads, self.features), jnp.float32)
        # Per-node attention logits [N, H] — computed in f32 regardless of
        # compute dtype: softmax logits are precision-sensitive and this
        # tensor is F× smaller than the features.
        hf = h.astype(jnp.float32)
        f_src = jnp.einsum("nhf,hf->nh", hf, a_src)
        f_dst = jnp.einsum("nhf,hf->nh", hf, a_dst)

        if hasattr(graph, "bcsr"):
            # HybridGraph: softmax attention on the dense MXU tiles +
            # COO remainder — exact softmax over all edges, no per-edge
            # [E, H, F] tensor (ops/bcsr_attention.py).
            from ..ops.bcsr_attention import gat_tiled_attend
            dropping = self.attn_dropout > 0.0 and not self.deterministic
            out = gat_tiled_attend(
                graph, h, f_src, f_dst,
                negative_slope=self.negative_slope,
                attn_dropout=self.attn_dropout if dropping else 0.0,
                dropout_rng=(self.make_rng("dropout") if dropping
                             else None))
            if self.concat_heads:
                return out.reshape(x.shape[0],
                                   self.num_heads * self.features)
            return out.mean(axis=1)

        if hasattr(graph, "halo_size"):
            # HaloGraph: edge-partitioned multi-chip attention — the dense
            # projections above ran under GSPMD on row-sharded x; the
            # edge-wise part (one all_to_all + receiver-local softmax)
            # runs in shard_map (parallel/halo_attention.py).
            from ..parallel.halo_attention import gat_halo_attend
            dropping = self.attn_dropout > 0.0 and not self.deterministic
            out = gat_halo_attend(
                graph, h, f_src, f_dst,
                negative_slope=self.negative_slope,
                attn_dropout=self.attn_dropout if dropping else 0.0,
                dropout_rng=(self.make_rng("dropout") if dropping
                             else None))
            if self.concat_heads:
                return out
            return out.reshape(-1, self.num_heads, self.features).mean(1)

        # Edge scores [E, H]: sender contributes f_src, receiver f_dst.
        scores = f_src[graph.senders] + f_dst[graph.receivers]
        scores = nn.leaky_relu(scores, self.negative_slope)
        alpha = edge_softmax(graph, scores)
        alpha = alpha.astype(h.dtype)
        if self.attn_dropout > 0.0 and not self.deterministic:
            alpha = nn.Dropout(rate=self.attn_dropout, deterministic=False)(
                alpha)

        # Weighted aggregation of all heads in one kernel call: [N, H, F].
        out = spmm_weighted(graph, alpha, h)

        if self.concat_heads:
            return out.reshape(x.shape[0], self.num_heads * self.features)
        return out.mean(axis=1)


class DenseGATConv(nn.Module):
    """The reference GAT's *dense* attention path (GAT/models/layers.py:6-40):
    materialise the full [H, N, N] score matrix, mask non-edges to -9e15
    (:28-30), softmax over senders, then aggregate with a batched matmul
    (MXU). Useful when the (sub)graph is small and dense — e.g. HAN's
    node-minibatch mode, where each batch is a B×B sub-adjacency
    (HAN/utils/data_utils.py:92-101).

    ``adj`` is receiver-row convention: ``adj[i, j] != 0`` ⇔ edge j→i, the
    same orientation as the reference's ``torch.where(adj > 0, e, -9e15)``
    + ``attention @ h``. Parameter names match ``GATConv`` so weights are
    interchangeable between the sparse and dense paths (tested).
    """

    features: int
    num_heads: int = 8
    concat_heads: bool = True
    negative_slope: float = 0.2
    attn_dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable = nn.initializers.glorot_uniform()

    @nn.compact
    def __call__(self, adj: jax.Array, x: jax.Array) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        n = x.shape[0]
        h = nn.Dense(self.features * self.num_heads, use_bias=False,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name="linear")(x)
        h = h.reshape(n, self.num_heads, self.features)

        a_src = self.param("attn_src", nn.initializers.glorot_uniform(),
                           (self.num_heads, self.features), jnp.float32)
        a_dst = self.param("attn_dst", nn.initializers.glorot_uniform(),
                           (self.num_heads, self.features), jnp.float32)
        hf = h.astype(jnp.float32)
        f_src = jnp.einsum("nhf,hf->nh", hf, a_src)   # sender logit
        f_dst = jnp.einsum("nhf,hf->nh", hf, a_dst)   # receiver logit

        # e[h, i, j] = LeakyReLU(f_src[j] + f_dst[i]) for edge j→i.
        e = f_dst.T[:, :, None] + f_src.T[:, None, :]       # [H, N, N]
        e = nn.leaky_relu(e, self.negative_slope)
        mask = (adj != 0)[None, :, :]
        e = jnp.where(mask, e, -9e15)                        # :28-30
        alpha = jax.nn.softmax(e, axis=-1)
        if self.attn_dropout > 0.0 and not self.deterministic:
            alpha = nn.Dropout(rate=self.attn_dropout,
                               deterministic=False)(alpha)
        alpha = alpha.astype(h.dtype)
        out = jnp.einsum("hij,jhf->ihf", alpha, h)           # attention @ h
        if self.concat_heads:
            return out.reshape(n, self.num_heads * self.features)
        return out.mean(axis=1)


class SAGEConv(nn.Module):
    """GraphSAGE convolution (full-graph form).

    agg ∈ {mean, sum, max} over in-neighbors, combined with the self vector
    by ``sum`` (GraphSAGE_Pytorch/models/SageGCN.py:30-36, hidden layers) or
    ``concat`` (:33-35, final layer option).
    """

    features: int
    aggregator: str = "mean"     # 'mean' | 'sum' | 'max'
    combine: str = "sum"         # 'sum' | 'concat'
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None   # compute dtype; params stay f32
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph: Graph, x: jax.Array) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if (hasattr(graph, "halo_size") or hasattr(graph, "mesh")
                or hasattr(graph, "bcsr")):
            # Partitioned/tiled graphs: mean/sum ride the dispatching spmm
            # (weights are 1 on real edges, 0 on padding); max is
            # distributed on HaloGraph only.
            if self.aggregator == "sum":
                agg = spmm(graph, x)
            elif self.aggregator == "mean":
                ones = jnp.ones((x.shape[0], 1), x.dtype)
                counts = jnp.maximum(spmm(graph, ones), 1.0)
                agg = spmm(graph, x) / counts
            elif self.aggregator == "max" and hasattr(graph, "halo_size"):
                from ..parallel.halo import segment_max_halo
                agg = segment_max_halo(graph, x)
            elif self.aggregator == "max" and hasattr(graph, "bcsr"):
                from ..ops.bcsr_attention import hybrid_segment_max
                agg = hybrid_segment_max(graph, x)
            else:
                raise NotImplementedError(
                    f"{self.aggregator!r} aggregator is not supported on "
                    "this partitioned graph type")
        else:
            msgs = x[graph.senders]
            if self.aggregator == "mean":
                agg = segment_mean(msgs, graph.receivers, graph.n_nodes,
                                   mask=graph.edge_mask)
            elif self.aggregator == "sum":
                w = graph.edge_weight[:, None].astype(x.dtype)
                agg = aggregate_edges(graph, msgs * w)
            elif self.aggregator == "max":
                agg = segment_max(msgs, graph.receivers, graph.n_nodes,
                                  mask=graph.edge_mask)
            else:
                raise ValueError(f"unknown aggregator {self.aggregator!r}")

        neigh = nn.Dense(self.features, use_bias=self.use_bias,
                         dtype=self.dtype, name="neighbor")(agg)
        self_h = nn.Dense(self.features, use_bias=self.use_bias,
                          dtype=self.dtype, name="self")(x)
        if self.combine == "sum":
            out = neigh + self_h
        elif self.combine == "concat":
            out = jnp.concatenate([self_h, neigh], axis=-1)
        else:
            raise ValueError(f"unknown combine {self.combine!r}")
        if self.activation is not None:
            out = self.activation(out)
        return out
