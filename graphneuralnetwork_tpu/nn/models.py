"""Full node-classification models assembled from the conv layers.

Each mirrors a reference model's architecture and defaults:

  * ``GCN``  — 2-layer, ReLU + dropout between (GCN/GCN.py:5-27;
    hidden=128, dropout=0.5 per GCN/run.py:7-11).
  * ``GAT``  — dropout → multi-head attn (concat) → ELU → dropout →
    1-head attn output (GAT/models/GAT.py:6-18; hidden=8, heads=8,
    dropout=0.6, alpha=0.2 per GAT/run.py:8-9).
  * ``GraphSAGE`` — stacked SAGEConv with ReLU on hidden layers
    (GraphSAGE_Pytorch/models/GraphSage.py:5-33; dims [128, C]).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.graph import Graph
from .conv import GATConv, GCNConv, SAGEConv


class GCN(nn.Module):
    """``dtype=jnp.bfloat16`` runs the convs in mixed precision (f32 params,
    bf16 matmuls/SpMM with f32 accumulation); logits return as f32."""

    hidden: int = 128
    num_classes: int = 7
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, graph: Graph, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        h = GCNConv(self.hidden, dtype=self.dtype, name="conv1")(graph, x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = GCNConv(self.num_classes, dtype=self.dtype,
                      name="conv2")(graph, h)
        return out.astype(jnp.float32)


class GAT(nn.Module):
    hidden: int = 8
    num_classes: int = 7
    num_heads: int = 8
    dropout: float = 0.6
    negative_slope: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, graph: Graph, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        h = GATConv(self.hidden, num_heads=self.num_heads,
                    concat_heads=True,
                    negative_slope=self.negative_slope,
                    attn_dropout=self.dropout, dtype=self.dtype,
                    deterministic=deterministic, name="attn1")(graph, x)
        h = nn.elu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = GATConv(self.num_classes, num_heads=1, concat_heads=False,
                      negative_slope=self.negative_slope,
                      attn_dropout=self.dropout, dtype=self.dtype,
                      deterministic=deterministic, name="attn_out")(graph, h)
        return out.astype(jnp.float32)


class DenseGAT(nn.Module):
    """The reference's *dense* GAT model (GAT/models/GAT.py:21-28):
    identical stack to ``GAT`` but over the full [N, N] adjacency via
    DenseGATConv (N×N masked scores). Layer and parameter names match
    ``GAT``, so weights transfer between the sparse and dense models
    unchanged (tested)."""

    hidden: int = 8
    num_classes: int = 7
    num_heads: int = 8
    dropout: float = 0.6
    negative_slope: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, adj: jax.Array, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        from .conv import DenseGATConv

        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        h = DenseGATConv(self.hidden, num_heads=self.num_heads,
                         concat_heads=True,
                         negative_slope=self.negative_slope,
                         attn_dropout=self.dropout, dtype=self.dtype,
                         deterministic=deterministic, name="attn1")(adj, x)
        h = nn.elu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = DenseGATConv(self.num_classes, num_heads=1,
                           concat_heads=False,
                           negative_slope=self.negative_slope,
                           attn_dropout=self.dropout, dtype=self.dtype,
                           deterministic=deterministic,
                           name="attn_out")(adj, h)
        return out.astype(jnp.float32)


class GraphSAGE(nn.Module):
    """Full-graph GraphSAGE; hidden dims per
    GraphSAGE_Pytorch/run.py:10 ([128, C])."""

    hidden_dims: Sequence[int] = (128,)
    num_classes: int = 3
    aggregator: str = "mean"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, graph: Graph, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        h = x
        for i, d in enumerate(self.hidden_dims):
            h = SAGEConv(d, aggregator=self.aggregator, dtype=self.dtype,
                         activation=nn.relu, name=f"sage{i}")(graph, h)
        out = SAGEConv(self.num_classes, aggregator=self.aggregator,
                       dtype=self.dtype, name="sage_out")(graph, h)
        return out.astype(jnp.float32)
