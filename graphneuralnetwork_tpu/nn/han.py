"""HAN — Heterogeneous Attention Network.

Node-level attention = one GATConv per metapath adjacency; semantic-level
attention = project→tanh→softmax over metapaths→weighted sum, replicating
``SemanticAttention`` (HAN/models/SemanticAttention.py:5-20) and
``HANLayer``/``HANModel`` (HAN/models/HAN.py:7-40). The metapath graphs are
pre-composed on host (core/hetero.py), e.g. PAP/PLP for ACM
(HAN/utils/data_utils.py:60,86-89).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.graph import Graph
from .conv import DenseGATConv, GATConv


class SemanticAttention(nn.Module):
    """β = softmax over metapaths of mean_n(q·tanh(W z + b)); out = Σ β z
    (HAN/models/SemanticAttention.py:5-20, hidden=128)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, z: jax.Array, mask=None) -> jax.Array:
        # z: [P, N, F] stacked per-metapath embeddings. ``mask`` (bool[N])
        # excludes padding rows from the β mean — needed when N is the
        # padded node count (HaloGraph multi-chip path).
        # Semantic attention runs in f32 regardless of the compute dtype:
        # P×N×H is small and the softmax is precision-sensitive.
        z = z.astype(jnp.float32)
        w = nn.Dense(self.hidden, name="proj")(z)          # [P, N, H]
        q = self.param("q", nn.initializers.glorot_uniform(),
                       (self.hidden, 1), jnp.float32)
        scores = jnp.tanh(w) @ q                           # [P, N, 1]
        if mask is not None:
            m = mask.astype(jnp.float32)[None, :, None]
            mean = (scores * m).sum(axis=1) / jnp.maximum(m.sum(axis=1),
                                                          1.0)
        else:
            mean = scores.mean(axis=1)
        beta = jax.nn.softmax(mean, axis=0)                 # [P, 1]
        return jnp.sum(beta[:, None, :] * z, axis=0)        # [N, F]


class HANLayer(nn.Module):
    """Per-metapath GAT (shared hyperparams) + semantic attention
    (HAN/models/HAN.py:7-27)."""

    num_metapaths: int
    features: int
    num_heads: int = 4
    dropout: float = 0.6
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None   # compute dtype; params stay f32

    @nn.compact
    def __call__(self, graphs: Sequence[Graph], x: jax.Array) -> jax.Array:
        assert len(graphs) == self.num_metapaths
        zs = []
        for p, g in enumerate(graphs):
            z = GATConv(self.features, num_heads=self.num_heads,
                        concat_heads=True, attn_dropout=self.dropout,
                        deterministic=self.deterministic, dtype=self.dtype,
                        name=f"gat_mp{p}")(g, x)
            zs.append(nn.elu(z))
        z = jnp.stack(zs, axis=0)  # [P, N, heads*F]
        # On padded node sets (HaloGraph), exclude padding rows from the
        # semantic-attention mean.
        mask = None
        g0 = graphs[0]
        if x.shape[0] > g0.n_nodes:
            mask = jnp.arange(x.shape[0]) < g0.n_nodes
        return SemanticAttention(name="semantic")(z, mask=mask)


class DenseHANLayer(nn.Module):
    """HANLayer over *dense* metapath sub-adjacencies [P, B, B] — the form
    HAN's node-minibatch mode feeds (each batch slices ``HG_adj[idx][:, idx]``,
    HAN/utils/data_utils.py:92-101). Node-level attention is DenseGATConv;
    semantic attention is shared with the sparse path."""

    num_metapaths: int
    features: int
    num_heads: int = 4
    dropout: float = 0.6
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, adjs: jax.Array, x: jax.Array) -> jax.Array:
        assert adjs.shape[0] == self.num_metapaths
        zs = []
        for p in range(self.num_metapaths):
            z = DenseGATConv(self.features, num_heads=self.num_heads,
                             concat_heads=True, attn_dropout=self.dropout,
                             deterministic=self.deterministic,
                             dtype=self.dtype, name=f"gat_mp{p}")(adjs[p], x)
            zs.append(nn.elu(z))
        z = jnp.stack(zs, axis=0)
        return SemanticAttention(name="semantic")(z)


class DenseHAN(nn.Module):
    """HAN over dense metapath adjacencies — the node-minibatch form
    (HAN/run.py batch mode; train_batch at HAN/train_utils/train_eval.py:29-96).
    Same architecture/hyperparameters as ``HAN``; input is [P, B, B] + [B, F].
    """

    num_metapaths: int
    num_classes: int
    hidden: int = 8
    num_heads: Sequence[int] = (4,)
    dropout: float = 0.6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, adjs: jax.Array, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        h = x
        for i, heads in enumerate(self.num_heads):
            h = DenseHANLayer(self.num_metapaths, self.hidden,
                              num_heads=heads, dropout=self.dropout,
                              deterministic=deterministic, dtype=self.dtype,
                              name=f"layer{i}")(adjs, h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(self.num_classes, dtype=self.dtype,
                       name="classify")(h)
        return out.astype(jnp.float32)


class HAN(nn.Module):
    """Stacked HANLayers + linear classifier (HAN/models/HAN.py:30-40;
    defaults heads=[4], hidden=8 per HAN/run.py:9-11)."""

    num_metapaths: int
    num_classes: int
    hidden: int = 8
    num_heads: Sequence[int] = (4,)
    dropout: float = 0.6
    dtype: Optional[jnp.dtype] = None   # compute dtype; params stay f32

    @nn.compact
    def __call__(self, graphs: Sequence[Graph], x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        h = x
        for i, heads in enumerate(self.num_heads):
            h = HANLayer(self.num_metapaths, self.hidden, num_heads=heads,
                         dropout=self.dropout, deterministic=deterministic,
                         dtype=self.dtype, name=f"layer{i}")(graphs, h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(self.num_classes, dtype=self.dtype,
                       name="classify")(h)
        return out.astype(jnp.float32)
