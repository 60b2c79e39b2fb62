"""Embedding models: SkipGram, LINE, SDNE, GATNE.

  * ``SkipGram`` — two embedding tables, batched center·context logits
    (DeepWalk/word2vec.py:12-17, MetaPath2Vec/models/SkipGram.py:6-21).
    Serves DeepWalk / Node2vec / Struc2Vec / MetaPath2Vec — they differ
    only in how walks are generated (sampling/walks.py).
  * ``LINE`` — 1st+2nd order proximity with three tables
    (GraphEmbedding/LINE/LINE.py:5-19).
  * ``SDNE`` — autoencoder over adjacency rows; β-weighted reconstruction
    (2nd order) + Laplacian trace penalty (1st order)
    (GraphEmbedding/SDNE/SDNE.py:4-30, train_eval.py:9-28).
  * ``GATNE`` — multiplex heterogeneous embedding with per-edge-type
    neighbor aggregation + type attention + base embedding; both
    transductive (GATNE-T) and inductive (GATNE-I)
    (GATNE/models/GATNE.py:7-75, GATNE_Pytorch/models/GATNE.py:6-127).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SkipGram(nn.Module):
    """logits[b, j] = center_emb[c_b] · context_emb[ctx_neg[b, j]]."""

    vocab_size: int
    embed_dim: int = 128

    def setup(self):
        init = nn.initializers.normal(0.01)
        self.center = self.param(
            "center", init, (self.vocab_size, self.embed_dim))
        self.context = self.param(
            "context", init, (self.vocab_size, self.embed_dim))

    def __call__(self, centers, ctx_neg):
        v = self.center[centers]               # [B, D]
        u = self.context[ctx_neg]              # [B, L, D]
        return jnp.einsum("bd,bld->bl", v, u)  # [B, L]

    def embedding(self):
        """Final node embedding = center table (DeepWalk/train_eval.py:74-87
        without the hard-coded .cuda())."""
        return self.center


class LINE(nn.Module):
    """Three tables (GraphEmbedding/LINE/LINE.py:5-19): ``vertex`` for both
    orders, ``context`` for 2nd-order contexts, and the 1st-order score is
    vertex·vertex. ``__call__`` returns (first_logits, second_logits) for a
    padded context/negative batch."""

    vocab_size: int
    embed_dim: int = 128

    def setup(self):
        init = nn.initializers.normal(0.01)
        self.vertex = self.param(
            "vertex", init, (self.vocab_size, self.embed_dim))
        self.context = self.param(
            "context", init, (self.vocab_size, self.embed_dim))

    def __call__(self, centers, ctx_neg):
        v = self.vertex[centers]
        u1 = self.vertex[ctx_neg]
        u2 = self.context[ctx_neg]
        first = jnp.einsum("bd,bld->bl", v, u1)
        second = jnp.einsum("bd,bld->bl", v, u2)
        return first, second

    def embedding(self):
        return self.vertex


class SDNE(nn.Module):
    """Encoder/decoder over dense adjacency rows
    (GraphEmbedding/SDNE/SDNE.py:4-30): hidden dims default [256, 128]
    (SDNE/run.py:7-9); returns (embedding Y, reconstruction X̂)."""

    n_nodes: int
    hidden_dims: Sequence[int] = (256, 128)

    @nn.compact
    def __call__(self, adj_rows: jax.Array):
        h = adj_rows
        for i, d in enumerate(self.hidden_dims):
            h = nn.sigmoid(nn.Dense(d, name=f"enc{i}")(h))
        y = h
        for i, d in enumerate(reversed(self.hidden_dims[:-1])):
            h = nn.sigmoid(nn.Dense(d, name=f"dec{i}")(h))
        x_hat = nn.sigmoid(nn.Dense(self.n_nodes, name="dec_out")(h))
        return y, x_hat


def sdne_loss_first(y: jax.Array, adj_rows: jax.Array,
                    batch_l: jax.Array, alpha: float) -> jax.Array:
    """α · 2 tr(Yᵀ L Y) on the batch sub-Laplacian
    (SDNE/train_eval.py:9-16)."""
    return alpha * 2.0 * jnp.trace(y.T @ batch_l @ y)


def sdne_loss_second(x_hat: jax.Array, adj_rows: jax.Array,
                     beta: float) -> jax.Array:
    """β-weighted masked reconstruction (SDNE/train_eval.py:19-28):
    B = 1 where A==0 else β."""
    b = jnp.where(adj_rows > 0, beta, 1.0)
    return jnp.sum(((x_hat - adj_rows) * b) ** 2)


class GATNE(nn.Module):
    """GATNE-T / GATNE-I (GATNE/models/GATNE.py:7-75).

    Inputs per batch: center node ids [B], edge-type ids [B], and per-type
    sampled neighbor ids [B, T, S] (neighbors of the center under each edge
    type, table built by the data pipeline as in
    GATNE/utils/data_utils.py:127-146).

    Per sample: U = stack over types t of mean(neigh_emb_t)  [T, De];
    m = tanh? no — reference: attention = softmax(w·tanh(W U)) over types,
    e = base_emb + α · Mᵀ (U[type] attention-combined), then trans W_out.
    Transductive: node embeddings are free tables; inductive: linear maps
    of raw features (einsum at GATNE/models/GATNE.py:56).
    """

    vocab_size: int
    num_edge_types: int
    embed_dim: int = 200          # GATNE/run.py dims 256 for amazon
    edge_embed_dim: int = 16
    attn_dim: int = 32
    inductive: bool = False
    feature_dim: Optional[int] = None
    # v2's agg_func switch (GATNE_Pytorch/models/GATNE.py:72-77): "mean"
    # (v1 semantics, GATNE/models/GATNE.py:50-55) or "sum".
    aggregator: str = "mean"

    def setup(self):
        init = nn.initializers.uniform(1.0)
        T, De, Da, D = (self.num_edge_types, self.edge_embed_dim,
                        self.attn_dim, self.embed_dim)
        if self.inductive:
            assert self.feature_dim is not None
            self.feat_base = nn.Dense(D, use_bias=False, name="feat_base")
            self.feat_edge = self.param(
                "feat_edge", nn.initializers.normal(0.02),
                (T, self.feature_dim, De))
        else:
            self.base = self.param(
                "base", nn.initializers.normal(0.5),
                (self.vocab_size, D))
            self.edge_emb = self.param(
                "edge", nn.initializers.normal(0.5),
                (self.vocab_size, T, De))
        self.w_att = self.param(
            "w_att", nn.initializers.normal(0.2), (T, De, Da))
        self.v_att = self.param(
            "v_att", nn.initializers.normal(0.2), (T, Da, 1))
        self.trans = self.param(
            "trans", nn.initializers.normal(0.2), (T, De, D))

    def _edge_embed(self, node_ids, features):
        if self.inductive:
            # [..., T, De] from raw features (GATNE.py:56 einsum)
            f = features[node_ids]
            return jnp.einsum("...f,tfd->...td", f, self.feat_edge)
        return self.edge_emb[node_ids]

    def __call__(self, centers, edge_type, neighbors,
                 features: Optional[jax.Array] = None):
        # neighbors: [B, T, S]; aggregate per type: mean of neighbor
        # edge-type-t embeddings (GATNE.py:50-55)
        neigh = self._edge_embed(neighbors, features)      # [B, T, S, T, De]
        # reference aggregates type-t neighbors with their type-t embedding:
        t_idx = jnp.arange(self.num_edge_types)
        neigh_t = neigh[:, t_idx, :, t_idx, :]             # [T, B, S, De]
        neigh_t = jnp.transpose(neigh_t, (1, 0, 2, 3))     # [B, T, S, De]
        if self.aggregator == "sum":
            u = neigh_t.sum(axis=2)                        # [B, T, De]
        elif self.aggregator == "mean":
            u = neigh_t.mean(axis=2)
        else:
            raise ValueError(
                f"aggregator must be 'mean' or 'sum', got "
                f"{self.aggregator!r}")

        # type attention (GATNE.py:64-71), parameters selected by edge_type
        w = self.w_att[edge_type]                          # [B, De, Da]
        v = self.v_att[edge_type]                          # [B, Da, 1]
        att = jnp.einsum("btd,bda->bta", u, w)
        att = jnp.tanh(att)
        att = jnp.einsum("bta,bao->bto", att, v)[..., 0]   # [B, T]
        att = jax.nn.softmax(att, axis=-1)
        mixed = jnp.einsum("bt,btd->bd", att, u)           # [B, De]

        trans = self.trans[edge_type]                      # [B, De, D]
        delta = jnp.einsum("bd,bdo->bo", mixed, trans)
        if self.inductive:
            base = self.feat_base(features[centers])
        else:
            base = self.base[centers]
        emb = base + delta
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    def context_embedding(self):
        """Context table for NSLoss (transductive: base table)."""
        return self.base if not self.inductive else None
