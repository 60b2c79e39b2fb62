"""Sampled mini-batch GraphSAGE (fanout form).

Re-design of GraphSAGE_Pytorch/models/{GraphSage,SageGCN,Aggregator}.py:
the host sampler (sampling/neighbor.py) emits per-hop flat node id arrays
([B], [B·f1], [B·f1·f2], ...); the model gathers their features and folds
hops inward (GraphSage.py:18-30). Static shapes throughout — each hop is a
fixed [prev · fanout, F] tensor, so one jitted step serves every batch.

Aggregators mean/sum/max reshape the hop to [prev, fanout, F] and reduce
axis 1 (NeighborAggregator, models/Aggregator.py:18-33 — with MAX actually
returning values, unlike the reference's argmax bug at
GraphSAGE/graph_utils.py:8). Combine sum/concat per SageGCN.py:30-36.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SageLayer(nn.Module):
    """One SAGE combine: self W + aggregated-neighbor W
    (SageGCN, GraphSAGE_Pytorch/models/SageGCN.py:7-40)."""

    features: int
    aggregator: str = "mean"      # mean | sum | max
    combine: str = "sum"          # sum | concat
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, self_feats: jax.Array, neigh_feats: jax.Array,
                 fanout: int) -> jax.Array:
        b = self_feats.shape[0]
        nb = neigh_feats.reshape(b, fanout, -1)
        if self.aggregator == "mean":
            agg = nb.mean(axis=1)
        elif self.aggregator == "sum":
            agg = nb.sum(axis=1)
        elif self.aggregator == "max":
            agg = nb.max(axis=1)
        else:
            raise ValueError(f"unknown aggregator {self.aggregator!r}")
        neigh = nn.Dense(self.features, use_bias=False, name="neighbor")(agg)
        self_h = nn.Dense(self.features, use_bias=False, name="self")(
            self_feats)
        out = (neigh + self_h if self.combine == "sum"
               else jnp.concatenate([self_h, neigh], axis=-1))
        if self.activation == "relu":
            out = nn.relu(out)
        return out


class SampledGraphSAGE(nn.Module):
    """Hop-folding forward (GraphSage.py:18-30): with L layers and hops
    h_0..h_L, layer l maps (h_k, h_{k+1}) → h'_k for k < L−l; after L
    layers only h'_0 ([B, out]) remains. The last layer has no activation
    (SageGCN.py:16 hidden vs out)."""

    dims: Sequence[int]           # per-layer output dims, e.g. (128, C)
    fanouts: Sequence[int]        # e.g. (10, 10); len == len(dims)
    aggregator: str = "mean"

    @nn.compact
    def __call__(self, hop_feats: Sequence[jax.Array]) -> jax.Array:
        L = len(self.dims)
        assert len(hop_feats) == L + 1
        hidden = list(hop_feats)
        for l in range(L):
            act = "relu" if l < L - 1 else None
            layer = SageLayer(self.dims[l], aggregator=self.aggregator,
                              activation=act, name=f"layer{l}")
            nxt = []
            for k in range(L - l):
                nxt.append(layer(hidden[k], hidden[k + 1],
                                 self.fanouts[k]))
            hidden = nxt
        return hidden[0]
