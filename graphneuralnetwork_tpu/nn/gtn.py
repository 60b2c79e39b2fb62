"""GTN — Graph Transformer Network (learned metapath composition).

Re-design of GTN/models/{GTConv,GTLayer,GTN}.py for the MXU:

  * ``GTConv``: softmax mixture over the stacked edge-type adjacency
    tensor A [T, N, N] → per-channel learned adjacency (GTConv.py:6-26).
  * ``GTLayer``: channel-wise composition H = Q1 @ Q2 via batched einsum
    (GTLayer.py:21-32's chained ``torch.bmm``) — dense matmul chains are
    exactly what the MXU eats; XLA fuses the softmax mixing into the
    matmuls, so no Pallas kernel is needed here (SURVEY.md §2.4 item 5).
  * Row normalisation D⁻¹H between layers (GTN.py:7-19,54-60) done with a
    masked row-sum instead of materialising a dense eye.
  * Per-channel GCN conv + channel concat + 2-layer head
    (GTN.py:49-52,78-86).

The reference's eval-time tuple-unpacking bug (train_eval.py:62 treats
``(y, Ws)`` as logits) is NOT replicated — __call__ returns logits only and
attention weights via ``return_weights=True``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _row_normalize(h: jax.Array, add_eye: bool = True) -> jax.Array:
    """D⁻¹(H [+ I]) per channel; h: [C, N, N] (GTN/models/GTN.py:7-19).
    Row sums accumulate in f32 even for bf16 adjacencies."""
    if add_eye:
        h = h + jnp.eye(h.shape[-1], dtype=h.dtype)[None]
    deg = jnp.sum(h.astype(jnp.float32), axis=-1, keepdims=True)
    return (h.astype(jnp.float32) / jnp.maximum(deg, 1e-12)).astype(h.dtype)


class GTConv(nn.Module):
    """Per-channel softmax-weighted sum over edge-type slices:
    out[c] = Σ_t softmax(w)[c, t] · A[t]  (GTN/models/GTConv.py:6-26).
    Mixing weights and softmax are f32; the mixed adjacency is returned in
    the input dtype so downstream compositions ride the MXU at that rate."""

    channels: int

    @nn.compact
    def __call__(self, a: jax.Array) -> jax.Array:
        # a: [T, N, N]
        t = a.shape[0]
        w = self.param("weight", nn.initializers.normal(0.1),
                       (self.channels, t), jnp.float32)
        mix = jax.nn.softmax(w, axis=-1).astype(a.dtype)
        return jnp.einsum("ct,tnm->cnm", mix, a,
                          preferred_element_type=jnp.float32).astype(a.dtype)


class GTLayer(nn.Module):
    """first=True: H = GTConv1(A) @ GTConv2(A); else: H_prev_norm @ GTConv(A)
    (GTN/models/GTLayer.py:7-32). Compositions accumulate in f32."""

    channels: int
    first: bool = True

    @nn.compact
    def __call__(self, a: jax.Array, h_prev: Optional[jax.Array] = None):
        if self.first:
            q1 = GTConv(self.channels, name="conv1")(a)
            q2 = GTConv(self.channels, name="conv2")(a)
            return jnp.einsum(
                "cnk,ckm->cnm", q1, q2,
                preferred_element_type=jnp.float32).astype(a.dtype)
        q = GTConv(self.channels, name="conv1")(a)
        return jnp.einsum(
            "cnk,ckm->cnm", _row_normalize(h_prev), q,
            preferred_element_type=jnp.float32).astype(a.dtype)


class GTN(nn.Module):
    """Full model (GTN/models/GTN.py:22-87): stacked GTLayers compose a
    [C, N, N] learned metapath adjacency; a shared-weight GCN conv runs per
    channel; channel outputs concat into a 2-layer classifier head.

    Defaults per GTN/run.py:13-25: channels=2, layers=2, hidden=64.
    """

    num_classes: int
    channels: int = 2
    num_layers: int = 2
    hidden: int = 64
    # Compute dtype for the dense N×N composition chains — the most
    # MXU-intensive op in the framework; bf16 runs them at native rate.
    # Softmax mixing and row normalisation stay f32 (tiny tensors, and the
    # adjacency compositions accumulate in f32 via preferred_element_type).
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, a: jax.Array, x: jax.Array,
                 *, deterministic: bool = True,
                 return_weights: bool = False):
        # a: [T, N, N] stacked edge-type adjacencies (+identity slice
        # appended by the loader, GTN/utils/data_utils.py:148)
        if self.dtype is not None:
            a = a.astype(self.dtype)
            x = x.astype(self.dtype)
        h = GTLayer(self.channels, first=True, name="gt0")(a)
        for i in range(1, self.num_layers):
            h = GTLayer(self.channels, first=False, name=f"gt{i}")(a, h)

        # per-channel GCN conv with SHARED weight (GTN.py:49-52,78-83):
        # gcn_conv(X, H_c) = norm(H_c)ᵀ... reference: norm(H,add=True) then
        # H_cᵀ? — GTN.py:49-52 does X@W then (norm-ed H)·(X@W).
        xw = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                      name="gcn_w")(x)
        hn = _row_normalize(h)                        # [C, N, N]
        z = jnp.einsum("cnm,mf->cnf", hn, xw,
                       preferred_element_type=jnp.float32)  # [C, N, hidden]
        z = nn.relu(z).astype(xw.dtype)
        z = jnp.transpose(z, (1, 0, 2)).reshape(x.shape[0], -1)  # concat

        out = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(z)
        out = nn.relu(out)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="linear2")(out)
        return ((logits.astype(jnp.float32), h) if return_weights
                else logits.astype(jnp.float32))
