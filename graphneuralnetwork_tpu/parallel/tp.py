"""Tensor-parallel (dp × tp) execution via GSPMD sharding annotations.

The reference has no tensor parallelism (SURVEY.md §2.3: TP ABSENT; the
optional TPU-native equivalent is sharding the feature dimension of the
dense weights). This module provides it the idiomatic JAX way: a 2-D
``Mesh`` ("data" × "model"), ``NamedSharding`` annotations on parameters
and node features, and XLA/GSPMD inserting the collectives —

  * W1 [F, H] column-sharded P(None, "model") → activations [N, H] sharded
    P("data", "model");
  * W2 [H, C] row-sharded P("model", None) → logits all-reduced over
    "model" by GSPMD;
  * node rows (features, aggregation output) sharded P("data").

This path uses the XLA ops implementation (`ops.set_ops_impl("xla")`):
gather + ``segment_sum`` partition cleanly under GSPMD, whereas the Pallas
kernel rides ``shard_map`` in the data-parallel-only configs
(parallel/sharded.py, parallel/halo.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def make_tp_mesh(n_data: int, n_model: int, devices=None):
    """2-D mesh: leading axis "data" (node/edge parallel, DCN-tolerant),
    trailing axis "model" (feature parallel — keep within a host's ICI)."""
    from .multihost import make_mesh
    return make_mesh(("data", "model"), shape=(n_data, n_model),
                     devices=devices)


def gcn_param_shardings(mesh, params: dict) -> dict:
    """NamedSharding pytree for a nn.models.GCN param dict: first conv
    kernel column-sharded over "model", second row-sharded (so the hidden
    dimension stays distributed end-to-end), biases sharded to match."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path: str, leaf) -> "P":
        if "conv1" in path and "kernel" in path:
            return P(None, "model")
        if "conv1" in path and "bias" in path:
            return P("model")
        if "conv2" in path and "kernel" in path:
            return P("model", None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.key) for p in path)
        out[key] = NamedSharding(mesh, spec_for(key, leaf))

    def build(p):
        flat2, tree = jax.tree_util.tree_flatten_with_path(p)
        shardings = [out["/".join(str(k.key) for k in path)]
                     for path, _ in flat2]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(p), shardings)

    return build(params)


def apply_tp(params: dict, shardings) -> dict:
    """device_put the params onto their tensor-parallel shardings."""
    import jax
    return jax.tree.map(jax.device_put, params, shardings)


def shard_rows(x, mesh, axis: str = "data"):
    """Shard a [N, ...] array's rows over the data axis (pad to divide)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape[axis]
    x = np.asarray(x)
    pad = (-x.shape[0]) % n_data
    if pad:
        x = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
