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


class ShardRule:
    """One sharding rule: regex over the param's 'a/b/c' path → spec.

    ``spec`` is a tuple of PartitionSpec entries (None or a mesh axis
    name); rules are tried in order and the first match wins.
    """

    def __init__(self, pattern: str, spec: Sequence[Optional[str]]):
        import re
        self.pattern = pattern
        self._re = re.compile(pattern)
        self.spec = tuple(spec)

    def matches(self, path: str) -> bool:
        return self._re.search(path) is not None


def param_shardings(mesh, params, rules: Sequence[ShardRule]):
    """Rule-based NamedSharding pytree builder.

    Every parameter must match a rule — an unmatched param raises instead
    of silently replicating (a silently replicated weight defeats TP
    without an error); add an explicit ``ShardRule(".*", ())`` tail when
    replicate-the-rest is intended. A matched spec whose rank exceeds the
    leaf's rank also raises.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        for rule in rules:
            if rule.matches(key):
                if len(rule.spec) > leaf.ndim:
                    raise ValueError(
                        f"rule {rule.pattern!r} spec {rule.spec} has more "
                        f"axes than param {key} of shape {leaf.shape}")
                shardings.append(NamedSharding(mesh, P(*rule.spec)))
                break
        else:
            raise ValueError(
                f"no sharding rule matches param {key!r} (shape "
                f"{leaf.shape}); add an explicit rule — params must not "
                f"silently replicate under tensor parallelism")
    return jax.tree_util.tree_unflatten(tree, shardings)


#: Model rule sets. Kernel convention: flax Dense kernels are [in, out];
#: the hidden/head dimension rides the "model" axis end-to-end — column-
#: shard the layer that produces it, row-shard the layer that consumes it
#: (GSPMD inserts the psum), replicate scalars/tiny leaves explicitly.

def gcn_rules() -> list:
    return [
        ShardRule(r"conv1/.*kernel", (None, "model")),
        ShardRule(r"conv1/bias", ("model",)),
        ShardRule(r"conv2/.*kernel", ("model", None)),
        ShardRule(r"conv2/bias", ()),
    ]


def gat_rules() -> list:
    """GAT: the projection's output dim is heads·hidden (head-major), so
    column-sharding it splits whole heads across "model"; the per-head
    attention vectors [heads, hidden] shard their head axis to match; the
    output layer consumes the concat → row-sharded."""
    return [
        ShardRule(r"attn1/linear/kernel", (None, "model")),
        ShardRule(r"attn1/attn_(src|dst)", ("model", None)),
        ShardRule(r"attn_out/linear/kernel", ("model", None)),
        ShardRule(r"attn_out/attn_(src|dst)", ()),
        ShardRule(r"attn_out/bias|attn1/bias", ()),
    ]


def han_rules() -> list:
    """HAN: each metapath GAT column-shards heads·hidden; the semantic
    attention and classifier consume it row-sharded."""
    return [
        ShardRule(r"gat_mp\d+/linear/kernel", (None, "model")),
        ShardRule(r"gat_mp\d+/attn_(src|dst)", ("model", None)),
        ShardRule(r"semantic/proj/kernel", ("model", None)),
        ShardRule(r"semantic/proj/bias", ()),
        ShardRule(r"semantic/q", ()),
        ShardRule(r"classify/kernel", ("model", None)),
        ShardRule(r"classify/bias", ()),
    ]


def gtn_rules() -> list:
    """GTN: the shared gcn_conv weight column-shards its hidden dim;
    linear1 consumes channels·hidden (channel-major — GSPMD reshards the
    interleave) row-sharded; the 1×1 GTConv mixing weights are tiny and
    replicated."""
    return [
        ShardRule(r"gcn_w/kernel", (None, "model")),
        ShardRule(r"gt\d+/conv\d+/weight", ()),
        ShardRule(r"linear1/kernel", ("model", None)),
        ShardRule(r"linear1/bias", ()),
        ShardRule(r"linear2/kernel", ()),
        ShardRule(r"linear2/bias", ()),
    ]


MODEL_RULES = {
    "gcn": gcn_rules,
    "gat": gat_rules,
    "han": han_rules,
    "gtn": gtn_rules,
}


def model_param_shardings(mesh, params, model: str):
    """Sharding pytree for a named model family (gcn/gat/han/gtn)."""
    return param_shardings(mesh, params, MODEL_RULES[model]())


def gcn_param_shardings(mesh, params: dict) -> dict:
    """Back-compat wrapper over the rule engine (tests, dryrun)."""
    return param_shardings(mesh, params, gcn_rules())


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
