"""Rule-based tensor-parallel shardings: GAT/HAN/GTN parity + error paths.

Runs on the 8-device virtual CPU mesh (tests/conftest.py). Each parity
test compares loss+grads of the GSPMD-sharded run against single-device
execution — the same oracle as the GCN TP test (tests/test_parallel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphneuralnetwork_tpu.ops import set_ops_impl
from graphneuralnetwork_tpu.parallel import (
    ShardRule, apply_tp, make_tp_mesh, model_param_shardings,
    param_shardings, shard_rows)


def _need_devices(k=4):
    if len(jax.devices()) < k:
        pytest.skip(f"needs >= {k} devices")


def _assert_tp_matches(model_name, params, loss_fn, feats):
    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, jnp.asarray(feats))
    mesh = make_tp_mesh(len(jax.devices()) // 2, 2)
    shardings = model_param_shardings(mesh, params, model_name)
    p_tp = apply_tp(params, shardings)
    x_tp = shard_rows(feats, mesh)
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss_fn))(p_tp, x_tp)
    np.testing.assert_allclose(ref_loss, tp_loss, rtol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5),
        ref_grads, tp_grads)


@pytest.mark.heavy
def test_tp_gat_matches_single_device():
    _need_devices()
    from graphneuralnetwork_tpu.data import load_cora
    from graphneuralnetwork_tpu.nn import GAT

    data = load_cora(seed=0)
    # smaller synthetic for speed
    from graphneuralnetwork_tpu.data.planetoid import (
        synthetic_citation_graph)
    from graphneuralnetwork_tpu import build_graph
    from graphneuralnetwork_tpu.core.graph import (
        add_self_loops, sym_normalize_weights, symmetrize)
    feats, labels, s, r = synthetic_citation_graph(
        n_nodes=256, n_feats=64, n_classes=4, seed=0)
    n = feats.shape[0]
    s, r = symmetrize(s, r)
    s, r = add_self_loops(s, r, n)
    graph = build_graph(s, r, n, sym_normalize_weights(s, r, n))
    model = GAT(hidden=8, num_heads=4, num_classes=4, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), graph,
                        jnp.asarray(feats))["params"]
    labels_j = jnp.asarray(labels)

    def loss_fn(p, x):
        logits = model.apply({"params": p}, graph, x)
        return -jax.nn.log_softmax(logits)[jnp.arange(n), labels_j].mean()

    set_ops_impl("xla")
    try:
        _assert_tp_matches("gat", params, loss_fn, feats)
    finally:
        set_ops_impl("auto")


def test_tp_han_matches_single_device():
    _need_devices()
    from graphneuralnetwork_tpu.data import load_acm_han
    from graphneuralnetwork_tpu.nn import HAN

    data = load_acm_han(seed=0)
    model = HAN(num_metapaths=len(data.graphs), num_classes=3, hidden=8,
                num_heads=(4,))
    params = model.init(jax.random.PRNGKey(0), data.graphs,
                        data.features)["params"]
    tr = data.train_idx

    def loss_fn(p, x):
        logits = model.apply({"params": p}, data.graphs, x)
        sel = logits[tr]
        return -jax.nn.log_softmax(sel)[
            jnp.arange(sel.shape[0]), data.labels[tr]].mean()

    set_ops_impl("xla")
    try:
        _assert_tp_matches("han", params, loss_fn,
                           np.asarray(data.features))
    finally:
        set_ops_impl("auto")


@pytest.mark.heavy
def test_tp_gtn_matches_single_device():
    _need_devices()
    from graphneuralnetwork_tpu.data import load_acm_gtn
    from graphneuralnetwork_tpu.nn import GTN

    data = load_acm_gtn(seed=0)
    model = GTN(num_classes=3, channels=2, num_layers=2, hidden=16)
    params = model.init(jax.random.PRNGKey(0), data.adj,
                        data.features)["params"]
    tr = data.train_idx
    tgt = data.target_idx

    def loss_fn(p, x):
        logits = model.apply({"params": p}, data.adj, x)
        sel = logits[tgt][tr]
        return -jax.nn.log_softmax(sel)[
            jnp.arange(sel.shape[0]), data.labels[tr]].mean()

    set_ops_impl("xla")
    try:
        _assert_tp_matches("gtn", params, loss_fn,
                           np.asarray(data.features))
    finally:
        set_ops_impl("auto")


def test_unmatched_param_raises():
    """A param no rule covers must error, not silently replicate."""
    _need_devices(2)
    mesh = make_tp_mesh(len(jax.devices()), 1)
    params = {"conv1": {"linear": {"kernel": jnp.zeros((4, 4))}},
              "mystery": {"kernel": jnp.zeros((4, 4))}}
    from graphneuralnetwork_tpu.parallel.tp import gcn_rules
    with pytest.raises(ValueError, match="no sharding rule matches"):
        param_shardings(mesh, params, gcn_rules())


def test_rule_rank_mismatch_raises():
    _need_devices(2)
    mesh = make_tp_mesh(len(jax.devices()), 1)
    params = {"w": jnp.zeros((4,))}
    with pytest.raises(ValueError, match="more axes"):
        param_shardings(mesh, params,
                        [ShardRule(r"w", (None, "model"))])


def test_explicit_replicate_tail_rule():
    _need_devices(2)
    mesh = make_tp_mesh(len(jax.devices()), 1)
    params = {"a": jnp.zeros((4, 4)), "b": jnp.zeros((2,))}
    sh = param_shardings(mesh, params, [ShardRule(r".*", ())])
    assert all(s.spec == () or len(s.spec) == 0
               for s in jax.tree_util.tree_leaves(sh))
