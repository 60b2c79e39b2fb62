import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphneuralnetwork_tpu.core.graph import dense_adj, gcn_graph
from graphneuralnetwork_tpu.data import load_cora
from graphneuralnetwork_tpu.nn import GAT, GCN, GraphSAGE
from graphneuralnetwork_tpu.train import fit_node_classifier


@pytest.fixture(scope="module")
def cora():
    return load_cora(seed=0)


def test_gcn_forward_matches_dense_formula(cora):
    """Per-layer parity: GCNConv == Â·(X·W) + b with the dense Â
    (GCN/GCN.py:41-47)."""
    data = cora
    model = GCN(hidden=16, num_classes=data.num_classes)
    variables = model.init(jax.random.PRNGKey(0), data.graph, data.features)
    logits = model.apply(variables, data.graph, data.features)

    a = np.asarray(dense_adj(data.graph))
    x = np.asarray(data.features)
    p = variables["params"]
    w1 = np.asarray(p["conv1"]["linear"]["kernel"])
    b1 = np.asarray(p["conv1"]["bias"])
    w2 = np.asarray(p["conv2"]["linear"]["kernel"])
    b2 = np.asarray(p["conv2"]["bias"])
    h = a @ (x @ w1) + b1
    h = np.maximum(h, 0.0)
    ref = a @ (h @ w2) + b2
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


@pytest.mark.heavy
def test_gat_forward_shapes_and_softmax_rows(cora):
    data = cora
    model = GAT(hidden=4, num_heads=2, num_classes=data.num_classes)
    variables = model.init(jax.random.PRNGKey(0), data.graph, data.features)
    logits = model.apply(variables, data.graph, data.features)
    assert logits.shape == (data.features.shape[0], data.num_classes)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.heavy
def test_sage_forward(cora):
    data = cora
    model = GraphSAGE(hidden_dims=(32,), num_classes=data.num_classes)
    variables = model.init(jax.random.PRNGKey(0), data.graph, data.features)
    logits = model.apply(variables, data.graph, data.features)
    assert logits.shape == (data.features.shape[0], data.num_classes)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.heavy
def test_gcn_trains_on_synthetic_cora(cora):
    """End-to-end integration: GCN must learn the planted partition well
    above chance (SURVEY.md §4 integration oracle)."""
    data = cora
    model = GCN(hidden=32, num_classes=data.num_classes, dropout=0.3)
    res = fit_node_classifier(
        model, data, epochs=300,
        optimizer=optax.adamw(2e-2, weight_decay=5e-4),
        eval_every=20, patience=10, seed=0)
    # 7 classes → chance ≈ 0.14; planted partition should reach ≥0.5
    assert res.test_acc > 0.5, res
    assert res.best_val_loss < 1.5


def test_checkpoint_roundtrip(tmp_path, cora):
    import optax
    from graphneuralnetwork_tpu.train import (
        create_train_state, restore_checkpoint, save_checkpoint)
    data = cora
    model = GCN(hidden=8, num_classes=data.num_classes)
    state = create_train_state(model, data.graph, data.features,
                               jax.random.PRNGKey(0), optax.adam(1e-2))
    save_checkpoint(str(tmp_path), state, 42)
    state2, step = restore_checkpoint(str(tmp_path), state)
    assert step == 42
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 state.params, state2.params)


def test_restore_missing_checkpoint_raises(tmp_path, cora):
    import optax
    from graphneuralnetwork_tpu.train import (
        create_train_state, restore_checkpoint)
    data = cora
    model = GCN(hidden=8, num_classes=data.num_classes)
    state = create_train_state(model, data.graph, data.features,
                               jax.random.PRNGKey(0), optax.adam(1e-2))
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"), state)

@pytest.mark.heavy
def test_scan_fit_checkpoint_and_resume(tmp_path, cora):
    """--resume parity: a second fit with resume=True starts from the saved
    checkpoint (is_current_train, GTN/train_utils/train_eval.py:22-25)."""
    import optax
    from graphneuralnetwork_tpu.train.scan_loop import (
        fit_node_classifier_scan)
    data = cora
    model = GCN(hidden=8, num_classes=data.num_classes, dropout=0.0)
    ck = str(tmp_path / "ck")
    res1 = fit_node_classifier_scan(
        model, data, epochs=40, optimizer=optax.adam(1e-2),
        epochs_per_call=20, seed=0, checkpoint_dir=ck)
    import os
    assert os.path.exists(os.path.join(ck, "checkpoint.msgpack"))
    # resumed run must start at least as good as the saved best val loss
    res2 = fit_node_classifier_scan(
        model, data, epochs=20, optimizer=optax.adam(1e-2),
        epochs_per_call=20, seed=1, checkpoint_dir=ck, resume=True)
    assert res2.best_val_loss <= res1.best_val_loss * 1.5
    # fresh run from a different seed should NOT silently reuse the ckpt
    res3 = fit_node_classifier_scan(
        model, data, epochs=20, optimizer=optax.adam(1e-2),
        epochs_per_call=20, seed=2)
    assert res3.epochs_run == 20

@pytest.mark.heavy
def test_gcn_mixed_precision_close_and_trains(cora):
    """bf16 compute path: forward stays close to f32 and training still
    learns (f32 params, bf16 matmul/SpMM, f32 logits)."""
    import jax.numpy as jnp
    import optax
    data = cora
    m32 = GCN(hidden=16, num_classes=data.num_classes, dropout=0.0)
    mbf = GCN(hidden=16, num_classes=data.num_classes, dropout=0.0,
              dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), data.graph,
                      data.features)["params"]
    y32 = m32.apply({"params": params}, data.graph, data.features)
    ybf = mbf.apply({"params": params}, data.graph, data.features)
    assert ybf.dtype == jnp.float32
    denom = np.maximum(np.abs(np.asarray(y32)), 1e-2)
    rel = np.abs(np.asarray(ybf) - np.asarray(y32)) / denom
    assert np.median(rel) < 0.05, float(np.median(rel))

    res = fit_node_classifier(
        mbf, data, epochs=200, optimizer=optax.adamw(2e-2),
        eval_every=40, patience=5, seed=0)
    assert res.test_acc > 0.5, res


@pytest.mark.heavy
def test_dense_gat_model_matches_sparse_model(cora):
    """The dense GAT model (reference GAT/models/GAT.py:21-28) and the
    sparse SpGAT-equivalent share weights and must agree."""
    from graphneuralnetwork_tpu.core.graph import dense_adj
    from graphneuralnetwork_tpu.nn import GAT, DenseGAT

    data = cora
    sub_n = 120  # keep the N^2 path small
    s = np.asarray(data.graph.senders)[: data.graph.n_edges]
    r = np.asarray(data.graph.receivers)[: data.graph.n_edges]
    keep = (s < sub_n) & (r < sub_n)
    from graphneuralnetwork_tpu.core.graph import build_graph
    g = build_graph(s[keep], r[keep], sub_n)
    x = jnp.asarray(np.asarray(data.features)[:sub_n])
    adj = dense_adj(g)

    sparse = GAT(hidden=4, num_heads=2, num_classes=data.num_classes)
    dense = DenseGAT(hidden=4, num_heads=2, num_classes=data.num_classes)
    params = sparse.init(jax.random.PRNGKey(0), g, x)["params"]
    out_s = sparse.apply({"params": params}, g, x)
    out_d = dense.apply({"params": params}, adj, x)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.heavy
def test_sparse_gtn_matches_dense_gtn():
    """SparseGTN over a wedge plan == dense GTN with the SAME params
    (the parameter trees are name-compatible by construction)."""
    import jax
    import jax.numpy as jnp

    from graphneuralnetwork_tpu.nn import GTN
    from graphneuralnetwork_tpu.nn.gtn_sparse import (
        SparseGTN, build_gtn_plan, stacked_adj_to_sparse)

    rng = np.random.default_rng(0)
    n, T = 60, 4
    adj = np.zeros((T, n, n), np.float32)
    for t in range(T - 1):
        e = rng.integers(0, n, (2, 150))
        adj[t][e[0], e[1]] = 1.0
    adj[T - 1] = np.eye(n, dtype=np.float32)   # identity slice
    x = rng.normal(size=(n, 16)).astype(np.float32)

    dense = GTN(num_classes=3, channels=2, num_layers=2, hidden=8)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(adj),
                        jnp.asarray(x))["params"]

    plan = build_gtn_plan(stacked_adj_to_sparse(adj), n, num_layers=2)
    sparse = SparseGTN(num_classes=3, channels=2, num_layers=2, hidden=8)
    out_s = sparse.apply({"params": params}, plan, jnp.asarray(x))
    out_d = dense.apply({"params": params}, jnp.asarray(adj),
                        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=2e-4, rtol=2e-4)

    # gradients agree too (the wedge plan is fully differentiable)
    def loss_s(p):
        return jnp.sum(sparse.apply({"params": p}, plan,
                                    jnp.asarray(x)) ** 2)

    def loss_d(p):
        return jnp.sum(dense.apply({"params": p}, jnp.asarray(adj),
                                   jnp.asarray(x)) ** 2)

    gs = jax.grad(loss_s)(params)
    gd = jax.grad(loss_d)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=3e-3)


def test_sparse_gtn_plan_requires_identity_slice():
    """Without the identity edge type the D^-1(H+I) normalisation cannot
    match the dense GTN — the plan build must refuse, not silently
    diverge."""
    from graphneuralnetwork_tpu.nn.gtn_sparse import build_gtn_plan

    rng = np.random.default_rng(0)
    n = 40
    adjs = []
    for t in range(2):
        s = rng.integers(0, n, 100)
        r = rng.integers(0, n, 100)
        keep = s != r                      # no self loops anywhere
        adjs.append((s[keep], r[keep], np.ones(keep.sum(), np.float32)))
    with pytest.raises(ValueError, match="identity"):
        build_gtn_plan(adjs, n, num_layers=2)
