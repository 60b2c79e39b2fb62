"""Tiled attention on the hybrid BCSR layout: parity vs the COO path.

The COO oracle is the existing edge_softmax + spmm_weighted pipeline
(GAT/models/layers.py:94-131 semantics), already parity-tested against
the reference's dense formulation in tests/test_models.py.
"""

import flax.linen  # noqa: F401  (ensures flax is importable before nn)
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetwork_tpu as g
from graphneuralnetwork_tpu.core.bcsr import build_hybrid
from graphneuralnetwork_tpu.nn.conv import GATConv, SAGEConv
from graphneuralnetwork_tpu.ops import edge_softmax
from graphneuralnetwork_tpu.ops.bcsr_attention import (
    bcsr_neighbor_max, gat_tiled_attend, hybrid_segment_max)
from graphneuralnetwork_tpu.ops.spmm import spmm_weighted

pytestmark = pytest.mark.heavy  # full-lane only; fast lane = -m 'not heavy'


def _clustered_graph(n=640, comm=128, e=6000, inter=0.15, seed=0):
    """Community graph in cluster order → plenty of well-filled tiles."""
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e)
    base = (s // comm) * comm
    intra = rng.random(e) >= inter
    r = np.where(intra, base + rng.integers(0, comm, e),
                 rng.integers(0, n, e))
    keep = s != r
    return s[keep].astype(np.int32), r[keep].astype(np.int32)


def _attend_coo(gr, x, f_src, f_dst, slope):
    scores = f_src[gr.senders] + f_dst[gr.receivers]
    scores = jnp.where(scores > 0, scores, slope * scores)
    alpha = edge_softmax(gr, scores)
    return spmm_weighted(gr, alpha.astype(x.dtype), x)


@pytest.fixture(scope="module")
def fixture():
    s, r = _clustered_graph()
    n, heads, feat = 640, 4, 32
    hg = build_hybrid(s, r, n, min_edges_per_tile=64)
    gr = g.build_graph(s, r, n)
    assert hg.tiled_fraction > 0.5, "fixture must exercise the tile path"
    assert hg.rem.n_edges > 0, "fixture must exercise the remainder path"
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, heads, feat)).astype(np.float32))
    f_src = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    f_dst = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    return hg, gr, x, f_src, f_dst


def test_neighbor_max_matches_segment_max(fixture):
    hg, gr, x, f_src, _ = fixture
    got = hybrid_segment_max(hg, f_src)
    gathered = jnp.where(gr.edge_mask[:, None], f_src[gr.senders], -1e30)
    ref = jax.ops.segment_max(gathered, gr.receivers,
                              num_segments=gr.n_nodes,
                              indices_are_sorted=True)
    ref = jnp.where(jnp.isfinite(ref) & (ref > -1e29), ref, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_tiled_attend_matches_coo(fixture):
    hg, gr, x, f_src, f_dst = fixture
    out = gat_tiled_attend(hg, x, f_src, f_dst, negative_slope=0.2)
    ref = _attend_coo(gr, x, f_src, f_dst, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_tiled_attend_extreme_logits_stable(fixture):
    """The exact per-node max keeps huge logits finite (no inf/nan)."""
    hg, gr, x, f_src, f_dst = fixture
    out = gat_tiled_attend(hg, x, 50.0 * f_src, 50.0 * f_dst)
    ref = _attend_coo(gr, x, 50.0 * f_src, 50.0 * f_dst, 0.2)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_tiled_attend_grads_match_coo(fixture):
    hg, gr, x, f_src, f_dst = fixture
    c = jnp.asarray(np.random.default_rng(3).normal(
        size=x.shape).astype(np.float32))

    def loss_tiled(xx, fs, fd):
        return jnp.sum(gat_tiled_attend(hg, xx, fs, fd) * c)

    def loss_coo(xx, fs, fd):
        return jnp.sum(_attend_coo(gr, xx, fs, fd, 0.2) * c)

    gt = jax.grad(loss_tiled, argnums=(0, 1, 2))(x, f_src, f_dst)
    gc = jax.grad(loss_coo, argnums=(0, 1, 2))(x, f_src, f_dst)
    for a, b in zip(gt, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_gatconv_dispatches_on_hybrid(fixture):
    """GATConv(HybridGraph) == GATConv(Graph) with identical params."""
    hg, gr, x, _, _ = fixture
    feats = x.reshape(x.shape[0], -1)
    layer = GATConv(features=16, num_heads=4)
    params = layer.init(jax.random.PRNGKey(0), gr, feats)
    ref = layer.apply(params, gr, feats)
    out = layer.apply(params, hg, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_tiled_attention_dropout_statistics(fixture):
    """Dropout keeps the output an unbiased estimate: mean over many
    draws approaches the deterministic output; draws differ."""
    hg, gr, x, f_src, f_dst = fixture
    det = gat_tiled_attend(hg, x, f_src, f_dst)
    outs = []
    for i in range(24):
        outs.append(gat_tiled_attend(
            hg, x, f_src, f_dst, attn_dropout=0.4,
            dropout_rng=jax.random.PRNGKey(i)))
    outs = np.stack([np.asarray(o) for o in outs])
    assert not np.allclose(outs[0], outs[1])
    err_mean = np.abs(outs.mean(0) - np.asarray(det)).mean()
    err_single = np.abs(outs[0] - np.asarray(det)).mean()
    scale = np.abs(np.asarray(det)).mean()
    assert err_mean < 0.25 * scale, (err_mean, scale)
    # averaging draws converges toward the deterministic output
    assert err_mean < 0.5 * err_single, (err_mean, err_single)


def test_tiled_dropout_rate_on_tiles():
    """Per-head keep masks from the uint32 lattice hit the target rate
    and decorrelate across heads."""
    from graphneuralnetwork_tpu.ops.bcsr_attention import _head_keep
    bits = jax.random.bits(jax.random.PRNGKey(0), (200_000,), jnp.uint32)
    keep_prob = 0.6
    k0 = np.asarray(_head_keep(bits, 0, keep_prob))
    k1 = np.asarray(_head_keep(bits, 1, keep_prob))
    assert abs(k0.mean() - keep_prob) < 0.01
    assert abs(k1.mean() - keep_prob) < 0.01
    # decorrelated: joint rate ≈ product of marginals
    joint = (k0 & k1).mean()
    assert abs(joint - k0.mean() * k1.mean()) < 0.02
    # no head-count cap (ADVICE r3: a fixed 64-entry table raised at
    # h >= 64); large head indices draw a valid decorrelated stream
    k100 = np.asarray(_head_keep(bits, 100, keep_prob))
    assert abs(k100.mean() - keep_prob) < 0.01
    assert abs((k0 & k100).mean() - k0.mean() * k100.mean()) < 0.02


def test_gatconv_hybrid_trains_with_dropout(fixture):
    """A GATConv training step on the HybridGraph with attention dropout
    active (the reference GAT config trains at dropout 0.6) produces
    finite grads that differ between dropout draws."""
    import optax

    hg, gr, x, _, _ = fixture
    feats = x.reshape(x.shape[0], -1)
    layer = GATConv(features=8, num_heads=4, attn_dropout=0.6,
                    deterministic=False)
    params = layer.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, hg, feats)

    def loss(p, key):
        out = layer.apply(p, hg, feats, rngs={"dropout": key})
        return jnp.sum(out ** 2) * 1e-3

    g1 = jax.grad(loss)(params, jax.random.PRNGKey(2))
    g2 = jax.grad(loss)(params, jax.random.PRNGKey(3))
    l1 = jax.tree_util.tree_leaves(g1)
    assert all(bool(jnp.isfinite(a).all()) for a in l1)
    diffs = [float(jnp.abs(a - b).max())
             for a, b in zip(l1, jax.tree_util.tree_leaves(g2))]
    assert max(diffs) > 0.0  # different draws → different gradients

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    upd, _ = tx.update(g1, opt, params)
    new_params = optax.apply_updates(params, upd)
    assert all(bool(jnp.isfinite(a).all())
               for a in jax.tree_util.tree_leaves(new_params))


def test_sage_max_on_hybrid(fixture):
    hg, gr, x, _, _ = fixture
    feats = x.reshape(x.shape[0], -1)
    layer = SAGEConv(features=16, aggregator="max")
    params = layer.init(jax.random.PRNGKey(0), gr, feats)
    ref = layer.apply(params, gr, feats)
    out = layer.apply(params, hg, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_neighbor_max_empty_tiles():
    """A graph whose hybrid has zero dense tiles still works (all edges
    ride the remainder)."""
    s = np.array([0, 1, 2], np.int32)
    r = np.array([1, 2, 0], np.int32)
    hg = build_hybrid(s, r, 8, min_edges_per_tile=64)
    v = jnp.asarray(np.arange(16, dtype=np.float32).reshape(8, 2))
    out = hybrid_segment_max(hg, v)
    assert out.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(v)[0])
    np.testing.assert_allclose(np.asarray(out)[3], 0.0)
    nm = bcsr_neighbor_max(hg.bcsr, v)
    assert (np.asarray(nm) < -1e29).all()


def test_han_hybrid_layout_matches_coo():
    """HAN forward on hybrid-layout metapath graphs equals the COO layout
    (up to the clustering permutation) with identical params — the
    --layout hybrid CLI wiring (data/acm.py:_hybrid_metapath_graphs)."""
    from graphneuralnetwork_tpu.core.graph import row_normalize_features
    from graphneuralnetwork_tpu.data.acm import (
        _ACM_METAPATHS, _hybrid_metapath_graphs, synthetic_acm)
    from graphneuralnetwork_tpu.nn import HAN

    hg, feats, labels = synthetic_acm(seed=0)
    n = feats.shape[0]
    coo_graphs = [hg.metapath_graph(list(k)) for k in _ACM_METAPATHS]
    hyb_graphs, perm = _hybrid_metapath_graphs(hg, n, _ACM_METAPATHS, 16)
    assert any(float(jnp.sum(g.bcsr.tiles)) > 0 for g in hyb_graphs), \
        "expected some dense tiles on the clustered ACM metapaths"

    x = jnp.asarray(row_normalize_features(feats))
    model = HAN(num_metapaths=2, num_classes=3, hidden=8, num_heads=(2,))
    params = model.init(jax.random.PRNGKey(0), coo_graphs, x)["params"]
    out_coo = model.apply({"params": params}, coo_graphs, x)
    out_hyb = model.apply({"params": params}, hyb_graphs, x[perm])
    np.testing.assert_allclose(np.asarray(out_hyb),
                               np.asarray(out_coo)[perm],
                               atol=5e-5, rtol=1e-4)


def test_graphsage_full_model_hybrid_matches_coo(fixture):
    """Full-batch GraphSAGE on a HybridGraph equals the COO layout with
    identical params (the --model graphsage --layout hybrid CLI path)."""
    from graphneuralnetwork_tpu.nn import GraphSAGE

    hgr, gr = fixture[0], fixture[1]
    n = int(fixture[2].shape[0])
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(n, 16)).astype(np.float32))
    for agg in ("mean", "max"):
        model = GraphSAGE(hidden_dims=(8,), num_classes=3, aggregator=agg)
        params = model.init(jax.random.PRNGKey(1), gr, x)["params"]
        out_coo = model.apply({"params": params}, gr, x)
        out_hyb = model.apply({"params": params}, hgr, x)
        np.testing.assert_allclose(np.asarray(out_hyb),
                                   np.asarray(out_coo),
                                   atol=5e-5, rtol=1e-4)


def test_tiled_attend_bf16_grads_finite(fixture):
    """bf16 feature path: forward close to f32, grads finite and flowing
    (regression: f32 cotangents against a bf16 remainder numerator threw
    a dtype error in the fused VJP)."""
    hg, gr, x, f_src, f_dst = fixture
    xb = x.astype(jnp.bfloat16)

    def loss(xx, fs, fd):
        return jnp.sum(gat_tiled_attend(hg, xx, fs, fd)
                       .astype(jnp.float32) ** 2)

    g16 = jax.grad(loss, argnums=(0, 1, 2))(xb, f_src, f_dst)
    assert g16[0].dtype == jnp.bfloat16
    for a in g16:
        assert bool(jnp.isfinite(a.astype(jnp.float32)).all())
        assert float(jnp.abs(a.astype(jnp.float32)).max()) > 0.0
    out16 = gat_tiled_attend(hg, xb, f_src, f_dst)
    out32 = gat_tiled_attend(hg, x, f_src, f_dst)
    np.testing.assert_allclose(np.asarray(out16, dtype=np.float32),
                               np.asarray(out32), atol=0.06, rtol=0.06)


def test_hybrid_segment_max_grads_match_coo(fixture):
    """Max-pool gradients route to the argmax neighbors — parity with the
    plain segment_max path (exercises _rem_segment_max's custom VJP)."""
    from graphneuralnetwork_tpu.ops import segment_max

    hgr, gr = fixture[0], fixture[1]
    n = int(fixture[2].shape[0])
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(n, 8)).astype(np.float32))
    c = jnp.asarray(
        np.random.default_rng(8).normal(size=(n, 8)).astype(np.float32))

    def loss_h(xx):
        return jnp.sum(hybrid_segment_max(hgr, xx) * c)

    def loss_c(xx):
        return jnp.sum(segment_max(xx[gr.senders], gr.receivers, n,
                                   mask=gr.edge_mask) * c)

    gh = jax.grad(loss_h)(x)
    gc = jax.grad(loss_c)(x)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gc), atol=1e-5)
