import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphneuralnetwork_tpu.core.graph import build_graph
from graphneuralnetwork_tpu.ops import (
    aggregate_edges,
    sddmm_dot,
    segment_max,
    segment_mean,
    segment_softmax,
    spmm,
    spmm_weighted,
)


def _dense(g):
    n = g.n_nodes
    a = np.zeros((n, n), np.float32)
    s = np.asarray(g.senders)[: g.n_edges]
    r = np.asarray(g.receivers)[: g.n_edges]
    w = np.asarray(g.edge_weight)[: g.n_edges]
    np.add.at(a, (r, s), w)
    return a


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(7)
    n, e = 60, 400
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    return build_graph(s, r, n, w)


def test_spmm_matches_dense(small_graph, rng):
    g = small_graph
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 16)).astype(np.float32))
    out = spmm(g, x)
    ref = _dense(g) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_spmm_grads_match_dense(small_graph, rng):
    g = small_graph
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 8)).astype(np.float32))

    def loss(w, xx):
        from graphneuralnetwork_tpu.ops.spmm import spmm_weighted
        return jnp.sum(jnp.tanh(spmm_weighted(g, w, xx)))

    gw, gx = jax.grad(loss, argnums=(0, 1))(g.edge_weight, x)
    # numeric check on a few coordinates
    eps = 1e-3
    w0 = np.asarray(g.edge_weight)
    for k in [0, 13, 200]:
        wp, wm = w0.copy(), w0.copy()
        wp[k] += eps
        wm[k] -= eps
        num = (loss(jnp.asarray(wp), x) - loss(jnp.asarray(wm), x)) / (2 * eps)
        np.testing.assert_allclose(float(gw[k]), float(num), atol=1e-2)
    x0 = np.asarray(x)
    for (i, j) in [(0, 0), (5, 3)]:
        xp, xm = x0.copy(), x0.copy()
        xp[i, j] += eps
        xm[i, j] -= eps
        num = (loss(g.edge_weight, jnp.asarray(xp))
               - loss(g.edge_weight, jnp.asarray(xm))) / (2 * eps)
        np.testing.assert_allclose(float(gx[i, j]), float(num), atol=1e-2)


def test_aggregate_edges_1d(small_graph):
    g = small_graph
    vals = np.zeros(g.n_edge_pad, np.float32)
    vals[: g.n_edges] = 1.0
    out = aggregate_edges(g, jnp.asarray(vals))
    ref = np.bincount(np.asarray(g.receivers)[: g.n_edges],
                      minlength=g.n_nodes).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_multihead_spmm_weighted(small_graph, rng):
    g = small_graph
    h, f = 4, 8
    x = jnp.asarray(rng.normal(size=(g.n_nodes, h, f)).astype(np.float32))
    alpha = jnp.asarray(
        rng.random((g.n_edge_pad, h)).astype(np.float32))
    alpha = jnp.where(g.edge_mask[:, None], alpha, 0.0)
    out = spmm_weighted(g, alpha, x)
    assert out.shape == (g.n_nodes, h, f)
    for head in range(h):
        a = np.zeros((g.n_nodes, g.n_nodes), np.float32)
        s = np.asarray(g.senders)[: g.n_edges]
        r = np.asarray(g.receivers)[: g.n_edges]
        np.add.at(a, (r, s), np.asarray(alpha)[: g.n_edges, head])
        ref = a @ np.asarray(x)[:, head, :]
        np.testing.assert_allclose(np.asarray(out)[:, head, :], ref,
                                   atol=1e-4)


def test_segment_softmax_matches_dense(small_graph, rng):
    g = small_graph
    scores = jnp.asarray(rng.normal(size=(g.n_edge_pad,)).astype(np.float32))
    alpha = segment_softmax(scores, g.receivers, g.n_nodes,
                            mask=g.edge_mask)
    a = np.asarray(alpha)
    r = np.asarray(g.receivers)[: g.n_edges]
    sc = np.asarray(scores)[: g.n_edges]
    for node in range(g.n_nodes):
        m = r == node
        if m.sum() == 0:
            continue
        ref = np.exp(sc[m] - sc[m].max())
        ref = ref / ref.sum()
        np.testing.assert_allclose(np.sort(a[: g.n_edges][m]),
                                   np.sort(ref), atol=1e-5)
    # padding edges get zero weight
    assert (a[g.n_edges:] == 0).all()


def test_segment_softmax_unstable_matches_reference_form(small_graph, rng):
    """stable=False reproduces exp(score)/sum — the reference's raw
    formulation (GAT/models/layers.py:108-122)."""
    g = small_graph
    scores = jnp.asarray(
        rng.normal(size=(g.n_edge_pad,)).astype(np.float32))
    a1 = segment_softmax(scores, g.receivers, g.n_nodes, mask=g.edge_mask,
                         stable=False)
    a2 = segment_softmax(scores, g.receivers, g.n_nodes, mask=g.edge_mask,
                         stable=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


def test_segment_mean_max(small_graph, rng):
    g = small_graph
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 5)).astype(np.float32))
    msgs = x[g.senders]
    mean = segment_mean(msgs, g.receivers, g.n_nodes, mask=g.edge_mask)
    mx = segment_max(msgs, g.receivers, g.n_nodes, mask=g.edge_mask)
    s = np.asarray(g.senders)[: g.n_edges]
    r = np.asarray(g.receivers)[: g.n_edges]
    xn = np.asarray(x)
    for node in range(g.n_nodes):
        m = r == node
        if m.sum() == 0:
            np.testing.assert_allclose(np.asarray(mean)[node], 0.0)
            continue
        np.testing.assert_allclose(np.asarray(mean)[node],
                                   xn[s[m]].mean(0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(mx)[node],
                                   xn[s[m]].max(0), atol=1e-5)


def test_sddmm_dot(small_graph, rng):
    g = small_graph
    a = jnp.asarray(rng.normal(size=(g.n_nodes, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(g.n_nodes, 6)).astype(np.float32))
    e = sddmm_dot(g.senders, g.receivers, a, b)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    ref = np.sum(np.asarray(a)[s] * np.asarray(b)[r], axis=-1)
    np.testing.assert_allclose(np.asarray(e), ref, atol=1e-5)


def test_edge_softmax_matches_segment_softmax(small_graph, rng):
    from graphneuralnetwork_tpu.ops import edge_softmax
    g = small_graph
    scores = jnp.asarray(
        rng.normal(size=(g.n_edge_pad, 4)).astype(np.float32))
    a1 = edge_softmax(g, scores)
    a2 = segment_softmax(scores, g.receivers, g.n_nodes, mask=g.edge_mask)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


def test_sddmm_additive_matches_naive():
    from graphneuralnetwork_tpu.ops.spmm import sddmm_additive

    rng = np.random.default_rng(3)
    n, e = 50, 200
    s = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    r = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    fs = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    out = sddmm_additive(s, r, fs, fr)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fs)[np.asarray(s)]
                               + np.asarray(fr)[np.asarray(r)], rtol=1e-6)
    # multi-head path
    fs2 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    fr2 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    out2 = sddmm_additive(s, r, fs2, fr2)
    np.testing.assert_allclose(np.asarray(out2),
                               np.asarray(fs2)[np.asarray(s)]
                               + np.asarray(fr2)[np.asarray(r)], rtol=1e-6)
