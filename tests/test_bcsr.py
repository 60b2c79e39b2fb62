"""BCSR dense-tile SpMM: build, parity vs segment_sum, grads, reordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphneuralnetwork_tpu.core.bcsr import (
    COL_BLOCK, ROW_BLOCK, build_bcsr, build_bcsr_transpose)
from graphneuralnetwork_tpu.core.reorder import (
    bandwidth_stats, invert_permutation, rcm_order, relabel_edges)
from graphneuralnetwork_tpu.ops.bcsr_spmm import bcsr_spmm


def _random_graph(n=500, e=4000, seed=0, with_w=True):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32) if with_w else None
    return s, r, w


def _reference(s, r, w, x, n):
    w = np.ones(len(s), np.float32) if w is None else w
    gathered = x[s] * w[:, None]
    return jax.ops.segment_sum(jnp.asarray(gathered), jnp.asarray(r),
                               num_segments=n)


def test_bcsr_build_accumulates_duplicates():
    s = np.array([0, 0, 1], np.int32)
    r = np.array([2, 2, 3], np.int32)
    w = np.array([1.5, 2.0, 3.0], np.float32)
    bg = build_bcsr(s, r, 4, w)
    t = np.asarray(bg.tiles)
    assert t[0, 2, 0] == pytest.approx(3.5)    # duplicate edge summed
    assert t[0, 3, 1] == pytest.approx(3.0)
    assert bg.n_edges == 3


@pytest.mark.parametrize("n,e", [(500, 4000), (130, 1000), (1024, 8000)])
def test_bcsr_spmm_matches_segment_sum(n, e):
    s, r, w, = _random_graph(n, e)
    x = np.random.default_rng(1).normal(size=(n, 64)).astype(np.float32)
    bg = build_bcsr(s, r, n, w)
    ref = _reference(s, r, w, x, n)
    out = bcsr_spmm(bg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bcsr_spmm_bf16():
    s, r, w = _random_graph(300, 2000)
    x = np.random.default_rng(1).normal(size=(300, 32)).astype(np.float32)
    bg = build_bcsr(s, r, 300, w)
    out = bcsr_spmm(bg, jnp.asarray(x, jnp.bfloat16))
    ref = _reference(s, r, w, x, 300)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.1)
    assert out.dtype == jnp.bfloat16


def test_bcsr_grad_matches_transpose():
    """d/dx of Σ f(A x) must equal Aᵀ g — via the transpose tiles."""
    n, e = 200, 1500
    s, r, w = _random_graph(n, e, seed=3)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(n, 16)).astype(np.float32))
    bg = build_bcsr(s, r, n, w)
    bg_t = build_bcsr_transpose(s, r, n, w)

    c = jnp.asarray(
        np.random.default_rng(4).normal(size=(n, 16)).astype(np.float32))
    g = jax.grad(lambda xx: jnp.sum(bcsr_spmm(bg, xx, bg_t) * c))(x)

    # reference: autodiff through the dense formulation
    def ref_fn(xx):
        gathered = xx[jnp.asarray(s)] * jnp.asarray(w)[:, None]
        out = jax.ops.segment_sum(gathered, jnp.asarray(r),
                                  num_segments=n)
        return jnp.sum(out * c)

    g_ref = jax.grad(ref_fn)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)


def test_bcsr_symmetric_defaults_to_self_transpose():
    """GCN's sym-normalised adjacency is symmetric — bg_t omitted."""
    n = 150
    rng = np.random.default_rng(0)
    s = rng.integers(0, n, 800).astype(np.int32)
    r = rng.integers(0, n, 800).astype(np.int32)
    ss = np.concatenate([s, r])
    rr = np.concatenate([r, s])
    w = np.ones(len(ss), np.float32)
    bg = build_bcsr(ss, rr, n, w)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    g = jax.grad(lambda xx: jnp.sum(bcsr_spmm(bg, xx) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rcm_reduces_bandwidth_and_preserves_spmm():
    """RCM on a ring-of-cliques graph shrinks the band; relabelled SpMM
    equals the original after permuting in/out."""
    rng = np.random.default_rng(0)
    n, k = 512, 16                     # 32 cliques of 16, randomly labelled
    shuffle = rng.permutation(n)
    s, r = [], []
    for c in range(n // k):
        nodes = shuffle[c * k:(c + 1) * k]
        for i in range(k):
            for j in range(i + 1, k):
                s.append(nodes[i]); r.append(nodes[j])
        nxt = shuffle[((c + 1) % (n // k)) * k]
        s.append(nodes[0]); r.append(nxt)
    s = np.array(s + r, np.int32)      # symmetrise
    r = np.concatenate([r, s[: len(s) // 2]]).astype(np.int32)
    s, r = s[: len(r)], r

    perm = rcm_order(s, r, n)
    s2, r2 = relabel_edges(perm, s, r)
    before = bandwidth_stats(s, r)["p95"]
    after = bandwidth_stats(s2, r2)["p95"]
    assert after < before / 4          # locality restored

    x = rng.normal(size=(n, 8)).astype(np.float32)
    inv = invert_permutation(perm)
    bg2 = build_bcsr(s2, r2, n)
    out2 = np.asarray(bcsr_spmm(bg2, jnp.asarray(x[perm])))
    ref = np.asarray(_reference(s, r, None, x, n))
    np.testing.assert_allclose(out2[inv[np.arange(n)]], ref,
                               rtol=2e-5, atol=2e-5)

    # fewer tiles after reordering → smaller dense store
    bg1 = build_bcsr(s, r, n)
    assert bg2.n_tiles < bg1.n_tiles


def test_bcsr_fill_and_memory_helpers():
    from graphneuralnetwork_tpu.core.bcsr import bcsr_memory_bytes
    s, r, w = _random_graph(256, 2000)
    bg = build_bcsr(s, r, 256, w)
    assert 0 < bg.fill <= 1
    assert bcsr_memory_bytes(2000, s, r, 256) == \
        bg.n_tiles * ROW_BLOCK * COL_BLOCK * 4


def test_hybrid_split_and_parity():
    """Community graph + random stragglers: dense mass rides tiles, the
    rest stays COO; the sum matches plain segment_sum, grads too."""
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.ops import spmm

    rng = np.random.default_rng(0)
    n, comm = 1024, 128
    # strong communities (aligned order) + 10% random edges
    e = 40000
    s = rng.integers(0, n, e)
    base = (s // comm) * comm
    r = np.where(rng.random(e) < 0.9,
                 base + rng.integers(0, comm, e),
                 rng.integers(0, n, e)).astype(np.int64)
    keep = s != r
    s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
    w = rng.normal(size=len(s)).astype(np.float32)

    hg = build_hybrid(s, r, n, w, min_edges_per_tile=64)
    assert hg.bcsr.n_edges > 0 and hg.rem.n_edges > 0
    assert hg.n_edges == len(s)
    assert hg.tiled_fraction > 0.5

    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    out = spmm(hg, x)
    ref = _reference(s, r, w, np.asarray(x), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    c = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    gr = jax.grad(lambda xx: jnp.sum(spmm(hg, xx) * c))(x)

    def ref_fn(xx):
        gat = xx[jnp.asarray(s)] * jnp.asarray(w)[:, None]
        return jnp.sum(jax.ops.segment_sum(
            gat, jnp.asarray(r), num_segments=n) * c)

    g_ref = jax.grad(ref_fn)(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)


def test_bcsr_store_guard():
    """A random (locality-free) graph must refuse to densify."""
    rng = np.random.default_rng(0)
    n, e = 1 << 15, 1 << 17
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    with pytest.raises(ValueError, match="lacks block locality"):
        build_bcsr(s, r, n, max_bytes=64 << 20)


@pytest.mark.heavy
def test_gcn_trains_on_hybrid_layout():
    """load_cora(layout='hybrid') permutes nodes + splits consistently and
    the GCN trains to the same quality as on the COO layout."""
    import optax
    from graphneuralnetwork_tpu.data import load_cora
    from graphneuralnetwork_tpu.nn import GCN
    from graphneuralnetwork_tpu.train.scan_loop import (
        fit_node_classifier_scan)

    accs = {}
    for layout in ("coo", "hybrid"):
        data = load_cora(seed=0, layout=layout)
        model = GCN(hidden=16, num_classes=data.num_classes, dropout=0.0)
        res = fit_node_classifier_scan(
            model, data, epochs=100,
            optimizer=optax.adamw(2e-2, weight_decay=5e-4),
            epochs_per_call=50, patience_calls=3, seed=0)
        accs[layout] = res.test_acc
    assert accs["hybrid"] >= accs["coo"] - 0.03, accs
    assert accs["hybrid"] > 0.8


def test_sageconv_on_hybrid_graph():
    """SAGEConv mean/sum dispatch through the hybrid tiles and match the
    COO layer (unit edge weights)."""
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.core.graph import build_graph
    from graphneuralnetwork_tpu.nn.conv import SAGEConv

    rng = np.random.default_rng(0)
    n, comm, e = 512, 128, 16000
    s = rng.integers(0, n, e)
    r = np.where(rng.random(e) < 0.9,
                 (s // comm) * comm + rng.integers(0, comm, e),
                 rng.integers(0, n, e))
    keep = s != r
    s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
    x = rng.normal(size=(n, 12)).astype(np.float32)

    g1 = build_graph(s, r, n)
    hg = build_hybrid(s, r, n, min_edges_per_tile=64)
    for aggr in ("mean", "sum"):
        conv = SAGEConv(features=6, aggregator=aggr)
        params = conv.init(jax.random.PRNGKey(0), g1,
                           jnp.asarray(x))["params"]
        out1 = conv.apply({"params": params}, g1, jnp.asarray(x))
        out2 = conv.apply({"params": params}, hg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                                   atol=1e-4, rtol=1e-4, err_msg=aggr)
