import numpy as np
import jax.numpy as jnp
import pytest

from graphneuralnetwork_tpu.core.graph import (
    add_self_loops,
    build_graph,
    dense_adj,
    gcn_graph,
    row_normalize_features,
    row_normalize_weights,
    sym_normalize_weights,
    symmetrize,
)


def test_build_graph_padding_and_sorting(rng):
    s = rng.integers(0, 50, 123)
    r = rng.integers(0, 50, 123)
    g = build_graph(s, r, 50)
    assert g.n_edges == 123
    assert g.n_edge_pad % 512 == 0
    recv = np.asarray(g.receivers)[: g.n_edges]
    assert (np.diff(recv) >= 0).all()  # receiver-sorted
    w = np.asarray(g.edge_weight)
    assert (w[g.n_edges:] == 0).all()  # zero-weight padding


def test_symmetrize_unique():
    s = np.array([0, 1, 2, 0], dtype=np.int32)
    r = np.array([1, 0, 0, 1], dtype=np.int32)
    ss, rr = symmetrize(s, r)
    pairs = set(zip(ss.tolist(), rr.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (2, 0) in pairs and (0, 2) in pairs
    assert len(pairs) == len(ss)  # no duplicates


def test_sym_normalize_matches_dense(rng):
    """w must equal D^-1/2 (A+I) D^-1/2 entries (GCN/data_utils.py:54-60)."""
    n = 30
    s = rng.integers(0, n, 100)
    r = rng.integers(0, n, 100)
    ss, rr = symmetrize(s.astype(np.int32), r.astype(np.int32))
    ss, rr = add_self_loops(ss, rr, n)
    w = sym_normalize_weights(ss, rr, n)

    a = np.zeros((n, n))
    a[rr, ss] = 1.0
    deg = a.sum(1)
    dhalf = np.diag(1.0 / np.sqrt(deg))
    ref = dhalf @ a @ dhalf
    got = np.zeros((n, n))
    got[rr, ss] = w
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_row_normalize_weights(rng):
    n = 20
    s = rng.integers(0, n, 60).astype(np.int32)
    r = rng.integers(0, n, 60).astype(np.int32)
    # dedupe to make the dense comparison exact
    key = s * n + r
    _, idx = np.unique(key, return_index=True)
    s, r = s[idx], r[idx]
    w = row_normalize_weights(s, r, n)
    a = np.zeros((n, n))
    a[r, s] = 1.0
    deg = a.sum(1, keepdims=True)
    ref = np.divide(a, deg, out=np.zeros_like(a), where=deg > 0)
    got = np.zeros((n, n))
    got[r, s] = w
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_row_normalize_features():
    x = np.array([[1.0, 3.0], [0.0, 0.0], [2.0, 2.0]])
    out = row_normalize_features(x)
    np.testing.assert_allclose(out.sum(1), [1.0, 0.0, 1.0])


def test_dense_adj_roundtrip(rng):
    n = 17
    s = rng.integers(0, n, 40)
    r = rng.integers(0, n, 40)
    g = gcn_graph(s, r, n)
    a = np.asarray(dense_adj(g))
    assert a.shape == (n, n)
    # symmetric by construction
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    # rows of D^-1/2(A+I)D^-1/2 for an isolated node = 1 on the diagonal
    assert (np.diag(a) > 0).all()
