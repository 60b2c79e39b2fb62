"""Centrality toolkit vs networkx oracles (Basis/networkx_study.py:11-31)."""

import numpy as np
import pytest

nx = pytest.importorskip("networkx")

from graphneuralnetwork_tpu import analysis as A  # noqa: E402
from graphneuralnetwork_tpu.core.graph import build_graph  # noqa: E402


def _basis_graph():
    src = [0, 1, 2, 3, 4, 4, 6, 7, 7, 9]
    dst = [1, 4, 4, 4, 6, 7, 5, 8, 9, 8]
    g = nx.Graph()
    g.add_edges_from(zip(src, dst))
    n = 10
    a = np.zeros((n, n), np.float32)
    a[src, dst] = 1.0
    a = np.maximum(a, a.T)
    return g, a


def _random_graph(rng, n=40, p=0.12):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 0.0)
    g = nx.from_numpy_array(a)
    return g, a


def _dictvals(d, n):
    return np.array([d[i] for i in range(n)])


@pytest.mark.parametrize("which", ["basis", "random"])
def test_centralities_match_networkx(which, rng):
    g, a = _basis_graph() if which == "basis" else _random_graph(rng)
    n = a.shape[0]

    np.testing.assert_allclose(
        np.asarray(A.degree_centrality(a)),
        _dictvals(nx.degree_centrality(g), n), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A.eigenvector_centrality(a)),
        _dictvals(nx.eigenvector_centrality(g, max_iter=1000, tol=1e-10), n),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(A.betweenness_centrality(a)),
        _dictvals(nx.betweenness_centrality(g), n), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(A.closeness_centrality(a)),
        _dictvals(nx.closeness_centrality(g), n), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A.pagerank(a)),
        _dictvals(nx.pagerank(g, tol=1e-12, max_iter=1000), n), atol=1e-6)
    hubs, auths = A.hits(a)
    nxh, nxa = nx.hits(g, tol=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(hubs), _dictvals(nxh, n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(auths), _dictvals(nxa, n),
                               atol=1e-4)


def test_unnormalized_betweenness(rng):
    g, a = _random_graph(rng, n=25)
    np.testing.assert_allclose(
        np.asarray(A.betweenness_centrality(a, normalized=False)),
        _dictvals(nx.betweenness_centrality(g, normalized=False),
                  a.shape[0]), atol=1e-5)


def test_components_and_diameter():
    g, a = _basis_graph()
    labels = np.asarray(A.connected_components(a))
    # Basis graph is connected: one component.
    assert (labels == 0).all()
    assert A.diameter(a) == nx.diameter(g)

    # Two components: nodes {0,1}, {2,3,4}.
    a2 = np.zeros((5, 5), np.float32)
    for i, j in [(0, 1), (2, 3), (3, 4)]:
        a2[i, j] = a2[j, i] = 1.0
    labels = np.asarray(A.connected_components(a2))
    assert labels.tolist() == [0, 0, 2, 2, 2]
    with pytest.raises(ValueError):
        A.diameter(a2)


def test_dense_adjacency_from_graph():
    src = np.array([0, 1, 2, 2], np.int32)
    dst = np.array([1, 2, 0, 3], np.int32)
    w = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    g = build_graph(src, dst, 4, edge_weight=w)
    a = np.asarray(A.to_dense_adjacency(g))
    expect = np.zeros((4, 4), np.float32)
    expect[src, dst] = w
    np.testing.assert_allclose(a, expect)


def test_basis_demo_runs():
    from graphneuralnetwork_tpu.analysis.demo import basis_demo
    out = basis_demo()
    assert out["diameter"] == 4
    assert len(out["pagerank"]) == 10
