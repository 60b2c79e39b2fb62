"""Native C++ walk engine: build, correctness vs CSR, numpy-fallback."""

import numpy as np
import pytest

from graphneuralnetwork_tpu.sampling import csr_from_edges, native
from graphneuralnetwork_tpu.sampling import sample_neighbors, uniform_walks


@pytest.fixture(scope="module")
def csr(rng):
    n = 200
    s = rng.integers(0, n, 1500)
    r = rng.integers(0, n, 1500)
    return csr_from_edges(s, r, n), n


def test_native_builds():
    assert native.available(), "native walker failed to build"


def test_native_walks_follow_edges(csr, rng):
    (indptr, indices, _), n = csr
    starts = np.arange(n, dtype=np.int64)
    w = native.uniform_walks_native(indptr, indices, starts, 8, seed=7)
    assert w.shape == (n, 8)
    for i in range(n):
        for t in range(7):
            nb = indices[indptr[w[i, t]]:indptr[w[i, t] + 1]]
            assert (w[i, t + 1] in nb) or (len(nb) == 0
                                           and w[i, t + 1] == w[i, t])


def test_native_deterministic_per_seed(csr):
    (indptr, indices, _), n = csr
    starts = np.arange(n, dtype=np.int64)
    w1 = native.uniform_walks_native(indptr, indices, starts, 6, seed=3)
    w2 = native.uniform_walks_native(indptr, indices, starts, 6, seed=3)
    w3 = native.uniform_walks_native(indptr, indices, starts, 6, seed=4)
    np.testing.assert_array_equal(w1, w2)
    assert (w1 != w3).any()


def test_alias_walks_native_distribution(csr, rng):
    from graphneuralnetwork_tpu.sampling.alias import build_alias_table
    (indptr, indices, w), n = csr
    # per-node alias tables laid out on CSR edges
    accept = np.zeros(len(indices), np.float32)
    alias = np.zeros(len(indices), np.int32)
    for v in range(n):
        lo, hi = indptr[v], indptr[v + 1]
        if hi > lo:
            a, al = build_alias_table(np.ones(hi - lo))
            accept[lo:hi] = a
            alias[lo:hi] = al
    starts = np.repeat(np.arange(n, dtype=np.int64), 4)
    out = native.alias_walks_native(indptr, indices, accept, alias,
                                    starts, 6, seed=9)
    assert out.shape == (4 * n, 6)
    for i in range(0, len(out), 37):
        for t in range(5):
            nb = indices[indptr[out[i, t]]:indptr[out[i, t] + 1]]
            assert (out[i, t + 1] in nb) or (len(nb) == 0)


def test_python_wrappers_use_native(csr, rng):
    (indptr, indices, _), n = csr
    w = uniform_walks(indptr, indices, np.arange(n), 5, rng)
    assert w.shape == (n, 5)
    nb = sample_neighbors(np.arange(10), 4, indptr, indices, rng)
    assert nb.shape == (40,)

def test_struc2vec_native_matches_python():
    """Native OpenMP DTW distances match the numpy/Python fallback."""
    import numpy as np
    from graphneuralnetwork_tpu.sampling import csr_from_edges
    from graphneuralnetwork_tpu.sampling.native import (
        available, struc2vec_distances_native)
    from graphneuralnetwork_tpu.sampling.struc2vec import (
        degree_rings, dtw_distance)
    if not available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n, e = 60, 240
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    ss = np.concatenate([s, r])
    rr = np.concatenate([r, s])
    indptr, indices, _ = csr_from_edges(ss, rr, n)
    k_max = 3
    pu = rng.integers(0, n, 50).astype(np.int32)
    pv = rng.integers(0, n, 50).astype(np.int32)
    f, nl = struc2vec_distances_native(indptr, indices, n, k_max, pu, pv)
    rings = degree_rings(indptr, indices, n, k_max)
    for p in range(len(pu)):
        a, b = int(pu[p]), int(pv[p])
        kk = min(len(rings[a]), len(rings[b]), k_max + 1)
        assert nl[p] == kk, (p, nl[p], kk)
        acc = 0.0
        for k in range(kk):
            acc += dtw_distance(rings[a][k], rings[b][k])
            np.testing.assert_allclose(f[p, k], acc, rtol=1e-9)

def test_native_edgelist_parser_matches_python(tmp_path):
    """Numeric edgelists: native C++ parser produces the identical vocab
    and id arrays as the Python string path; non-numeric falls back."""
    import numpy as np
    import graphneuralnetwork_tpu.sampling.native as nat
    from graphneuralnetwork_tpu.data.edgelist import read_edgelist
    if not nat.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    p = tmp_path / "g.txt"
    lines = []
    for _ in range(500):
        a, b = rng.integers(0, 80, 2)
        lines.append(f"{a} {b} {rng.random():.4f}")
    lines.insert(3, "")          # blank line skipped
    lines.insert(7, "42")        # single-token line skipped
    p.write_text("\n".join(lines) + "\n")

    d_native = read_edgelist(str(p), weighted=True)
    orig = nat.parse_edgelist_native
    nat.parse_edgelist_native = lambda *a, **k: None
    try:
        d_py = read_edgelist(str(p), weighted=True)
    finally:
        nat.parse_edgelist_native = orig
    assert d_native.n_nodes == d_py.n_nodes
    np.testing.assert_array_equal(d_native.senders, d_py.senders)
    np.testing.assert_array_equal(d_native.receivers, d_py.receivers)
    np.testing.assert_allclose(d_native.weights, d_py.weights, rtol=1e-6)
    assert d_native.vocab.idx_to_token == d_py.vocab.idx_to_token

    # string tokens -> native returns None, Python path used, still works
    p2 = tmp_path / "s.txt"
    p2.write_text("alpha beta\nbeta gamma\nalpha gamma\n")
    assert nat.parse_edgelist_native(str(p2)) is None
    d = read_edgelist(str(p2))
    assert d.n_nodes == 4  # 3 tokens + <UNK>

    # leading zeros are non-canonical -> fallback, ids still consistent
    p3 = tmp_path / "z.txt"
    p3.write_text("01 2\n2 3\n")
    assert nat.parse_edgelist_native(str(p3)) is None


def test_native_graph_build_matches_numpy(rng):
    """Native graph compiler is byte-exact with the numpy build path."""
    from graphneuralnetwork_tpu.core import graph as G
    from graphneuralnetwork_tpu.sampling.native import build_graph_native
    n, e = 777, 20000  # above the native threshold, odd node count
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    from graphneuralnetwork_tpu.ops.pallas.spmm_kernel import (
        EDGE_CHUNK, ROW_BLOCK, compute_chunk_spans)
    e_pad = -(-e // EDGE_CHUNK) * EDGE_CHUNK
    built = build_graph_native(s, r, w, n, e_pad, ROW_BLOCK, EDGE_CHUNK)
    assert built is not None
    ns, nr, nw, noff, ncnt, nmax = built
    # numpy oracle (the pre-native build path)
    order = np.argsort(r, kind="stable")
    ps = np.zeros(e_pad, np.int32); pr = np.zeros(e_pad, np.int32)
    pw = np.zeros(e_pad, np.float32)
    ps[:e], pr[:e], pw[:e] = s[order], r[order], w[order]
    ps[e:] = n - 1; pr[e:] = n - 1
    lo, cnt, mx = compute_chunk_spans(pr, n)
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_array_equal(nr, pr)
    np.testing.assert_array_equal(nw, pw)
    np.testing.assert_array_equal(noff, lo)
    np.testing.assert_array_equal(ncnt, cnt)
    assert nmax == mx
    # and build_graph dispatches to it with identical results
    g_native = G.build_graph(s, r, n, w)
    assert np.array_equal(np.asarray(g_native.senders), ps)
    assert g_native.max_chunks == mx


def test_native_normalize_matches_numpy(rng):
    from graphneuralnetwork_tpu.sampling.native import (
        normalize_edge_weights_native)
    n, e = 500, 20000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    for mode in ("sym", "row"):
        got = normalize_edge_weights_native(s, r, w, n, mode)
        assert got is not None
        deg = np.zeros(n, np.float64)
        np.add.at(deg, r, w)
        if mode == "sym":
            dinv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
            want = (w * dinv[s] * dinv[r]).astype(np.float32)
        else:
            dinv = np.where(deg > 0, 1 / np.maximum(deg, 1e-12), 0)
            want = (w * dinv[r]).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
