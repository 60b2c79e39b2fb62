import numpy as np
import pytest

from graphneuralnetwork_tpu.sampling import (
    Node2VecWalker,
    NegativeSampler,
    batchify,
    build_alias_table,
    centers_and_contexts,
    csr_from_edges,
    metapath_walks,
    multihop_sampling,
    sample_alias,
    skipgram_dataset,
    subsample,
    uniform_walks,
    weighted_walks,
)


@pytest.fixture
def ring_graph():
    """Cycle of 20 nodes (deterministic degrees)."""
    n = 20
    s = np.concatenate([np.arange(n), np.arange(n)])
    r = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    return csr_from_edges(s, r, n), n


def test_alias_table_distribution():
    rng = np.random.default_rng(0)
    probs = np.array([0.1, 0.2, 0.3, 0.4])
    accept, alias = build_alias_table(probs)
    draws = sample_alias(accept, alias, rng, 200_000)
    freq = np.bincount(draws, minlength=4) / 200_000
    np.testing.assert_allclose(freq, probs, atol=0.01)


def test_uniform_walks_follow_edges(ring_graph):
    (indptr, indices, _), n = ring_graph
    rng = np.random.default_rng(1)
    walks = uniform_walks(indptr, indices, np.arange(n), 10, rng)
    assert walks.shape == (n, 10)
    # each step moves to an adjacent ring node
    diff = (walks[:, 1:] - walks[:, :-1]) % n
    assert np.isin(diff, [1, n - 1]).all()


def test_weighted_walks_respect_zero_weight(ring_graph):
    (indptr, indices, w), n = ring_graph
    # kill all "backward" edges: only +1 steps remain
    src = np.repeat(np.arange(n), indptr[1:] - indptr[:-1])
    w2 = np.where((indices - src) % n == 1, 1.0, 0.0).astype(np.float32)
    rng = np.random.default_rng(2)
    walks = weighted_walks(indptr, indices, w2, np.arange(n), 8, rng)
    diff = (walks[:, 1:] - walks[:, :-1]) % n
    assert (diff == 1).all()


def test_node2vec_extremes_revisit_vs_explore(ring_graph):
    (indptr, indices, _), n = ring_graph
    rng = np.random.default_rng(3)
    # tiny p → return to previous node often
    w_ret = Node2VecWalker(indptr, indices, p=1e-4, q=1e4)
    walks = w_ret.walk(np.arange(n), 12, rng)
    backtracks = (walks[:, 2:] == walks[:, :-2]).mean()
    assert backtracks > 0.9


def test_metapath_walks_alternate_types():
    from graphneuralnetwork_tpu.core.hetero import HeteroGraph
    rng = np.random.default_rng(4)
    nu, ni = 10, 8
    u = rng.integers(0, nu, 50)
    i = rng.integers(0, ni, 50)
    hg = HeteroGraph({"u": nu, "i": ni})
    hg.add_relation(("u", "ui", "i"), u, i)
    hg.add_relation(("i", "iu", "u"), i, u)
    walks = metapath_walks(
        hg, [("u", "ui", "i"), ("i", "iu", "u")],
        np.arange(nu), 7, rng)
    # odd positions are items (< ni), even are users (< nu)
    assert (walks[:, 0::2] < nu).all()
    assert (walks[:, 1::2] < ni).all()


def test_multihop_sampling_shapes(ring_graph):
    (indptr, indices, _), n = ring_graph
    rng = np.random.default_rng(5)
    hops = multihop_sampling(np.arange(4), [3, 2], indptr, indices, rng)
    assert [len(h) for h in hops] == [4, 12, 24]
    # sampled neighbors really are neighbors on the ring
    src = np.repeat(hops[0], 3)
    assert np.isin((hops[1] - src) % n, [1, n - 1]).all()


def test_subsample_drops_frequent():
    # keep prob = sqrt(1e-4 / freq): corpus must be large enough that rare
    # tokens sit below the 1e-4 frequency threshold
    rng = np.random.default_rng(6)
    walks = np.concatenate(
        [np.zeros((3000, 10), np.int64),       # node 0: freq ≈ 1
         np.arange(1, 11)[None, :]])           # nodes 1..10: freq ≈ 3e-5
    out = subsample(walks, 11, rng)
    drop_rate_freq = (out[:3000] == -1).mean()
    drop_rate_rare = (out[3000:] == -1).mean()
    assert drop_rate_freq > 0.9
    assert drop_rate_rare < 0.2


def test_centers_and_contexts_window():
    rng = np.random.default_rng(7)
    walks = np.arange(6)[None, :].astype(np.int64)
    centers, contexts = centers_and_contexts(walks, window=2, rng=rng)
    assert len(centers) == 6
    for c, ctx in zip(centers, contexts):
        valid = ctx[ctx >= 0]
        assert np.abs(valid - c).max() <= 2
        assert (valid != c).all()


def test_negative_sampler_excludes():
    rng = np.random.default_rng(8)
    ns = NegativeSampler(np.ones(5))
    ex = np.full((1000, 1), 2)
    draws = ns.draw((1000, 1), rng, exclude=ex)
    assert (draws == 2).mean() < 0.05


def test_skipgram_dataset_shapes():
    rng = np.random.default_rng(9)
    walks = rng.integers(0, 30, (40, 10))
    c, cn, lab, mask = skipgram_dataset(
        walks, 30, window=3, num_negatives=2, rng=rng)
    assert cn.shape == lab.shape == mask.shape
    assert c.ndim == 1 and cn.shape[0] == c.shape[0]
    assert set(np.unique(lab)) <= {0.0, 1.0}
    # labels only where mask is on
    assert (lab[mask == 0] == 0).all()


def test_typed_negatives_alternate_types():
    """'ultra' negatives alternate user/item starting opposite the last
    context's type (get_negative_ultra, MetaPath2Vec/utils/data_utils.py:
    73-93)."""
    from graphneuralnetwork_tpu.sampling.skipgram import TypedNegativeSampler

    rng = np.random.default_rng(0)
    n_tokens = 20
    types = (np.arange(n_tokens) >= 12).astype(np.int64)  # 12 users, 8 items
    weights = np.ones(n_tokens)
    sampler = TypedNegativeSampler(weights, types)

    # row 0: last context is a user (type 0) → negatives start type 1
    # row 1: last context is an item (type 1) → negatives start type 0
    contexts = np.array([[3, 5, -1, -1],
                         [2, 14, -1, -1]], np.int64)
    negs = sampler.draw(contexts, num_negatives=2, rng=rng)
    # 2 contexts * 2 negs = 4 valid slots per row
    for row, start in ((0, 1), (1, 0)):
        valid = negs[row][negs[row] >= 0]
        assert len(valid) == 4
        got = types[valid]
        expect = [(start + j) % 2 for j in range(4)]
        assert got.tolist() == expect, (row, got, expect)
    # negatives never collide with the row's contexts
    for row in range(2):
        valid = negs[row][negs[row] >= 0]
        assert not set(valid.tolist()) & set(
            contexts[row][contexts[row] >= 0].tolist())


def test_skipgram_dataset_typed_path_runs():
    from graphneuralnetwork_tpu.sampling.skipgram import skipgram_dataset

    rng = np.random.default_rng(1)
    walks = rng.integers(0, 10, (30, 8))
    types = (np.arange(10) >= 6).astype(np.int64)
    centers, ctx_neg, labels, mask = skipgram_dataset(
        walks, 10, window=2, num_negatives=2, rng=rng,
        subsample_t=None, token_types=types)
    assert centers.ndim == 1 and ctx_neg.shape[0] == len(centers)
    assert ((labels == 0) | (labels == 1)).all()


def test_device_uniform_walks():
    """Device walks follow edges and stay rectangular; isolated nodes
    stay put (sampling/device_neighbor.py:device_uniform_walks)."""
    import jax
    from graphneuralnetwork_tpu.sampling import csr_from_edges
    from graphneuralnetwork_tpu.sampling.device_neighbor import (
        build_device_neighbor_table, device_uniform_walks)

    rng = np.random.default_rng(0)
    n = 30
    s = rng.integers(0, n - 1, 150)
    r = rng.integers(0, n - 1, 150)
    indptr, indices, _ = csr_from_edges(s, r, n)
    table, deg = build_device_neighbor_table(indptr, indices)

    starts = np.concatenate([np.arange(n - 1), [n - 1]])
    import jax.numpy as jnp
    walks = np.asarray(device_uniform_walks(
        jax.random.PRNGKey(0), jnp.asarray(starts, jnp.int32), 8, table,
        deg))
    assert walks.shape == (n, 8)
    assert (walks[:, 0] == starts).all()
    # every step is a real edge (or a self-stay on zero-degree nodes)
    adj = set(zip(s.tolist(), r.tolist()))
    for w in walks:
        for a, b in zip(w[:-1], w[1:]):
            if int(deg[a]) == 0:
                assert a == b
            else:
                assert (int(a), int(b)) in adj
    # isolated last node never moves
    assert (walks[-1] == n - 1).all()


def test_run_deepwalk_device_walks():
    from graphneuralnetwork_tpu.models.embedding import (
        WalkEmbedConfig, run_deepwalk)

    cfg = WalkEmbedConfig(num_walks=2, walk_length=6, embed_dim=16,
                          epochs=1, batch_size=64, device_walks=True,
                          subsample_t=None)
    emb, history = run_deepwalk(cfg=cfg)
    assert emb.shape[1] == 16
    assert np.isfinite(history[-1][1])


def test_device_node2vec_cdf_matches_theory():
    """The prebuilt per-edge CDF equals the host walker's biased
    transition distribution exactly (get_alias_edge semantics:
    Node2vec/utils/sample_utils.py:122-146)."""
    from graphneuralnetwork_tpu.sampling import csr_from_edges
    from graphneuralnetwork_tpu.sampling.device_walks import (
        build_node2vec_tables)

    # tiny graph with a return edge, a triangle closure and a far hop:
    # 0-1, 1-0, 1-2, 1-3, 0-2  (so from edge (0->1): 0 is return,
    # 2 closes a triangle, 3 is distance-2)
    s = np.array([0, 1, 1, 1, 0, 2, 3, 2])
    r = np.array([1, 0, 2, 3, 2, 1, 1, 0])
    p, q = 0.25, 2.0
    indptr, indices, w = csr_from_edges(s, r, 4)
    t = build_node2vec_tables(indptr, indices, p=p, q=q, weights=w)

    # edge (0 -> 1) is the slot of value 1 in row 0
    e01 = int(indptr[0]) + int(np.flatnonzero(
        indices[indptr[0]:indptr[1]] == 1)[0])
    cum = np.asarray(t.edge_cum[e01])
    probs = np.diff(np.concatenate([[0.0], cum]))[: int(t.deg[1])]
    # neighbors of 1 in CSR order with theoretical biases
    nbrs = indices[indptr[1]:indptr[2]]
    expect = np.array([(1 / p) if x == 0 else
                       1.0 if x == 2 else     # 0->2 edge exists
                       (1 / q) for x in nbrs], np.float64)
    expect /= expect.sum()
    np.testing.assert_allclose(probs, expect, atol=1e-6)


def test_device_node2vec_walks_match_host_distribution():
    """Empirical (prev, cur, next) trigram frequencies of the device
    walker match the host Node2VecWalker on a small graph."""
    import jax
    import jax.numpy as jnp
    from graphneuralnetwork_tpu.sampling import csr_from_edges
    from graphneuralnetwork_tpu.sampling.device_walks import (
        build_node2vec_tables, device_node2vec_walks)
    from graphneuralnetwork_tpu.sampling.walks import Node2VecWalker

    rng = np.random.default_rng(0)
    n = 12
    s = rng.integers(0, n, 80)
    r = rng.integers(0, n, 80)
    keep = s != r
    s, r = s[keep], r[keep]
    # symmetrize so walks don't die
    s, r = np.concatenate([s, r]), np.concatenate([r, s])
    p, q = 0.25, 2.0
    indptr, indices, w = csr_from_edges(s, r, n)

    reps = 4000
    starts = np.tile(np.arange(n), reps)
    host = Node2VecWalker(indptr, indices, p=p, q=q, weights=w).walk(
        starts, 4, np.random.default_rng(1))
    t = build_node2vec_tables(indptr, indices, p=p, q=q, weights=w)
    dev = np.asarray(jax.jit(
        device_node2vec_walks, static_argnames=("length",))(
            jax.random.PRNGKey(1), jnp.asarray(starts), 4, t))

    assert dev.shape == host.shape
    # every device step follows a real edge
    adj = set(zip(s.tolist(), r.tolist()))
    for a, b in zip(dev[:, 1], dev[:, 2]):
        assert (int(a), int(b)) in adj

    def trigram_freq(walks):
        key = (walks[:, 0].astype(np.int64) * n + walks[:, 1]) * n \
            + walks[:, 2]
        return np.bincount(key, minlength=n ** 3) / len(key)

    f_host = trigram_freq(host)
    f_dev = trigram_freq(dev)
    # total-variation distance between the two trigram distributions;
    # the host-vs-host sampling-noise floor at these sizes is ~0.063
    # (measured), so 0.1 catches systematic bias without flaking
    tv = 0.5 * np.abs(f_host - f_dev).sum()
    assert tv < 0.1, tv


def test_device_metapath_walks_alternate_types():
    import jax
    import jax.numpy as jnp
    from graphneuralnetwork_tpu.core.hetero import HeteroGraph
    from graphneuralnetwork_tpu.sampling.device_walks import (
        build_metapath_tables, device_metapath_walks)

    rng = np.random.default_rng(0)
    nu, ni = 20, 15
    u = rng.integers(0, nu, 120)
    i = rng.integers(0, ni, 120)
    hg = HeteroGraph({"u": nu, "i": ni})
    hg.add_relation(("u", "ui", "i"), u, i)
    hg.add_relation(("i", "iu", "u"), i, u)
    metapath = [("u", "ui", "i"), ("i", "iu", "u")]

    legs = build_metapath_tables(hg, metapath)
    starts = np.tile(np.arange(nu), 50)
    walks = np.asarray(jax.jit(
        device_metapath_walks, static_argnames=("length",))(
            jax.random.PRNGKey(0), jnp.asarray(starts), 6, legs))
    assert walks.shape == (nu * 50, 6)
    # type alternation: even positions are users, odd are items — and
    # each hop follows a real relation edge
    ui = set(zip(u.tolist(), i.tolist()))
    iu = set(zip(i.tolist(), u.tolist()))
    deg_u = np.bincount(u, minlength=nu)
    for wk in walks[:300]:
        for pos in range(5):
            a, b = int(wk[pos]), int(wk[pos + 1])
            if pos % 2 == 0:
                if deg_u[a] == 0:
                    assert a == b     # dead end self-absorbs
                    break
                assert (a, b) in ui
            else:
                assert (a, b) in iu


def test_run_node2vec_and_metapath2vec_device_walks():
    from graphneuralnetwork_tpu.models.embedding import (
        WalkEmbedConfig, run_metapath2vec, run_node2vec)

    cfg = WalkEmbedConfig(num_walks=2, walk_length=6, embed_dim=16,
                          epochs=1, batch_size=64, device_walks=True,
                          subsample_t=None)
    emb, history = run_node2vec(cfg=cfg)
    assert emb.shape[1] == 16 and np.isfinite(history[-1][1])

    cfg2 = WalkEmbedConfig(num_walks=2, walk_length=6, embed_dim=16,
                           epochs=1, batch_size=64, device_walks=True,
                           window=2, num_negatives=2)
    emb2, history2 = run_metapath2vec(cfg=cfg2)
    assert emb2.shape[1] == 16 and np.isfinite(history2[-1][1])
