"""Automatic layout selection (core/layout.py) + CLI layout validation.

The auto probe must pick hybrid on blocky graphs (community structure,
HAN metapath near-cliques) and COO on homophily citation synthetics —
the structure-dependence PERF_NOTES round 4 measured (3.5x vs +2.6%).
"""

import numpy as np
import pytest

from graphneuralnetwork_tpu.core.layout import choose_layout, probe_layout


def _community_graph(n=4096, e=65536, comm=256, seed=0):
    """Shuffled community graph (bench.py's generator, small shape)."""
    rng = np.random.default_rng(seed)
    shuffle = rng.permutation(n)
    s = rng.integers(0, n, e).astype(np.int64)
    intra = rng.random(e) < 0.9
    inv = np.empty(n, np.int64)
    inv[shuffle] = np.arange(n)
    base = (shuffle[s] // comm) * comm
    r = np.where(intra,
                 inv[np.minimum(base + rng.integers(0, comm, e), n - 1)],
                 rng.integers(0, n, e))
    keep = s != r
    return s[keep], r[keep], n


def test_auto_picks_hybrid_on_community_graph():
    s, r, n = _community_graph()
    layout, ratio, perm = choose_layout(s, r, n)
    assert layout == "hybrid", ratio
    assert ratio < 0.75
    # the returned perm is a valid node permutation (reusable for build)
    assert sorted(perm.tolist()) == list(range(n))


def test_auto_picks_coo_on_homophily_synthetic():
    from graphneuralnetwork_tpu.core.graph import (add_self_loops,
                                                   symmetrize)
    from graphneuralnetwork_tpu.data.planetoid import (
        synthetic_citation_graph)

    _, _, s, r = synthetic_citation_graph(
        n_nodes=2708, n_feats=16, n_classes=7, seed=0)
    s, r = symmetrize(s, r)
    s, r = add_self_loops(s, r, 2708)
    layout, ratio, _ = choose_layout(s, r, 2708)
    assert layout == "coo", ratio
    assert ratio > 0.75


def test_attention_objective_tiles_homophily_but_not_random():
    """GAT economics: COO attention is far costlier than COO SpMM, so
    the attention objective tiles graphs the SpMM rule leaves on COO
    (measured: 65k homophily trains GAT 2.2x faster on hybrid) while
    random graphs still stay COO."""
    from graphneuralnetwork_tpu.core.graph import (add_self_loops,
                                                   symmetrize)
    from graphneuralnetwork_tpu.data.planetoid import (
        synthetic_citation_graph)

    _, _, s, r = synthetic_citation_graph(
        n_nodes=2708, n_feats=16, n_classes=7, seed=0)
    s, r = symmetrize(s, r)
    s, r = add_self_loops(s, r, 2708)
    layout_sp, _, _ = choose_layout(s, r, 2708, objective="spmm")
    layout_at, _, _ = choose_layout(s, r, 2708, objective="attention")
    assert layout_sp == "coo"
    assert layout_at == "hybrid"

    rng = np.random.default_rng(0)
    n, e = 2048, 32768
    layout_rnd, _, _ = choose_layout(
        rng.integers(0, n, e), rng.integers(0, n, e), n,
        objective="attention")
    assert layout_rnd == "coo"


def test_auto_picks_coo_on_random_graph():
    rng = np.random.default_rng(0)
    n, e = 2048, 32768
    layout, ratio, _ = choose_layout(
        rng.integers(0, n, e), rng.integers(0, n, e), n)
    assert layout == "coo"
    assert ratio > 0.95  # essentially nothing tiles on a random graph


def test_probe_reuses_given_perm():
    s, r, n = _community_graph(n=1024, e=8192)
    frac1, ratio1, perm = probe_layout(s, r, n)
    frac2, ratio2, perm2 = probe_layout(s, r, n, perm=perm)
    assert (frac1, ratio1) == (frac2, ratio2)
    assert perm2 is perm


def test_load_cora_auto_resolves_to_coo():
    from graphneuralnetwork_tpu.core.graph import Graph
    from graphneuralnetwork_tpu.data import load_cora

    data = load_cora(seed=0, layout="auto")
    assert isinstance(data.graph, Graph)  # homophily synthetic -> COO


def test_load_cora_auto_attention_objective_tiles():
    from graphneuralnetwork_tpu.core.bcsr import HybridGraph
    from graphneuralnetwork_tpu.data import load_cora

    data = load_cora(seed=0, layout="auto",
                     layout_objective="attention")
    assert isinstance(data.graph, HybridGraph)  # GAT economics tile it


def test_load_acm_han_auto_resolves_to_hybrid():
    from graphneuralnetwork_tpu.core.bcsr import HybridGraph
    from graphneuralnetwork_tpu.data import load_acm_han

    data = load_acm_han(seed=0, layout="auto", n_papers=300)
    assert all(isinstance(g, HybridGraph) for g in data.graphs)


def test_cli_rejects_bad_layout_combo():
    from graphneuralnetwork_tpu import cli

    with pytest.raises(SystemExit, match="not supported"):
        cli.main(["--model", "gcn", "--layout", "sparse", "--quiet"])
    with pytest.raises(SystemExit, match="not supported"):
        cli.main(["--model", "deepwalk", "--layout", "hybrid", "--quiet"])
    with pytest.raises(SystemExit, match="not supported"):
        cli.main(["--model", "gtn", "--layout", "hybrid", "--quiet"])


def test_device_loop_guard_rejects_custom_step():
    import optax

    from graphneuralnetwork_tpu.nn.embed import SkipGram
    from graphneuralnetwork_tpu.train.embed_loop import train_skipgram

    n, b = 64, 8
    rng = np.random.default_rng(0)
    arrays = (rng.integers(0, n, 32).astype(np.int32),
              rng.integers(0, n, (32, 4)).astype(np.int32),
              (rng.random((32, 4)) < 0.5).astype(np.float32),
              np.ones((32, 4), np.float32))
    with pytest.raises(ValueError, match="device_loss_fn"):
        train_skipgram(
            SkipGram(vocab_size=n, embed_dim=4), arrays,
            epochs=1, batch_size=b, optimizer=optax.adam(1e-2),
            step_fn_factory=lambda m, t: (lambda *a: None),
            device_loop=True)
