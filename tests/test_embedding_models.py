"""End-to-end tests of the embedding model family on synthetic graphs.

Oracle: embeddings of structurally-related nodes score higher than random
pairs (the reference has no stronger oracle — training-loss-only eval,
BASELINE.md rows DeepWalk/LINE/SDNE)."""

import numpy as np
import pytest

from graphneuralnetwork_tpu.data.edgelist import (
    load_edgelist,
    synthetic_smallworld,
)
from graphneuralnetwork_tpu.models import (
    BiNEConfig,
    GATNEConfig,
    LINEConfig,
    SDNEConfig,
    WalkEmbedConfig,
    run_deepwalk,
    run_line,
    run_metapath2vec,
    run_node2vec,
    run_sdne,
    run_struc2vec,
    train_bine,
    train_gatne,
)

SMALL = WalkEmbedConfig(num_walks=10, walk_length=8, epochs=3,
                        batch_size=128, lr=5e-2, embed_dim=32,
                        subsample_t=None)


def _neighbor_vs_random_score(emb, senders, receivers, rng):
    """Mean cosine of connected pairs minus random pairs."""
    def cos(a, b):
        num = np.sum(a * b, -1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        return num / np.maximum(den, 1e-12)
    n = emb.shape[0]
    pos = cos(emb[senders], emb[receivers]).mean()
    ri = rng.integers(0, n, len(senders))
    rj = rng.integers(0, n, len(senders))
    neg = cos(emb[ri], emb[rj]).mean()
    return pos - neg


@pytest.fixture(scope="module")
def small_graph():
    return synthetic_smallworld(n_nodes=120, seed=0)


def test_deepwalk_learns_locality(small_graph):
    emb, history = run_deepwalk(small_graph, SMALL)
    assert emb.shape == (120, 32)
    assert history[-1][1] < history[0][1]  # loss decreases
    gap = _neighbor_vs_random_score(
        emb, small_graph.senders, small_graph.receivers,
        np.random.default_rng(0))
    assert gap > 0.1, gap


def test_node2vec_learns_locality(small_graph):
    emb, history = run_node2vec(small_graph, SMALL)
    gap = _neighbor_vs_random_score(
        emb, small_graph.senders, small_graph.receivers,
        np.random.default_rng(0))
    assert gap > 0.1, gap


def test_line_loss_decreases(small_graph):
    emb, history = run_line(small_graph, LINEConfig(
        epochs=3, batch_size=32, lr=5e-2, embed_dim=32))
    assert emb.shape == (120, 32)
    assert history[-1][1] < history[0][1]


def test_sdne_reconstructs(small_graph):
    emb, history = run_sdne(small_graph, SDNEConfig(
        hidden_dims=(64, 32), epochs=5, batch_size=16, lr=5e-3))
    assert emb.shape == (120, 32)
    assert history[-1][1] < history[0][1]


def test_struc2vec_runs_small():
    data = synthetic_smallworld(n_nodes=40, seed=1)
    cfg = WalkEmbedConfig(num_walks=5, walk_length=6, epochs=2,
                          batch_size=64, lr=5e-2, embed_dim=16)
    emb, history = run_struc2vec(data, cfg, k_max=2)
    assert emb.shape == (40, 16)
    assert np.isfinite(emb).all()


def test_metapath2vec_runs():
    emb, history = run_metapath2vec(
        cfg=WalkEmbedConfig(num_walks=5, walk_length=9, epochs=2,
                            window=4, num_negatives=4,
                            batch_size=256, lr=5e-2, embed_dim=32))
    assert emb.shape[1] == 32
    assert history[-1][1] < history[0][1]


@pytest.mark.heavy
def test_gatne_link_prediction_beats_chance():
    cfg = GATNEConfig(embed_dim=32, edge_embed_dim=8, attn_dim=8,
                      num_walks=4, walk_length=8, epochs=2,
                      batch_size=256, lr=1e-2, neighbor_samples=5)
    params, history, metrics = train_gatne(cfg=cfg)
    assert metrics["auc"] > 0.6, metrics


@pytest.mark.heavy
def test_gatne_inductive_runs():
    cfg = GATNEConfig(embed_dim=16, edge_embed_dim=4, attn_dim=4,
                      num_walks=2, walk_length=6, epochs=1,
                      batch_size=256, lr=1e-2, neighbor_samples=3,
                      inductive=True)
    params, history, metrics = train_gatne(cfg=cfg)
    assert np.isfinite(metrics["auc"])


def test_bine_link_prediction():
    cfg = BiNEConfig(embed_dim=32, epochs=3, batch_size=128, lr=1e-2,
                     max_t=16)
    params, history, metrics = train_bine(cfg=cfg)
    assert history[-1][1] < history[0][1]
    assert metrics is not None and metrics["auc"] > 0.55, metrics

def test_gatne_walk_cache_roundtrip(tmp_path):
    """Walk corpus persists and reloads identically (reference
    train_walks.txt caching, GATNE/utils/data_utils.py:171-207)."""
    import numpy as np
    from graphneuralnetwork_tpu.data.edgelist import load_multiplex
    from graphneuralnetwork_tpu.models.gatne import (
        GATNEConfig, _generate_walks)
    data = load_multiplex(seed=0)
    cfg = GATNEConfig(num_walks=2, walk_length=5, seed=0,
                      cache_dir=str(tmp_path))
    w1 = _generate_walks(data, cfg, np.random.default_rng(0))
    # second call with a DIFFERENT rng must hit the cache -> identical walks
    w2 = _generate_walks(data, cfg, np.random.default_rng(99))
    for ty in data.edge_types:
        np.testing.assert_array_equal(w1[ty], w2[ty])


def test_gatne_log_uniform_negative_distribution():
    """The log-uniform NSLoss distribution must favour frequent (low-rank)
    nodes: P(k) ∝ log(k+2)-log(k+1) (GATNE/train_utils/loss_utils.py:14-22).
    """
    from graphneuralnetwork_tpu.sampling.skipgram import NegativeSampler

    rng = np.random.default_rng(0)
    n = 64
    freq = np.arange(n, 0, -1)  # node 0 most frequent
    rank = np.empty(n, np.int64)
    rank[np.argsort(-freq, kind="stable")] = np.arange(n)
    k = rank.astype(np.float64)
    w = (np.log(k + 2) - np.log(k + 1)) / np.log(n + 1)
    sampler = NegativeSampler(w, power=1.0)
    draws = sampler.draw((20000,), rng)
    counts = np.bincount(draws, minlength=n)
    # empirical frequency ratio of rank-0 vs rank-31 should approximate the
    # theoretical log-uniform ratio
    expect = w[0] / w[31]
    got = counts[0] / max(counts[31], 1)
    assert 0.6 * expect < got < 1.6 * expect, (expect, got)
    assert counts[0] > counts[-1] > 0

@pytest.mark.heavy
def test_gatne_v2_masked_bce_mode():
    """v2 Encoder/Decoder pipeline (GATNE_Pytorch/models/GATNE.py:100-127):
    padded masked-BCE loss trains to useful link-pred quality."""
    cfg = GATNEConfig(embed_dim=32, edge_embed_dim=8, attn_dim=8,
                      num_walks=4, walk_length=8, epochs=3,
                      batch_size=256, lr=1e-2, neighbor_samples=5,
                      loss="masked_bce")
    params, history, metrics = train_gatne(cfg=cfg)
    assert "decoder" in params
    assert history[-1][1] < history[0][1]        # loss descends
    assert metrics["f1"] >= 0.6, metrics
    assert metrics["auc"] > 0.6, metrics


@pytest.mark.heavy
def test_gatne_v2_sum_aggregator():
    """agg_func switch (GATNE_Pytorch/models/GATNE.py:72-77): sum vs mean
    produce different embeddings but both train."""
    kw = dict(embed_dim=16, edge_embed_dim=4, attn_dim=4, num_walks=2,
              walk_length=6, epochs=1, batch_size=256,
              neighbor_samples=3, loss="masked_bce")
    _, _, m_sum = train_gatne(cfg=GATNEConfig(aggregator="sum", **kw))
    _, _, m_mean = train_gatne(cfg=GATNEConfig(aggregator="mean", **kw))
    assert np.isfinite(m_sum["auc"]) and np.isfinite(m_mean["auc"])
    assert m_sum["auc"] != m_mean["auc"]  # aggregation actually differs


def test_gatne_rejects_unknown_loss_and_aggregator():
    import pytest
    with pytest.raises(ValueError):
        train_gatne(cfg=GATNEConfig(loss="bogus", epochs=1))
    import jax.numpy as jnp
    from graphneuralnetwork_tpu.nn.embed import GATNE as GATNEModule
    m = GATNEModule(vocab_size=4, num_edge_types=1, embed_dim=4,
                    edge_embed_dim=2, attn_dim=2, aggregator="bogus")
    import jax
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32),
               jnp.zeros((1,), jnp.int32),
               jnp.zeros((1, 1, 2), jnp.int32))


def test_skipgram_device_loop_matches_host_quality():
    """The scanned on-device epoch loop (train_skipgram device_loop=True)
    trains to the same quality as the host-streamed loop."""
    import optax

    from graphneuralnetwork_tpu.nn.embed import SkipGram
    from graphneuralnetwork_tpu.sampling.skipgram import skipgram_dataset
    from graphneuralnetwork_tpu.train.embed_loop import train_skipgram

    rng = np.random.default_rng(0)
    n = 60
    walks = np.stack([(np.arange(8) + s) % n for s in range(n)] * 4)
    arrays = skipgram_dataset(walks, n, window=3, num_negatives=3,
                              rng=rng, subsample_t=None)
    model = SkipGram(vocab_size=n, embed_dim=16)

    _, hist_host = train_skipgram(
        model, arrays, epochs=3, batch_size=64,
        optimizer=optax.adam(5e-2), seed=0, device_loop=False)
    _, hist_dev = train_skipgram(
        model, arrays, epochs=3, batch_size=64,
        optimizer=optax.adam(5e-2), seed=0, device_loop=True)
    # both descend, ending in the same ballpark
    assert hist_host[-1][1] < hist_host[0][1]
    assert hist_dev[-1][1] < hist_dev[0][1]
    assert abs(hist_dev[-1][1] - hist_host[-1][1]) < 0.15, (
        hist_dev[-1], hist_host[-1])


def test_line_device_loop_matches_host_quality():
    """LINE's weighted loss through the scanned device loop trains to the
    same quality as the host-streamed path."""
    from graphneuralnetwork_tpu.models import LINEConfig, run_line

    cfg = LINEConfig(epochs=2, embed_dim=16, batch_size=64, seed=0)
    emb_h, hist_h = run_line(cfg=cfg)
    # force the device loop on CPU by monkeypatching the default check
    import graphneuralnetwork_tpu.train.embed_loop as el
    import jax

    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"   # noqa: PLW0603 (test-local)
        emb_d, hist_d = run_line(cfg=cfg)
    finally:
        jax.default_backend = orig
    assert hist_h[-1][1] < hist_h[0][1]
    assert hist_d[-1][1] < hist_d[0][1]
    assert abs(hist_d[-1][1] - hist_h[-1][1]) < 0.2, (
        hist_d[-1], hist_h[-1])


def test_sdne_device_loop_matches_host_quality():
    from graphneuralnetwork_tpu.models import SDNEConfig, run_sdne
    import jax

    cfg = SDNEConfig(epochs=3, seed=0)
    emb_h, hist_h = run_sdne(cfg=cfg)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        emb_d, hist_d = run_sdne(cfg=cfg)
    finally:
        jax.default_backend = orig
    assert hist_h[-1][1] < hist_h[0][1]
    assert hist_d[-1][1] < hist_d[0][1]
    rel = abs(hist_d[-1][1] - hist_h[-1][1]) / max(abs(hist_h[-1][1]),
                                                   1e-9)
    assert rel < 0.3, (hist_d[-1], hist_h[-1])


def test_skipgram_device_loop_tiny_corpus_falls_back():
    """Regression: a corpus smaller than batch_size must not crash the
    device loop (it reshaped n < batch_size rows into (1, batch_size))."""
    import optax

    from graphneuralnetwork_tpu.nn.embed import SkipGram
    from graphneuralnetwork_tpu.sampling.skipgram import skipgram_dataset
    from graphneuralnetwork_tpu.train.embed_loop import train_skipgram

    rng = np.random.default_rng(0)
    n = 10
    walks = np.stack([(np.arange(4) + s) % n for s in range(n)])
    arrays = skipgram_dataset(walks, n, window=2, num_negatives=2,
                              rng=rng, subsample_t=None)
    assert len(arrays[0]) < 256
    model = SkipGram(vocab_size=n, embed_dim=8)
    params, hist = train_skipgram(
        model, arrays, epochs=2, batch_size=256,
        optimizer=optax.adam(1e-2), seed=0, device_loop=True)
    assert len(hist) == 2


def test_gatne_device_epoch_loop_matches_host_quality():
    """GATNE's scanned epoch loop (auto-enabled on accelerators) trains
    to the same quality as the streamed host loop."""
    import jax

    from graphneuralnetwork_tpu.models import GATNEConfig, train_gatne

    cfg = GATNEConfig(epochs=2, embed_dim=16, edge_embed_dim=4,
                      attn_dim=4, batch_size=64, seed=0)
    _, hist_h, m_h = train_gatne(cfg=cfg)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        _, hist_d, m_d = train_gatne(cfg=cfg)
    finally:
        jax.default_backend = orig
    assert hist_h[-1][1] < hist_h[0][1] + 0.1
    assert hist_d[-1][1] < hist_d[0][1] + 0.1
    assert abs(hist_d[-1][1] - hist_h[-1][1]) < 0.5, (
        hist_d[-1][1], hist_h[-1][1])


def test_gatne_v2_device_epoch_loop_matches_host_quality():
    import jax

    from graphneuralnetwork_tpu.models import GATNEConfig, train_gatne

    cfg = GATNEConfig(epochs=2, embed_dim=16, edge_embed_dim=4,
                      attn_dim=4, batch_size=64, seed=0,
                      loss="masked_bce")
    _, hist_h, _ = train_gatne(cfg=cfg)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        _, hist_d, _ = train_gatne(cfg=cfg)
    finally:
        jax.default_backend = orig
    assert abs(hist_d[-1][1] - hist_h[-1][1]) < 0.5, (
        hist_d[-1][1], hist_h[-1][1])
