import numpy as np
import pytest

from graphneuralnetwork_tpu.data.pubmed import load_pubmed
from graphneuralnetwork_tpu.train.sage_loop import (
    SageConfig,
    sage_embed_all,
    train_sage_supervised,
    train_sage_unsupervised,
)


def test_supervised_sage_learns():
    data = load_pubmed(n_nodes=600, n_feats=64, seed=0)
    cfg = SageConfig(fanouts=(5, 5), hidden=64, batch_size=32,
                     epochs=4, lr=1e-2)
    params, history, test_acc = train_sage_supervised(data, cfg)
    assert test_acc > 0.6, (test_acc, history)


def test_supervised_sage_max_aggregator():
    data = load_pubmed(n_nodes=300, n_feats=32, seed=1)
    cfg = SageConfig(fanouts=(4, 4), hidden=32, batch_size=32,
                     epochs=2, lr=1e-2, aggregator="max")
    params, history, test_acc = train_sage_supervised(data, cfg)
    assert np.isfinite(history[-1][1])


def test_unsupervised_sage_binary_acc_improves():
    data = load_pubmed(n_nodes=400, n_feats=32, seed=2)
    cfg = SageConfig(fanouts=(4, 4), hidden=32, batch_size=64,
                     epochs=3, lr=1e-2)
    params, history = train_sage_unsupervised(data, cfg)
    # loss drops sharply and binary-logit accuracy climbs
    assert history[-1][1] < 1.0 < history[0][1], history
    assert history[-1][2] > history[0][2], history
    emb = sage_embed_all(params, data, cfg)
    assert emb.shape == (400, 32)
    assert np.isfinite(emb).all()


@pytest.mark.heavy
def test_device_sampler_matches_host_semantics():
    """On-device fanout draws are valid neighbors, uniform-ish, and
    zero-degree nodes repeat themselves (sampling/device_neighbor.py)."""
    import jax
    import jax.numpy as jnp
    from graphneuralnetwork_tpu.sampling import csr_from_edges
    from graphneuralnetwork_tpu.sampling.device_neighbor import (
        build_device_neighbor_table, device_multihop_sampling,
        device_sample_neighbors)

    rng = np.random.default_rng(0)
    n, e = 40, 200
    s = rng.integers(0, n - 1, e)  # node n-1 isolated (as receiver source)
    r = rng.integers(0, n - 1, e)
    indptr, indices, _ = csr_from_edges(s, r, n)
    table, deg = build_device_neighbor_table(indptr, indices)
    assert int(deg[n - 1]) == 0

    nodes = jnp.asarray(np.array([0, 5, n - 1], np.int32))
    out = device_sample_neighbors(jax.random.PRNGKey(1), nodes, table, deg,
                                  fanout=64).reshape(3, 64)
    out = np.asarray(out)
    # sampled values are true neighbors of each node
    for k, v in enumerate([0, 5]):
        nbrs = set(indices[indptr[v]:indptr[v + 1]].tolist())
        if nbrs:
            assert set(out[k].tolist()) <= nbrs
    # isolated node repeats itself
    assert (out[2] == n - 1).all()

    hops = device_multihop_sampling(jax.random.PRNGKey(2), nodes, (4, 3),
                                    table, deg)
    assert [h.shape[0] for h in hops] == [3, 12, 36]


@pytest.mark.heavy
def test_sage_device_sampling_trains():
    from graphneuralnetwork_tpu.train.sage_loop import (
        SageConfig, train_sage_supervised)

    data = load_pubmed(n_nodes=600, n_feats=64, seed=0)
    cfg = SageConfig(epochs=4, batch_size=64, hidden=64, lr=5e-3,
                     device_sampling=True, seed=0)
    params, history, test_acc = train_sage_supervised(data, cfg)
    assert test_acc > 0.5, (test_acc, history)
