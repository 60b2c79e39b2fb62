import numpy as np

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
