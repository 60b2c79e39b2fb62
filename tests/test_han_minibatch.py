"""Dense GAT path + HAN node-minibatch mode (HAN batch form,
HAN/utils/data_utils.py:92-123, train_batch HAN/train_utils/train_eval.py:29-96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphneuralnetwork_tpu.core.graph import build_graph, dense_adj
from graphneuralnetwork_tpu.data.acm import load_acm_han
from graphneuralnetwork_tpu.nn import DenseGATConv, GATConv
from graphneuralnetwork_tpu.train import fit_han_minibatch


def test_dense_gat_matches_sparse_gat():
    """Same weights through the dense -9e15-mask path and the sparse
    segment-softmax path must agree (they're the same math)."""
    rng = np.random.default_rng(0)
    n, f = 24, 6
    a = (rng.random((n, n)) < 0.25).astype(np.float32)
    np.fill_diagonal(a, 1.0)  # every node has an in-edge
    s, r = np.nonzero(a.T)    # a[i, j] = edge j→i ⇒ senders = j = col
    g = build_graph(s.astype(np.int32), r.astype(np.int32), n)
    x = rng.standard_normal((n, f)).astype(np.float32)

    sparse = GATConv(features=5, num_heads=3)
    dense = DenseGATConv(features=5, num_heads=3)
    params = sparse.init(jax.random.PRNGKey(1), g, jnp.asarray(x))["params"]

    out_sparse = sparse.apply({"params": params}, g, jnp.asarray(x))
    out_dense = dense.apply({"params": params}, jnp.asarray(a),
                            jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense),
                               atol=2e-5)
    # and the dense adjacency reconstructed from the Graph matches
    np.testing.assert_allclose(np.asarray(dense_adj(g)), a)


@pytest.mark.heavy
def test_han_minibatch_learns_synthetic_acm():
    data = load_acm_han(seed=0)
    res = fit_han_minibatch(data, batch_size=32, lr=0.2, epochs=250,
                            eval_every=40, patience=50, seed=0)
    # batches see only intra-batch metapath edges; still must beat chance
    assert res.test_acc > 0.45, res
    assert np.isfinite(res.best_val_loss)
    assert res.epochs_run > 0
