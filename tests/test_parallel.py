"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4 (4)):
same graph on 1 vs N devices must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from graphneuralnetwork_tpu.core.graph import build_graph, gcn_graph
from graphneuralnetwork_tpu.data import load_cora
from graphneuralnetwork_tpu.nn import GCN
from graphneuralnetwork_tpu.ops import spmm
from graphneuralnetwork_tpu.parallel import partition_graph, shard_nodes


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("data",))


def test_sharded_spmm_matches_single(mesh, rng):
    n, e, f = 500, 3000, 32
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)

    g1 = build_graph(s, r, n, w)
    out1 = spmm(g1, jnp.asarray(x))

    sg = partition_graph(s, r, n, w, mesh=mesh)
    xs = shard_nodes(x, sg)
    out2 = spmm(sg, xs)
    np.testing.assert_allclose(
        np.asarray(out2)[:n], np.asarray(out1), atol=1e-4)


@pytest.mark.heavy
def test_sharded_spmm_grad_matches_single(mesh, rng):
    n, e, f = 300, 2000, 16
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)

    g1 = build_graph(s, r, n)
    sg = partition_graph(s, r, n, mesh=mesh)
    xs = shard_nodes(x, sg)

    g_single = jax.grad(
        lambda xx: jnp.sum(jnp.tanh(spmm(g1, xx))))(jnp.asarray(x))
    g_shard = jax.grad(
        lambda xx: jnp.sum(jnp.tanh(spmm(sg, xx))[: n]))(xs)
    np.testing.assert_allclose(
        np.asarray(g_shard)[:n], np.asarray(g_single), atol=1e-4)


def test_sharded_gcn_training_step(mesh):
    """Full jitted GCN train step over the mesh: same model code, sharded
    graph; loss must match the single-device step."""
    data = load_cora(seed=0)
    n = data.features.shape[0]

    # single-device reference
    model = GCN(hidden=16, num_classes=data.num_classes, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), data.graph,
                        data.features)["params"]

    # sharded: same normalised weights, partitioned
    s = np.asarray(data.graph.senders)[: data.graph.n_edges]
    r = np.asarray(data.graph.receivers)[: data.graph.n_edges]
    w = np.asarray(data.graph.edge_weight)[: data.graph.n_edges]
    sg = partition_graph(s, r, n, w, mesh=mesh)
    xs = shard_nodes(np.asarray(data.features), sg)
    labels = data.labels
    idx = data.train_idx

    def loss_fn(params, graph, x):
        logits = model.apply({"params": params}, graph, x)
        sel = logits[idx]
        ls = -jax.nn.log_softmax(sel)[jnp.arange(idx.shape[0]), labels[idx]]
        return ls.mean()

    l1 = loss_fn(params, data.graph, data.features)
    l2, grads = jax.jit(jax.value_and_grad(loss_fn))(params, sg, xs)
    np.testing.assert_allclose(float(l2), float(l1), atol=1e-5)

    # one optimizer step must also run under jit on the mesh
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, graph, x):
        loss, grads = jax.value_and_grad(loss_fn)(params, graph, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params2, opt_state, loss = step(params, opt_state, sg, xs)
    assert np.isfinite(float(loss))


def test_tensor_parallel_gcn_matches_single_device():
    """dp x tp GSPMD GCN: 2-D mesh with column/row-sharded dense kernels
    produces the same logits and gradients as single-device execution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graphneuralnetwork_tpu import build_graph
    from graphneuralnetwork_tpu.core.graph import (
        add_self_loops, sym_normalize_weights, symmetrize)
    from graphneuralnetwork_tpu.data.planetoid import (
        synthetic_citation_graph)
    from graphneuralnetwork_tpu.nn import GCN
    from graphneuralnetwork_tpu.ops import set_ops_impl
    from graphneuralnetwork_tpu.parallel import (
        apply_tp, gcn_param_shardings, make_tp_mesh, shard_rows)

    n_dev = len(jax.devices())
    if n_dev < 4:
        import pytest
        pytest.skip("needs >=4 devices")

    feats, labels, s, r = synthetic_citation_graph(
        n_nodes=256, n_feats=64, n_classes=4, seed=0)
    n = feats.shape[0]
    s, r = symmetrize(s, r)
    s, r = add_self_loops(s, r, n)
    w = sym_normalize_weights(s, r, n)
    graph = build_graph(s, r, n, w)
    model = GCN(hidden=16, num_classes=4, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), graph,
                        jnp.asarray(feats))["params"]
    labels_j = jnp.asarray(labels)

    def loss_fn(p, x):
        logits = model.apply({"params": p}, graph, x)
        return -jax.nn.log_softmax(logits)[
            jnp.arange(n), labels_j].mean()

    set_ops_impl("xla")  # GSPMD partitions gather+segment_sum
    try:
        ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
            params, jnp.asarray(feats))

        mesh = make_tp_mesh(n_dev // 2, 2)
        shardings = gcn_param_shardings(mesh, params)
        p_tp = apply_tp(params, shardings)
        x_tp = shard_rows(feats, mesh)
        tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss_fn))(p_tp, x_tp)

        np.testing.assert_allclose(ref_loss, tp_loss, rtol=2e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                    atol=2e-5),
            ref_grads, tp_grads)
    finally:
        set_ops_impl("auto")


def test_han_forward_on_halo_metapath_graphs(mesh, rng):
    """HAN runs unchanged when each metapath graph is a HaloGraph: GATConv
    dispatches to the edge-partitioned attention, semantic attention runs
    under GSPMD on the row-sharded stack."""
    from graphneuralnetwork_tpu.nn import HAN
    from graphneuralnetwork_tpu.parallel import (
        partition_graph_halo, shard_nodes_halo)

    n, f_in = 64, 12
    edges = []
    for _ in range(2):  # two metapaths
        e = 400
        edges.append((rng.integers(0, n, e), rng.integers(0, n, e)))
    x = rng.normal(size=(n, f_in)).astype(np.float32)

    graphs1 = [build_graph(s.astype(np.int32), r.astype(np.int32), n)
               for s, r in edges]
    model = HAN(num_metapaths=2, num_classes=3, hidden=4, num_heads=(2,),
                dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), graphs1,
                        jnp.asarray(x))["params"]
    out1 = model.apply({"params": params}, graphs1, jnp.asarray(x))

    hgs = [partition_graph_halo(s, r, n, mesh=mesh) for s, r in edges]
    xs = shard_nodes_halo(x, hgs[0])
    out2 = jax.jit(lambda p, xx: model.apply({"params": p}, hgs, xx))(
        params, xs)
    np.testing.assert_allclose(np.asarray(out2)[:n], np.asarray(out1),
                               atol=3e-5, rtol=1e-4)


def test_gtn_gspmd_sharded_adjacency(mesh, rng):
    """GTN's dense [T,N,N] einsum chains partition under GSPMD: sharding
    the adjacency stack and features over the mesh must reproduce the
    single-device forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from graphneuralnetwork_tpu.nn import GTN

    n, t, f_in = 64, 3, 16
    adj = (rng.random((t, n, n)) < 0.1).astype(np.float32)
    x = rng.normal(size=(n, f_in)).astype(np.float32)

    model = GTN(num_classes=3, channels=2, num_layers=2, hidden=8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(adj),
                        jnp.asarray(x))["params"]
    out1 = model.apply({"params": params}, jnp.asarray(adj),
                       jnp.asarray(x))
    if isinstance(out1, tuple):
        out1 = out1[0]

    adj_sh = jax.device_put(jnp.asarray(adj),
                            NamedSharding(mesh, P(None, "data", None)))
    x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    out2 = jax.jit(lambda p, a, xx: model.apply({"params": p}, a, xx))(
        params, adj_sh, x_sh)
    if isinstance(out2, tuple):
        out2 = out2[0]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               atol=2e-4, rtol=1e-3)


def test_sageconv_on_halograph(mesh, rng):
    """SAGEConv mean/sum aggregators run on HaloGraph via the dispatching
    spmm and match the single-device layer."""
    from graphneuralnetwork_tpu.nn import SAGEConv
    from graphneuralnetwork_tpu.parallel import (
        partition_graph_halo, shard_nodes_halo)

    n, e, f_in = 72, 450, 9
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    x = rng.normal(size=(n, f_in)).astype(np.float32)

    g1 = build_graph(s.astype(np.int32), r.astype(np.int32), n)
    hg = partition_graph_halo(s, r, n, mesh=mesh)
    xs = shard_nodes_halo(x, hg)

    for aggr in ("mean", "sum"):
        conv = SAGEConv(features=6, aggregator=aggr)
        params = conv.init(jax.random.PRNGKey(0), g1,
                           jnp.asarray(x))["params"]
        out1 = conv.apply({"params": params}, g1, jnp.asarray(x))
        out2 = jax.jit(
            lambda p, xx: conv.apply({"params": p}, hg, xx))(params, xs)
        np.testing.assert_allclose(np.asarray(out2)[:n], np.asarray(out1),
                                   atol=3e-5, rtol=1e-4, err_msg=aggr)


def test_data_parallel_skipgram_step(mesh, rng):
    """DataParallel analogue for the embedding family (LINE/train_eval.py:23):
    batch rows sharded over the mesh must produce the same loss and update
    as the single-device step."""
    import optax
    from graphneuralnetwork_tpu.nn.embed import SkipGram
    from graphneuralnetwork_tpu.train.embed_loop import (
        make_skipgram_step, shard_batch_arrays)

    n, B, C = 50, 64, 6
    model = SkipGram(vocab_size=n, embed_dim=8)
    centers = rng.integers(0, n, B).astype(np.int32)
    ctx_neg = rng.integers(0, n, (B, C)).astype(np.int32)
    labels = (rng.random((B, C)) < 0.5).astype(np.float32)
    mask = np.ones((B, C), np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(centers),
                        jnp.asarray(ctx_neg))["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_skipgram_step(model, tx)

    p1, _, loss1, acc1 = step(params, opt_state, jnp.asarray(centers),
                              jnp.asarray(ctx_neg), jnp.asarray(labels),
                              jnp.asarray(mask))
    sharded = shard_batch_arrays((centers, ctx_neg, labels, mask), mesh)
    p2, _, loss2, acc2 = step(params, opt_state, *sharded)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p2["center"]), np.asarray(p1["center"]), atol=1e-6)
