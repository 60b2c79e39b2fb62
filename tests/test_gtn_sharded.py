"""Sharded + blocked SparseGTN: 1-vs-8-device parity and the streamed
wedge composition (VERDICT r4 #4/#5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _small_plan(seed=0, n=60, T=4, e=150):
    from graphneuralnetwork_tpu.nn.gtn_sparse import (build_gtn_plan,
                                                      stacked_adj_to_sparse)

    rng = np.random.default_rng(seed)
    adj = np.zeros((T, n, n), np.float32)
    for t in range(T - 1):
        idx = rng.integers(0, n, (2, e))
        adj[t][idx[0], idx[1]] = 1.0
    adj[T - 1] = np.eye(n, dtype=np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    plan = build_gtn_plan(stacked_adj_to_sparse(adj), n, num_layers=2)
    return plan, x, n


@pytest.mark.heavy
def test_sharded_sparse_gtn_matches_single_device():
    from jax.sharding import Mesh

    from graphneuralnetwork_tpu.nn.gtn_sparse import SparseGTN
    from graphneuralnetwork_tpu.parallel.gtn_sparse import shard_gtn_plan

    plan, x, n = _small_plan()
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    splan = shard_gtn_plan(plan, mesh)

    model = SparseGTN(num_classes=3, channels=2, num_layers=2, hidden=8)
    params = model.init(jax.random.PRNGKey(0), plan,
                        jnp.asarray(x))["params"]

    out_1 = model.apply({"params": params}, plan, jnp.asarray(x))
    out_k = model.apply({"params": params}, splan, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_1),
                               atol=2e-5, rtol=2e-5)

    # gradients (incl. the psum'd mixing weights) agree 1-vs-8
    def loss(p, pl):
        return jnp.sum(model.apply({"params": p}, pl,
                                   jnp.asarray(x)) ** 2)

    g1 = jax.grad(loss)(params, plan)
    gk = jax.grad(loss)(params, splan)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_sharded_plan_covers_all_wedges():
    from jax.sharding import Mesh

    from graphneuralnetwork_tpu.parallel.gtn_sparse import shard_gtn_plan

    plan, _, _ = _small_plan(seed=1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    splan = shard_gtn_plan(plan, mesh)
    for s, w in enumerate(plan.wedge_counts):
        # every real wedge lands in exactly one shard (a_val>0 marks real)
        real = int((np.asarray(splan.sh_a_val[s]) != 0).sum())
        exact = int((np.asarray(plan.step_a_val[s]) != 0).sum())
        assert real == exact
        assert sum(splan.slot_cnt[s]) == plan.nnz[s + 1]


@pytest.mark.heavy
def test_blocked_compose_matches_unblocked():
    from graphneuralnetwork_tpu.nn.gtn_sparse import SparseGTN

    plan, x, _ = _small_plan(seed=2)
    base = SparseGTN(num_classes=3, channels=2, num_layers=2, hidden=8)
    params = base.init(jax.random.PRNGKey(0), plan,
                       jnp.asarray(x))["params"]
    # tiny wedge_block forces the lax.scan streaming path on every step
    blocked = SparseGTN(num_classes=3, channels=2, num_layers=2,
                        hidden=8, wedge_block=257)
    out_b = blocked.apply({"params": params}, plan, jnp.asarray(x))
    out_u = base.apply({"params": params}, plan, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_u),
                               atol=1e-5, rtol=1e-5)

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, plan, jnp.asarray(x)) ** 2)

    gb = jax.grad(lambda p: loss(blocked, p))(params)
    gu = jax.grad(lambda p: loss(base, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
