"""Halo-exchange sharded SpMM: 1-vs-N parity + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from graphneuralnetwork_tpu.core.graph import build_graph
from graphneuralnetwork_tpu.ops import spmm
from graphneuralnetwork_tpu.parallel import (
    partition_graph_halo,
    shard_nodes_halo,
    spmm_halo,
)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("data",))


def test_halo_spmm_matches_single(mesh, rng):
    n, e, f = 700, 5000, 24
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)

    g1 = build_graph(s, r, n, w)
    out1 = spmm(g1, jnp.asarray(x))

    hg = partition_graph_halo(s, r, n, w, mesh=mesh)
    xs = shard_nodes_halo(x, hg)
    out2 = jax.jit(spmm_halo, static_argnums=())(hg, xs)
    np.testing.assert_allclose(
        np.asarray(out2)[:n], np.asarray(out1), atol=1e-4)


def test_halo_spmm_grad_matches_single(mesh, rng):
    n, e, f = 300, 2500, 12
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)

    g1 = build_graph(s, r, n)
    hg = partition_graph_halo(s, r, n, mesh=mesh)
    xs = shard_nodes_halo(x, hg)

    g_single = jax.grad(
        lambda xx: jnp.sum(jnp.tanh(spmm(g1, xx))))(jnp.asarray(x))
    g_halo = jax.grad(
        lambda xx: jnp.sum(jnp.tanh(spmm_halo(hg, xx))[: n]))(xs)
    np.testing.assert_allclose(
        np.asarray(g_halo)[:n], np.asarray(g_single), atol=1e-4)


def test_halo_traffic_smaller_than_allgather(mesh, rng):
    """The exchange plan must move fewer rows than a full all_gather for a
    clustered graph."""
    n = 1024  # nps = 128 → clusters align exactly with shard boundaries
    nodes_per = n // 8
    s, r = [], []
    for c in range(8):
        base = c * nodes_per
        cs = rng.integers(0, nodes_per, 600) + base
        cr = rng.integers(0, nodes_per, 600) + base
        s.append(cs); r.append(cr)
    # few cross edges
    s.append(rng.integers(0, n, 100))
    r.append(rng.integers(0, n, 100))
    s = np.concatenate(s); r = np.concatenate(r)
    hg = partition_graph_halo(s, r, n, mesh=mesh)
    total_halo_rows = hg.n_devices * hg.n_devices * hg.halo_size
    allgather_rows = hg.n_devices * hg.n_node_pad
    assert total_halo_rows < allgather_rows / 3
