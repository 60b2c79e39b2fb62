"""Scaling-efficiency harness: edges/s for the halo-exchange sharded SpMM
on 1 vs N devices (BASELINE.md north star: >= 80% efficiency 1 chip ->
1 host -> N hosts).

Weak scaling: each device owns a fixed (nodes, edges) local workload, so
ideal scaling keeps time constant as devices are added; efficiency =
t(1) / t(N). Strong scaling: the global graph is fixed; efficiency =
t(1) / (N * t(N)).

On a machine with one TPU chip this runs on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N); on a pod slice the
same code paths ride ICI. Absolute CPU numbers are not TPU numbers — the
harness measures the *collective/compute overlap structure*, which is what
the efficiency ratio reports.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py [--mode weak|strong] [--devices 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_inputs(n_nodes, n_edges, f, n_parts=1, cross_frac=0.05, seed=0,
                  clustered=True):
    """Clustered graphs (default) model a METIS-partitioned real graph:
    each device's node range forms a community and only ``cross_frac`` of
    edges cross partitions — the regime the halo exchange is designed for.
    ``clustered=False`` gives the adversarial random graph where nearly
    every edge is boundary (halo degenerates to an all-gather)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    if not clustered or n_parts == 1:
        s = rng.integers(0, n_nodes, n_edges)
        r = rng.integers(0, n_nodes, n_edges)
    else:
        per = n_nodes // n_parts
        part = rng.integers(0, n_parts, n_edges)
        r = part * per + rng.integers(0, per, n_edges)
        cross = rng.random(n_edges) < cross_frac
        s_part = np.where(cross, rng.integers(0, n_parts, n_edges), part)
        s = s_part * per + rng.integers(0, per, n_edges)
    w = np.ones(n_edges, np.float32)
    x = rng.normal(size=(n_nodes, f)).astype(np.float32)
    return s, r, w, x


def _time_spmm(mesh, s, r, w, x, n_nodes, iters=8,
               clustered_partition=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graphneuralnetwork_tpu.parallel import (
        partition_graph_halo, partition_graph_halo_clustered,
        shard_nodes_halo, spmm_halo)

    if clustered_partition and mesh.devices.size > 1:
        hg, perm = partition_graph_halo_clustered(s, r, n_nodes, w,
                                                  mesh=mesh)
        x = x[perm]
    else:
        hg = partition_graph_halo(s, r, n_nodes, w, mesh=mesh)
    xs = shard_nodes_halo(x, hg)
    # ICI-traffic structure: what fraction of edges need remote senders,
    # and how many rows each device ships per layer. On real pods this —
    # not virtual-device wall time — bounds scaling efficiency.
    n_dev = hg.n_devices
    bnd_edges = int(np.asarray(jnp.sum(hg.bnd_weight != 0)))
    total_edges = len(s)
    halo_rows = n_dev * (n_dev - 1) * hg.halo_size
    stats = dict(
        boundary_edge_frac=round(bnd_edges / max(total_edges, 1), 4),
        halo_rows_per_device=int((n_dev - 1) * hg.halo_size),
        local_rows_per_device=int(hg.nodes_per_shard),
        halo_to_local_ratio=round(
            (n_dev - 1) * hg.halo_size / max(hg.nodes_per_shard, 1), 3),
    ) if n_dev > 1 else {}
    del halo_rows

    @jax.jit
    def chain(xs):
        for _ in range(iters):
            out = spmm_halo(hg, xs)
            xs = out * 1e-3 + xs * 0.5
        return xs

    out = chain(xs)
    _ = np.asarray(out[-1, -1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(xs)
        _ = np.asarray(out[-1, -1])
        best = min(best, time.perf_counter() - t0)
    return best / iters, stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--nodes-per-dev", type=int, default=16384)
    ap.add_argument("--edges-per-dev", type=int, default=262144)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--graph", choices=["clustered", "random", "shuffled"],
                    default="clustered",
                    help="'shuffled' hides a community structure behind "
                         "random node ids and partitions via "
                         "partition_graph_halo_clustered (cluster → slice "
                         "→ tiled interiors) — the full locality pipeline")
    ap.add_argument("--cross-frac", type=float, default=0.05)
    args = ap.parse_args(argv)

    import jax
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    n_avail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]

    results = []
    t1 = None
    for nd in sizes:
        if args.mode == "weak":
            n_nodes = args.nodes_per_dev * nd
            n_edges = args.edges_per_dev * nd
        else:
            n_nodes = args.nodes_per_dev * max(sizes)
            n_edges = args.edges_per_dev * max(sizes)
        s, r, w, x = _build_inputs(
            n_nodes, n_edges, args.features, n_parts=nd,
            cross_frac=args.cross_frac,
            clustered=(args.graph != "random"))
        if args.graph == "shuffled":
            # hide the structure; the clustered partitioner must recover it
            rng_sh = np.random.default_rng(7)
            shuffle = rng_sh.permutation(n_nodes)
            s, r = shuffle[s], shuffle[r]
            inv = np.argsort(shuffle)
            x = x[inv]          # feature row of new id j = old node inv[j]
        mesh = Mesh(np.array(jax.devices()[:nd]), ("data",))
        t, stats = _time_spmm(mesh, s, r, w, x, n_nodes,
                              clustered_partition=(args.graph ==
                                                   "shuffled"))
        if t1 is None:
            t1 = t
            eff = 1.0
        elif args.mode == "weak":
            eff = t1 / t
        else:
            eff = t1 / (nd * t)
        results.append(dict(
            devices=nd, seconds=round(t, 6),
            edges_per_s=round(n_edges / t, 1),
            efficiency=round(eff, 4), **stats))
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({
        "metric": f"halo_spmm_{args.mode}_scaling_efficiency",
        "value": results[-1]["efficiency"],
        "unit": "ratio",
        # Virtual CPU devices share host cores: wall-time efficiency is a
        # lower bound there; the boundary/halo stats are the
        # hardware-independent signal (they bound ICI traffic on pods).
        "cpu_virtual_mesh": jax.devices()[0].platform == "cpu",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
