"""Walk-generation benchmark: host walkers vs on-device walks.

Measures corpus generation (the reference's joblib hot loop,
Node2vec/utils/sample_utils.py:72-170) for node2vec p/q walks on a
larger synthetic community graph: host = vectorised lock-step numpy
walker incl. its per-edge alias-table build; device = prebuilt
inverse-CDF tables + one jitted lax.scan (sampling/device_walks.py).

Usage: python tools/bench_walks.py [--nodes 65536] [--edges 524288]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--edges", type=int, default=524_288)
    ap.add_argument("--num-walks", type=int, default=10)
    ap.add_argument("--length", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

    from graphneuralnetwork_tpu.sampling.device_walks import (
        build_node2vec_tables, device_node2vec_walks)
    from graphneuralnetwork_tpu.sampling.walks import (Node2VecWalker,
                                                       csr_from_edges)

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.edges
    s = rng.integers(0, n, e)
    r = np.where(rng.random(e) < 0.9,
                 (s // 256) * 256 + rng.integers(0, 256, e),
                 rng.integers(0, n, e))
    keep = s != r
    s, r = np.concatenate([s[keep], r[keep]]), \
        np.concatenate([r[keep], s[keep]])
    indptr, indices, w = csr_from_edges(s, r, n)
    starts = np.tile(np.arange(n), args.num_walks)
    print(f"n={n} e={len(s)} walkers={len(starts)} len={args.length} "
          f"backend={jax.default_backend()}", flush=True)

    # --- device: table build (vectorised numpy) + jitted walk ---
    t0 = time.perf_counter()
    tables = build_node2vec_tables(indptr, indices, p=0.25, q=2.0,
                                   weights=w)
    t_build_dev = time.perf_counter() - t0
    walk_jit = jax.jit(device_node2vec_walks,
                       static_argnames=("length",))
    sj = jnp.asarray(starts)
    out = walk_jit(jax.random.PRNGKey(0), sj, args.length, tables)
    _ = np.asarray(out[0, 0])            # compile + sync
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = walk_jit(jax.random.PRNGKey(i + 1), sj, args.length,
                       tables)
        _ = np.asarray(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"device: table build {t_build_dev:6.2f} s, "
          f"walks {best:6.2f} s "
          f"({len(starts) * (args.length - 1) / best / 1e6:.1f} Msteps/s)",
          flush=True)

    # --- host: per-edge alias build (reference design) + lock-step walk
    t0 = time.perf_counter()
    walker = Node2VecWalker(indptr, indices, p=0.25, q=2.0, weights=w)
    t_build_host = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = walker.walk(starts, args.length, np.random.default_rng(1))
    t_walk_host = time.perf_counter() - t0
    print(f"host:   table build {t_build_host:6.2f} s, "
          f"walks {t_walk_host:6.2f} s "
          f"({len(starts) * (args.length - 1) / t_walk_host / 1e6:.1f} "
          f"Msteps/s)", flush=True)
    print(f"end-to-end speedup (build+walks): "
          f"{(t_build_host + t_walk_host) / (t_build_dev + best):.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
