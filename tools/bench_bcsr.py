"""Hybrid BCSR vs COO SpMM on a locality-clustered graph (real TPU).

Generates a community graph (the locality structure real citation/social
graphs have — plus ~10% random long-range edges), clusters it with
core.reorder.locality_order, and times the paths on the same maths:
XLA COO (baseline), Pallas COO, hybrid (XLA tiles / Pallas tiles) —
f32 and bf16.

Usage: python tools/bench_bcsr.py [--n 131072] [--e 2097152] [--f 128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_graph(n, e, comm=256, p_intra=0.9, seed=0):
    """Community graph with shuffled labels (locality exists but the raw
    ordering hides it — the clustering pass must recover it)."""
    rng = np.random.default_rng(seed)
    shuffle = rng.permutation(n)
    s = rng.integers(0, n, e).astype(np.int64)
    intra = rng.random(e) < p_intra
    offs = rng.integers(0, comm, e)
    base = (shuffle[s] // comm) * comm
    inv = np.empty(n, np.int64)
    inv[shuffle] = np.arange(n)
    intra_r = inv[np.minimum(base + offs, n - 1)]
    r = np.where(intra, intra_r, rng.integers(0, n, e))
    keep = s != r
    return s[keep].astype(np.int32), r[keep].astype(np.int32)


def timed(fn, x0, iters=5, tag=""):
    import jax

    @jax.jit
    def chain(x):
        for _ in range(iters):
            out = fn(x)
            x = out * 1e-3 + x * 0.5
        return x

    t0 = time.perf_counter()
    out = chain(x0)
    _ = np.asarray(out[-1, -1])
    print(f"  [{tag}] compile+warm {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x0)
        _ = np.asarray(out[-1, -1])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--e", type=int, default=2_097_152)
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--comm", type=int, default=256)
    ap.add_argument("--skip-coo-pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.core.reorder import (locality_order,
                                                     relabel_edges)
    from graphneuralnetwork_tpu.ops import set_ops_impl, spmm

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    s, r = clustered_graph(args.n, args.e, comm=args.comm)
    print(f"graph: {len(s)} edges  gen {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    perm = locality_order(s, r, args.n)
    s2, r2 = relabel_edges(perm, s, r)
    print(f"locality_order {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    hg = build_hybrid(s2, r2, args.n)
    print(f"hybrid build {time.perf_counter()-t0:.1f}s  "
          f"tiles {hg.bcsr.n_tiles}  fill {hg.bcsr.fill:.3f}  "
          f"tiled_frac {hg.tiled_fraction:.3f}  "
          f"store {hg.bcsr.n_tiles*128*128*4/1e6:.0f} MB  "
          f"rem_edges {hg.rem.n_edges}", flush=True)
    gr = g.build_graph(s2, r2, args.n)

    rng = np.random.default_rng(1)
    e_real = len(s)
    results = {}
    for dname, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x0 = jnp.asarray(rng.normal(size=(args.n, args.f)), dt)

        set_ops_impl("xla")
        t = timed(lambda x: spmm(gr, x), x0, tag=f"coo_xla_{dname}")
        results[f"coo_xla_{dname}"] = t
        print(f"coo    xla    {dname}: {t*1e3:7.2f} ms  "
              f"{e_real/t/1e6:7.1f} Medges/s", flush=True)

        if not args.skip_coo_pallas:
            set_ops_impl("pallas")
            t = timed(lambda x: spmm(gr, x), x0, tag=f"coo_pallas_{dname}")
            results[f"coo_pallas_{dname}"] = t
            print(f"coo    pallas {dname}: {t*1e3:7.2f} ms  "
                  f"{e_real/t/1e6:7.1f} Medges/s", flush=True)

        set_ops_impl("xla")
        t = timed(lambda x: spmm(hg, x), x0, tag=f"hyb_xla_{dname}")
        results[f"hyb_xla_{dname}"] = t
        print(f"hybrid xla    {dname}: {t*1e3:7.2f} ms  "
              f"{e_real/t/1e6:7.1f} Medges/s", flush=True)

        set_ops_impl("pallas")
        t = timed(lambda x: spmm(hg, x), x0, tag=f"hyb_pallas_{dname}")
        results[f"hyb_pallas_{dname}"] = t
        print(f"hybrid pallas {dname}: {t*1e3:7.2f} ms  "
              f"{e_real/t/1e6:7.1f} Medges/s", flush=True)
        set_ops_impl("auto")

        # parity (vs XLA COO, same dtype)
        set_ops_impl("xla")
        ref = np.asarray(spmm(gr, x0), np.float32)
        outs = {"hyb_xla": np.asarray(spmm(hg, x0), np.float32)}
        set_ops_impl("pallas")
        outs["hyb_pallas"] = np.asarray(spmm(hg, x0), np.float32)
        set_ops_impl("auto")
        for k, o in outs.items():
            scale = np.abs(ref).mean() + 1e-6
            err = np.abs(o - ref).max() / scale
            print(f"  parity {k} {dname}: max rel-to-mean err {err:.2e}",
                  flush=True)

    for dname in ("f32", "bf16"):
        base = results[f"coo_xla_{dname}"]
        best = min(v for k, v in results.items()
                   if k.startswith("hyb") and k.endswith(dname))
        print(json.dumps({
            "dtype": dname,
            "hybrid_best_ms": round(best * 1e3, 2),
            "coo_xla_ms": round(base * 1e3, 2),
            "speedup_vs_xla_coo": round(base / best, 2)}), flush=True)


if __name__ == "__main__":
    main()
