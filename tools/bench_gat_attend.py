"""Benchmark: GAT attention aggregation — COO vs hybrid BCSR tiles.

Measures the full attention hot path (softmax stabiliser + exp +
weighted aggregation + denominator; GAT/models/layers.py:105-122
semantics) on the clustered 2M-edge community graph bench.py uses for
SpMM, at the large-graph setting where it matters (H heads × F features).

The COO path materialises [E, H·F] gathered messages (8.6 GB at
E=2M, H=8, F=128 f32) — the tiled path materialises nothing per-edge.

Usage: python tools/bench_gat_attend.py [--heads 8] [--feat 128]
       [--dtype float32|bfloat16] [--edges 2097152] [--dropout 0.0]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def clustered(n, e, comm, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int64)
    intra = rng.random(e) < 0.9
    base = (s // comm) * comm
    r = np.where(intra, np.minimum(base + rng.integers(0, comm, e), n - 1),
                 rng.integers(0, n, e))
    keep = s != r
    return s[keep].astype(np.int32), r[keep].astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=131072)
    ap.add_argument("--edges", type=int, default=2_097_152)
    ap.add_argument("--comm", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--grad", action="store_true",
                    help="benchmark forward+backward instead of forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.ops import edge_softmax, set_ops_impl
    from graphneuralnetwork_tpu.ops.bcsr_attention import gat_tiled_attend
    from graphneuralnetwork_tpu.ops.spmm import spmm_weighted

    s, r = clustered(args.nodes, args.edges, args.comm)
    e_real = len(s)
    hg = build_hybrid(s, r, args.nodes)
    gr = g.build_graph(s, r, args.nodes)
    print(f"edges={e_real} tiled_frac={hg.tiled_fraction:.3f} "
          f"tiles={hg.bcsr.tiles.shape[0]} fill={hg.bcsr.fill:.4f} "
          f"backend={jax.default_backend()}")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(
        size=(args.nodes, args.heads, args.feat)).astype(np.float32),
        dtype)
    fs = jnp.asarray(rng.normal(
        size=(args.nodes, args.heads)).astype(np.float32))
    fd = jnp.asarray(rng.normal(
        size=(args.nodes, args.heads)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    drop = args.dropout

    def coo_fwd(xx, a, b):
        sc = a[gr.senders] + b[gr.receivers]
        sc = jnp.where(sc > 0, sc, 0.2 * sc)
        al = edge_softmax(gr, sc)
        if drop > 0:
            al = al * jax.random.bernoulli(key, 1 - drop, al.shape) / (
                1 - drop)
        return spmm_weighted(gr, al.astype(xx.dtype), xx)

    def tiled_fwd(xx, a, b):
        return gat_tiled_attend(hg, xx, a, b, attn_dropout=drop,
                                dropout_rng=key if drop > 0 else None)

    def as_loss(fn):
        def loss(xx, a, b):
            return jnp.sum(fn(xx, a, b).astype(jnp.float32) * 1e-3)
        return jax.grad(loss, argnums=(0, 1, 2))

    def timed(fn, label):
        # Chain iterations inside ONE jit (dependency through the inputs)
        # so per-dispatch latency through the axon tunnel amortises away
        # — same scheme as bench.py.
        if args.grad:
            gfn = as_loss(fn)

            def step(carry, _):
                xx, a, b = carry
                dx, da, db = gfn(xx, a, b)
                return (xx * 0.5 + dx.astype(xx.dtype) * 1e-3,
                        a + da * 1e-6, b + db * 1e-6), None
        else:
            def step(carry, _):
                xx, a, b = carry
                out = fn(xx, a, b)
                return (xx * 0.5 + out * 1e-3,
                        a + out[:, :, 0].astype(a.dtype) * 1e-6, b), None

        @jax.jit
        def chain(xx, a, b):
            (xx, a, b), _ = jax.lax.scan(step, (xx, a, b), None,
                                         length=args.iters)
            # scalar return: syncing a full [N, H, F] through the relay
            # costs seconds per rep and block_until_ready undercounts
            # (verify SKILL.md) — a 4-byte transfer is the honest sync
            return xx.ravel()[0].astype(jnp.float32)

        try:
            _ = np.asarray(chain(x, fs, fd))
        except Exception as ex:  # noqa: BLE001 — report OOM etc. and move on
            print(f"{label:28s} FAILED: {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:120]}")
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chain(x, fs, fd))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{label:28s} {best*1e3:8.2f} ms   "
              f"{e_real/best/1e6:8.1f} Medges/s")
        return best

    t_coo = timed(coo_fwd, "COO edge_softmax+spmm_w")
    set_ops_impl("xla")
    t_xla = timed(tiled_fwd, "tiled XLA chunk-scan")
    set_ops_impl("auto")
    t_pal = timed(tiled_fwd, "tiled Pallas kernel")
    if t_coo and t_pal:
        print(f"speedup vs COO: {t_coo/t_pal:.2f}x (pallas), "
              f"{t_coo/t_xla:.2f}x (xla)" if t_xla else "")


if __name__ == "__main__":
    main()
