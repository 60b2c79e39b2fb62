"""GTN scale demonstration: the wedge-plan SparseGTN vs the dense GTN
at a node count where the dense [T, N, N] stack stops being viable.

At N=16384 with T=5 edge types the dense stack alone is 5.4 GB f32 and
every GTLayer composition is an O(C·N³) bmm; the sparse plan stores
O(nnz + wedges). This script builds a sparse 4-type + identity stack,
times one SparseGTN training step, and attempts the dense equivalent
(expected to fail to compile/fit or be far slower — reported either way).

Usage: python tools/bench_gtn_scale.py [--nodes 16384] [--deg 6]
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
    ap.add_argument("--nodes", type=int, default=16384)
    ap.add_argument("--deg", type=int, default=6)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--try-dense", action="store_true",
                    help="also attempt the dense [T,N,N] model")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

    from graphneuralnetwork_tpu.nn.gtn_sparse import (SparseGTN,
                                                      build_gtn_plan)

    rng = np.random.default_rng(0)
    n, d = args.nodes, args.deg
    adjs = []
    for t in range(4):
        s = np.repeat(np.arange(n, dtype=np.int64), d)
        r = ((s // 128) * 128 + rng.integers(0, 128, n * d)) % n
        adjs.append((s, r, np.ones(n * d, np.float32)))
    eye = np.arange(n, dtype=np.int64)
    adjs.append((eye, eye, np.ones(n, np.float32)))

    t0 = time.perf_counter()
    plan = build_gtn_plan(adjs, n, num_layers=2)
    print(f"plan build {time.perf_counter() - t0:.1f} s: "
          f"nnz per layer {plan.nnz}, wedges {plan.wedge_counts} "
          f"(dense stack would be "
          f"{5 * n * n * 4 / 1e9:.1f} GB)", flush=True)

    x = jnp.asarray(rng.normal(size=(n, args.feat)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, args.classes, n), jnp.int32)
    model = SparseGTN(num_classes=args.classes, channels=2, num_layers=2,
                      hidden=64, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), plan, x)["params"]
    tx = optax.adamw(5e-3)
    opt = tx.init(params)

    def loss_fn(p, xx, pl):
        logits = model.apply({"params": p}, pl, xx)
        return -jax.nn.log_softmax(logits)[
            jnp.arange(n), labels].mean()

    # plan passed as a jit ARGUMENT — closing over its 10M+-wedge index
    # arrays embeds them as HLO constants and the remote compile rejects
    # the request (HTTP 413)
    @jax.jit
    def steps(params, opt, xx, pl):
        def body(carry, _):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(p, xx, pl)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss
        (params, opt), losses = jax.lax.scan(body, (params, opt), None,
                                             length=args.iters)
        return params, opt, losses

    params2, opt2, losses = steps(params, opt, x, plan)
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, losses = steps(params, opt, x, plan)
        _ = float(losses[-1])
        best = min(best, (time.perf_counter() - t0) / args.iters)
    print(f"SparseGTN train step: {best * 1e3:.1f} ms "
          f"(loss {float(losses[-1]):.4f} finite="
          f"{np.isfinite(float(losses[-1]))})", flush=True)

    if args.try_dense:
        from graphneuralnetwork_tpu.nn import GTN
        try:
            a_dense = np.zeros((5, n, n), np.float32)
            for t, (s, r, w) in enumerate(adjs):
                a_dense[t][s, r] = w
            dense = GTN(num_classes=args.classes, channels=2,
                        num_layers=2, hidden=64, dtype=jnp.bfloat16)
            ad = jnp.asarray(a_dense)
            dp = dense.init(jax.random.PRNGKey(0), ad, x)["params"]
            t0 = time.perf_counter()
            out = dense.apply({"params": dp}, ad, x)
            _ = float(out[0, 0])
            print(f"dense GTN forward: {time.perf_counter() - t0:.1f} s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001 — expected to fail at scale
            print(f"dense GTN FAILED as expected: {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
