"""Piecewise timing of the tiled-attention pipeline (PERF_NOTES round-3
open lead: kernel ~9 ms but full attend ~46 ms — find where the other
~37 ms go).

Times each stage of ops/bcsr_attention.gat_tiled_attend in isolation with
the chained-iteration methodology (same as bench.py), on the 2M-edge
clustered community graph. All graph containers are passed as jit
ARGUMENTS — closing over them embeds 100MB+ constants into the HLO and
the remote compile endpoint rejects the request (HTTP 413).

Usage: python tools/profile_attend.py [--dtype bfloat16] [--edges N]
       [--min-edges-per-tile 192] [--stages nmax_tiles,tile_parts,...]
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
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=131072)
    ap.add_argument("--edges", type=int, default=2_097_152)
    ap.add_argument("--comm", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--min-edges-per-tile", type=int, default=192)
    ap.add_argument("--stages", default=None,
                    help="comma list: nmax_tiles,nmax_rem,tile_parts,"
                         "rem_parts,epilogue,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), os.pardir, ".cache", "jax"))

    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.ops.bcsr_attention import (
        NEG, _leaky, _tile_parts, bcsr_neighbor_max, gat_tiled_attend)
    from graphneuralnetwork_tpu.ops.spmm import sddmm_additive, spmm_weighted
    from graphneuralnetwork_tpu.ops.aggregate import aggregate_edges

    rng = np.random.default_rng(0)
    n, e, comm = args.nodes, args.edges, args.comm
    s = rng.integers(0, n, e).astype(np.int64)
    intra = rng.random(e) < 0.9
    base = (s // comm) * comm
    r = np.where(intra, np.minimum(base + rng.integers(0, comm, e), n - 1),
                 rng.integers(0, n, e))
    keep = s != r
    s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
    hg = build_hybrid(s, r, n,
                      min_edges_per_tile=args.min_edges_per_tile)
    bg, rem = hg.bcsr, hg.rem
    print(f"edges={len(s)} tiled={hg.tiled_fraction:.3f} "
          f"tiles={bg.tiles.shape[0]} fill={bg.fill:.4f} "
          f"rem_edges={rem.n_edges} backend={jax.default_backend()}",
          flush=True)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    heads, feat = args.heads, args.feat
    x = jnp.asarray(rng.normal(size=(n, heads, feat)).astype(np.float32),
                    dtype)
    fs = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    fd = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    bits = jnp.zeros((bg.tiles.shape[0], 1, 1), jnp.uint32)
    # fixed m/num/den stand-ins (values irrelevant for stage timing)
    m0 = jnp.zeros((n, heads), jnp.float32)
    num0 = jnp.ones((n, heads, feat), jnp.float32)
    den0 = jnp.ones((n, heads), jnp.float32)

    def timed(label, fn, *inputs):
        """fn(*inputs) -> array; every input (incl. graph pytrees) is a
        jit argument. The chain perturbs the last (float) input per
        iteration to defeat hoisting, and returns a SCALAR — syncing by
        transferring the full output through the relay costs seconds per
        rep (536 MB for an [N, H, F] f32) and swamps the measurement."""

        @jax.jit
        def chain(*ins):
            ins = list(ins)
            acc = None
            for _ in range(args.iters):
                out = fn(*ins)
                acc = out if acc is None else acc * 0.5 + out
                bump = jnp.asarray(acc).ravel()[0] * 1e-6
                ins[-1] = ins[-1] + bump.astype(ins[-1].dtype)
            return jnp.asarray(acc).ravel()[0]

        try:
            _ = np.asarray(chain(*inputs))
        except Exception as ex:  # noqa: BLE001
            print(f"{label:14s} FAILED {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:110]}", flush=True)
            return
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chain(*inputs))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:14s} {best / args.iters * 1e3:8.2f} ms", flush=True)

    want = set(args.stages.split(",")) if args.stages else None

    def on(name):
        return want is None or name in want

    if on("nmax_tiles"):
        timed("nmax_tiles", lambda b, f: bcsr_neighbor_max(b, f), bg, fs)

    if on("nmax_rem"):
        def nmax_rem(g_, f):
            gathered = jnp.where(g_.edge_mask[:, None], f[g_.senders], NEG)
            return jax.ops.segment_max(gathered, g_.receivers,
                                       num_segments=n,
                                       indices_are_sorted=True)
        timed("nmax_rem", nmax_rem, rem, fs)

    if on("tile_parts"):
        timed("tile_parts",
              lambda b, m, xx: _tile_parts(b, bits, xx, fs, fd, m,
                                           0.2, 1.0)[0],
              bg, m0, x)

    if on("rem_parts"):
        def rem_parts(g_, m, xx):
            sc = sddmm_additive(g_.senders, g_.receivers, fs, fd)
            sc = _leaky(sc, 0.2) - m[g_.receivers]
            p = (g_.edge_weight[:, None] * g_.edge_mask[:, None]
                 * jnp.exp(jnp.where(sc > 0, 0.0, sc)))
            return spmm_weighted(g_, p.astype(xx.dtype), xx) \
                + aggregate_edges(g_, p)[:, :, None].astype(xx.dtype)
        timed("rem_parts", rem_parts, rem, m0, x)

    if on("epilogue"):
        def epilogue(nmr, dnr, nn_):
            return (nn_ + nmr.astype(nn_.dtype)) / jnp.maximum(
                dnr + dnr, 1e-16)[:, :, None].astype(nn_.dtype)
        timed("epilogue", epilogue, num0, den0,
              num0.astype(dtype))

    if on("full"):
        timed("full", lambda g_, xx: gat_tiled_attend(g_, xx, fs, fd),
              hg, x)


if __name__ == "__main__":
    main()
