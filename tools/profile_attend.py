"""Piecewise timing of the tiled-attention pipeline (PERF_NOTES round-3
open lead: kernel ~9 ms but full attend ~46 ms — find where the other
~37 ms go).

Times each stage of ops/bcsr_attention.gat_tiled_attend in isolation with
the chained-iteration methodology (same as bench.py), on the 2M-edge
clustered community graph:

  nmax_tiles      bcsr_neighbor_max (Pallas tile scan over f_src)
  nmax_rem        COO remainder segment-max
  tile_parts      the _tile_parts Pallas kernel (num/den from tiles)
  rem_parts       sddmm + exp + aggregate + spmm_weighted on the remainder
  epilogue        num + num_r, den + den_r, divide
  full            gat_tiled_attend end to end

Usage: python tools/profile_attend.py [--dtype bfloat16] [--edges N]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), os.pardir, ".cache", "jax"))

    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.ops.bcsr_attention import (
        NEG, _leaky, _tile_parts, bcsr_neighbor_max)
    from graphneuralnetwork_tpu.ops.spmm import sddmm_additive, spmm_weighted
    from graphneuralnetwork_tpu.ops.aggregate import aggregate_edges
    from graphneuralnetwork_tpu.ops.bcsr_attention import gat_tiled_attend

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

    # fixed m for the isolated stages (value irrelevant for timing);
    # ONE jit so the precompute doesn't trickle through eager dispatch
    @jax.jit
    def _pre():
        nmax0 = bcsr_neighbor_max(bg, fs)
        m0 = jax.lax.stop_gradient(
            jnp.where(nmax0 > NEG / 2, _leaky(fd + nmax0, 0.2), 0.0))
        num0, den0 = _tile_parts(bg, bits, x, fs, fd, m0, 0.2, 1.0)
        return m0, num0, den0

    m0, num0, den0 = _pre()

    def timed(label, fn, *inputs):
        @jax.jit
        def chain(*ins):
            outs = list(ins)
            acc = None
            for _ in range(args.iters):
                out = fn(*outs)
                acc = out if acc is None else acc * 0.5 + out
                # perturb the first (float) input to defeat hoisting
                outs[0] = outs[0] + (acc[..., :1, :1].astype(outs[0].dtype)
                                     * 1e-6 if acc.ndim >= 2
                                     else acc.astype(outs[0].dtype) * 1e-6)
            return acc
        try:
            out = chain(*inputs)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        except Exception as ex:  # noqa: BLE001
            print(f"{label:14s} FAILED {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:100]}", flush=True)
            return
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(*inputs)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        print(f"{label:14s} {best / args.iters * 1e3:8.2f} ms", flush=True)

    timed("nmax_tiles", lambda f: bcsr_neighbor_max(bg, f), fs)

    def nmax_rem(f):
        gathered = jnp.where(rem.edge_mask[:, None], f[rem.senders], NEG)
        return jax.ops.segment_max(gathered, rem.receivers,
                                   num_segments=n, indices_are_sorted=True)
    timed("nmax_rem", nmax_rem, fs)

    def tile_parts(xx):
        return _tile_parts(bg, bits, xx, fs, fd, m0, 0.2, 1.0)[0]
    timed("tile_parts", tile_parts, x)

    def rem_parts(xx):
        sc = sddmm_additive(rem.senders, rem.receivers, fs, fd)
        sc = _leaky(sc, 0.2) - m0[rem.receivers]
        p = (rem.edge_weight[:, None] * rem.edge_mask[:, None]
             * jnp.exp(jnp.where(sc > 0, 0.0, sc)))
        return spmm_weighted(rem, p.astype(xx.dtype), xx) \
            + aggregate_edges(rem, p)[:, :, None].astype(xx.dtype)
    timed("rem_parts", rem_parts, x)

    def epilogue(nn_):
        return (nn_ + num0.astype(nn_.dtype)) / jnp.maximum(
            den0 + den0, 1e-16)[:, :, None].astype(nn_.dtype)
    timed("epilogue", epilogue, num0)

    def full(xx):
        return gat_tiled_attend(hg, xx, fs, fd)
    timed("full", full, x)


if __name__ == "__main__":
    main()
