"""Micro-bench: decompose SpMM stages on the real TPU.

Usage: python tools/bench_kernel.py [f32|bf16]
Chain-in-jit timing per .claude/skills/verify/SKILL.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import graphneuralnetwork_tpu as g
from graphneuralnetwork_tpu.ops import spmm, set_ops_impl
from graphneuralnetwork_tpu.ops.pallas import spmm_kernel as K

N, E, F, ITERS = 131072, 2_097_152, 128, 10
DTYPE = sys.argv[1] if len(sys.argv) > 1 else "f32"

rng = np.random.default_rng(0)
s = rng.integers(0, N, E)
r = rng.integers(0, N, E)
gr = g.build_graph(s, r, N)
x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
if DTYPE == "bf16":
    x0 = x0.astype(jnp.bfloat16)

lo, cnt, mc = K.compute_chunk_spans(np.asarray(gr.receivers), N)
print(f"spans: max_chunks={mc} avg_cnt={cnt.mean():.2f} "
      f"n_row_blocks={len(cnt)} n_chunks={gr.receivers.shape[0]//K.EDGE_CHUNK}",
      flush=True)


def timed(fn, name):
    @jax.jit
    def chain(gr, x):
        for _ in range(ITERS):
            out = fn(gr, x)
            x = out * 1e-3 + x * 0.5
        return x
    out = chain(gr, x0)
    _ = np.asarray(out[-1, -1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(gr, x0)
        _ = np.asarray(out[-1, -1])
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:28s} {ms:8.2f} ms   {E/(best/ITERS)/1e6:7.1f} Me/s", flush=True)
    return ms


def gather_only(gr, x):
    out = x[gr.senders] * gr.weights[:, None].astype(x.dtype)
    # reduce to (N, F) so the chain can feed back
    return out[:N]


def agg_only(gr, x):
    # feed the kernel a precomputed (E, F) "gathered" without the gather:
    # tile x rows cyclically (cheap reshape-free slice) — traffic identical.
    e_pad = gr.receivers.shape[0]
    reps = e_pad // N
    gathered = jnp.concatenate([x] * reps, 0)
    recv_col = gr.receivers.reshape(e_pad, 1)
    return K._spmm_pallas_call(
        gr.chunk_off, gr.chunk_cnt, recv_col, gathered, N,
        int(gr.max_chunks))


timed(spmm, "pallas spmm full")
set_ops_impl("xla")
timed(spmm, "xla spmm full")
set_ops_impl("auto")
timed(gather_only, "gather+scale only")
timed(agg_only, "agg kernel only (no gather)")
