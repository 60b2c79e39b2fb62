"""Micro-bench: Pallas HBM read bandwidth — automatic pipeline vs manual
multi-slot DMA.

PERF_NOTES.md: the automatic 2-deep pipeline plateaus at ~200-300 GB/s
sequential reads vs XLA's ~620 GB/s streaming. This tests whether manually
issuing N outstanding DMAs from an ANY-space ref breaks that wall. A pure
row-sum reduce kernel isolates read bandwidth (output is tiny).

Usage: python tools/bench_dma.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, F = 2_097_152, 128          # 1 GiB f32 input
CHUNK = 1024                   # rows per DMA (512 KiB)
N_CHUNKS = M // CHUNK
ITERS = 10


def reduce_auto(x):
    """Automatic pipeline: grid over chunks, BlockSpec-driven DMA."""
    def kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(N_CHUNKS,),
        in_specs=[pl.BlockSpec((CHUNK, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
    )(x)


def reduce_manual(x, n_buffers):
    """Manual DMA: single program, n_buffers outstanding copies."""
    def kernel(x_hbm, o_ref):
        def body(scratch, sem):
            def get_dma(slot, chunk):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(chunk * CHUNK, CHUNK)],
                    scratch.at[slot], sem.at[slot])

            for s in range(n_buffers):
                get_dma(s, s).start()

            def loop(i, acc):
                slot = i % n_buffers
                get_dma(slot, i).wait()
                acc += jnp.sum(scratch[slot], axis=0, keepdims=True)

                @pl.when(i + n_buffers < N_CHUNKS)
                def _():
                    get_dma(slot, i + n_buffers).start()
                return acc

            acc = jax.lax.fori_loop(
                0, N_CHUNKS, loop, jnp.zeros((1, F), jnp.float32))
            o_ref[:] = jnp.broadcast_to(acc, o_ref.shape)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buffers, CHUNK, F), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((n_buffers,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
    )(x)


def reduce_xla(x):
    return jnp.broadcast_to(jnp.sum(x, axis=0, keepdims=True), (8, F))


def timed(fn, name):
    @jax.jit
    def chain(x):
        out = jnp.zeros((8, F), jnp.float32)
        for _ in range(ITERS):
            out = out + fn(x + out[0, 0] * 1e-30)
        return out
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, F)),
                    dtype=jnp.float32)
    out = chain(x)
    _ = np.asarray(out[-1, -1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x)
        _ = np.asarray(out[-1, -1])
        best = min(best, time.perf_counter() - t0)
    sec = best / ITERS
    gbs = M * F * 4 / sec / 1e9
    print(f"{name:24s} {sec*1e3:8.2f} ms   {gbs:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    timed(reduce_xla, "xla row-sum")
    timed(reduce_auto, "pallas auto pipeline")
    for nb in (2, 4, 8):
        timed(functools.partial(reduce_manual, n_buffers=nb),
              f"pallas manual x{nb}")
