"""Real-TPU parity spot check: fused tiled attention (Pallas) vs the COO
edge-softmax oracle on a small clustered graph — forward, gradients, and
dropout statistics. The CPU suite covers the XLA formulation; this
exercises the actual Pallas kernels (`_fused_pallas`, `_nmax_pallas`).

Usage: python tools/tpu_spot_attend.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
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

    rng = np.random.default_rng(0)
    n, comm, e = 640, 128, 6000
    s = rng.integers(0, n, e)
    base = (s // comm) * comm
    r = np.where(rng.random(e) >= 0.15, base + rng.integers(0, comm, e),
                 rng.integers(0, n, e))
    keep = s != r
    s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
    hg = build_hybrid(s, r, n, min_edges_per_tile=64)
    gr = g.build_graph(s, r, n)
    print(f"tiles={hg.bcsr.tiles.shape[0]} tiled={hg.tiled_fraction:.2f} "
          f"backend={jax.default_backend()}", flush=True)

    heads, feat = 4, 32
    x = jnp.asarray(rng.normal(size=(n, heads, feat)).astype(np.float32))
    fs = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    fd = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(n, heads, feat)).astype(np.float32))

    @jax.jit
    def coo(xx, a, b):
        sc = a[gr.senders] + b[gr.receivers]
        sc = jnp.where(sc > 0, sc, 0.2 * sc)
        al = edge_softmax(gr, sc)
        return spmm_weighted(gr, al.astype(xx.dtype), xx)

    @jax.jit
    def tiled(xx, a, b):
        return gat_tiled_attend(hg, xx, a, b)

    out_t = np.asarray(tiled(x, fs, fd))
    out_c = np.asarray(coo(x, fs, fd))
    err = np.abs(out_t - out_c).max()
    print(f"fwd max|Δ| = {err:.2e}", flush=True)
    assert err < 5e-5, err

    def loss_t(xx, a, b):
        return jnp.sum(gat_tiled_attend(hg, xx, a, b) * c)

    def loss_c(xx, a, b):
        sc = a[gr.senders] + b[gr.receivers]
        sc = jnp.where(sc > 0, sc, 0.2 * sc)
        al = edge_softmax(gr, sc)
        return jnp.sum(spmm_weighted(gr, al.astype(xx.dtype), xx) * c)

    gt = [np.asarray(v) for v in jax.jit(
        jax.grad(loss_t, argnums=(0, 1, 2)))(x, fs, fd)]
    gc = [np.asarray(v) for v in jax.jit(
        jax.grad(loss_c, argnums=(0, 1, 2)))(x, fs, fd)]
    gerr = max(np.abs(a - b).max() for a, b in zip(gt, gc))
    print(f"grad max|Δ| = {gerr:.2e}", flush=True)
    assert gerr < 2e-4, gerr

    # Pallas-vs-XLA on the SAME fused path (implementation parity)
    set_ops_impl("xla")
    out_x = np.asarray(jax.jit(
        lambda xx, a, b: gat_tiled_attend(hg, xx, a, b))(x, fs, fd))
    set_ops_impl("auto")
    ierr = np.abs(out_t - out_x).max()
    print(f"pallas-vs-xla max|Δ| = {ierr:.2e}", flush=True)
    assert ierr < 5e-5, ierr

    # dropout smoke on the Pallas path: unbiasedness + finite
    outs = []
    for i in range(8):
        outs.append(np.asarray(jax.jit(
            lambda xx, a, b, k: gat_tiled_attend(
                hg, xx, a, b, attn_dropout=0.4, dropout_rng=k))(
                    x, fs, fd, jax.random.PRNGKey(i))))
    m = np.stack(outs).mean(0)
    rel = np.abs(m - out_t).mean() / max(np.abs(out_t).mean(), 1e-9)
    print(f"dropout mean-rel-err over 8 draws = {rel:.3f}", flush=True)
    assert np.isfinite(np.stack(outs)).all()
    assert rel < 0.4, rel
    print("TPU fused-attention spot check: PASS", flush=True)


if __name__ == "__main__":
    main()
