"""Interpret-mode CI coverage of the one-kernel online-softmax attend.

The kernel (ops/pallas/attend_online_kernel.py) normally runs only on
real TPU hardware; Pallas interpret mode executes the same kernel logic
on CPU, so the grid/one-hot/online-max machinery is regression-tested
in CI against the XLA composition that gat_tiled_attend uses off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from graphneuralnetwork_tpu.core.bcsr import build_hybrid
from graphneuralnetwork_tpu.ops.bcsr_attention import (NEG, _pad_rows,
                                                       gat_tiled_attend)
from graphneuralnetwork_tpu.ops.pallas.attend_online_kernel import (
    attend_online_pallas)


def _fixture(seed=0, n=512, e=8192, comm=64, heads=4, feat=32,
             symmetric=False):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int64)
    intra = rng.random(e) < 0.9
    base = (s // comm) * comm
    r = np.where(intra,
                 np.minimum(base + rng.integers(0, comm, e), n - 1),
                 rng.integers(0, n, e))
    keep = s != r
    s, r = s[keep], r[keep]
    if symmetric:
        from graphneuralnetwork_tpu.core.graph import symmetrize
        s, r = symmetrize(s, r)
    hg = build_hybrid(s.astype(np.int32), r.astype(np.int32),
                      n, min_edges_per_tile=48, symmetric=symmetric)
    x = jnp.asarray(rng.normal(size=(n, heads, feat)).astype(np.float32))
    fs = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    fd = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    return hg, x, fs, fd


def _run_kernel(hg, x, fs, fd, slope=0.2, bits=None, keep_mul=None,
                keep_prob=1.0):
    bg, rem = hg.bcsr, hg.rem
    n, heads, feat = x.shape
    n_pad = bg.n_node_pad
    if bits is None:
        bits = jnp.zeros((bg.tiles.shape[0], 1, 1), jnp.uint32)
    x2f = _pad_rows(x.reshape(n, heads * feat), n_pad)
    fsp = _pad_rows(fs, n_pad).T
    fdp = _pad_rows(fd, n_pad)
    fsg = fs[rem.senders]
    w_col = (rem.edge_weight
             * rem.edge_mask).astype(jnp.float32).reshape(-1, 1)
    xg = x.reshape(n, heads * feat)[rem.senders]
    from graphneuralnetwork_tpu.core.bcsr import ATTEND_CHUNK
    return attend_online_pallas(
        bg.tile_off, bg.tile_cnt, bg.col_ids, hg.rem_fine_off,
        hg.rem_fine_cnt, bg.tiles, bits, x2f, fsp,
        rem.receivers.reshape(-1, 1), fsg, w_col, xg, keep_mul, fdp,
        heads, feat, n, bg.max_tiles, hg.rem_fine_max, slope,
        keep_prob, keep_prob < 1.0, keep_mul is not None,
        interpret=True, echunk=ATTEND_CHUNK)


def test_online_kernel_interpret_matches_xla_path():
    hg, x, fs, fd = _fixture()
    n, heads, feat = x.shape
    out, den, m = _run_kernel(hg, x, fs, fd)
    out = np.asarray(out[:n]).reshape(n, heads, feat)
    ref = np.asarray(gat_tiled_attend(hg, x, fs, fd))  # XLA path on CPU
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    # the emitted shift m is the exact per-(node, head) score max where
    # a node has in-edges, NEG-ish where it has none (den == 0)
    den = np.asarray(den[:n])
    m = np.asarray(m[:n])
    assert np.isfinite(out).all()
    assert (m[den == 0] < NEG / 2).all()
    # spot-check m against a dense recompute
    s_all = np.asarray(hg.rem.senders)
    r_all = np.asarray(hg.rem.receivers)
    mask = np.asarray(hg.rem.edge_mask)
    fs_np, fd_np = np.asarray(fs), np.asarray(fd)
    expect = np.full((n, heads), -np.inf)
    for u, v in zip(s_all[mask], r_all[mask]):
        sc = fs_np[u] + fd_np[v]
        sc = np.where(sc > 0, sc, 0.2 * sc)
        expect[v] = np.maximum(expect[v], sc)
    tiles = np.asarray(hg.bcsr.tiles)
    cid = np.asarray(hg.bcsr.col_ids)
    rid = np.asarray(hg.bcsr.row_ids)
    for t in range(tiles.shape[0]):
        rr, cc = np.nonzero(tiles[t])
        for i, j in zip(rr, cc):
            v = rid[t] * 128 + i
            u = cid[t] * 128 + j
            if v < n and u < n:
                sc = fs_np[u] + fd_np[v]
                sc = np.where(sc > 0, sc, 0.2 * sc)
                expect[v] = np.maximum(expect[v], sc)
    have = expect > -np.inf
    np.testing.assert_allclose(m[have], expect[have], rtol=1e-5,
                               atol=1e-5)


def test_online_kernel_interpret_extreme_logits():
    hg, x, fs, fd = _fixture(seed=1)
    n, heads, feat = x.shape
    out, _, _ = _run_kernel(hg, x, 50.0 * fs, 50.0 * fd)
    out = np.asarray(out[:n]).reshape(n, heads, feat)
    ref = np.asarray(gat_tiled_attend(hg, x, 50.0 * fs, 50.0 * fd))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_bwd_kernels_interpret_match_xla_grads():
    """The two-pass kernel backward (pass A dfd; pass B dx+dfs over the
    transpose layout) equals jax.grad of the XLA attend composition."""
    from graphneuralnetwork_tpu.ops.bcsr_attention import (
        _attend_bwd_kernels)

    hg, x, fs, fd = _fixture(seed=2)
    n, heads, feat = x.shape
    out, den, m = _run_kernel(hg, x, fs, fd)
    den = den[:n]
    m = jnp.where(den > 0, m[:n], 0.0)
    out3 = out[:n].reshape(n, heads, feat)
    g = jnp.asarray(np.random.default_rng(5).normal(
        size=(n, heads, feat)).astype(np.float32))

    bits = jnp.zeros((hg.bcsr.tiles.shape[0], 1, 1), jnp.uint32)
    dx, dfs, dfd = _attend_bwd_kernels(hg, bits, None, x, fs, fd, m,
                                       out3, den, g, 0.2, 1.0,
                                       interpret=True)

    def loss(xx, a, b):
        return jnp.sum(gat_tiled_attend(hg, xx, a, b) * g)

    rdx, rdfs, rdfd = jax.grad(loss, argnums=(0, 1, 2))(x, fs, fd)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dfs), np.asarray(rdfs),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dfd), np.asarray(rdfd),
                               rtol=5e-4, atol=5e-5)


def test_bwd_kernels_interpret_symmetric_tiles_with_dropout():
    """The CLI GAT path builds symmetric hybrids (bcsr_t IS bcsr): the
    transpose pass then walks the SAME tiles reinterpreted — by edge-set
    symmetry w(a,b)[i,j] == w(b,a)[j,i], so directed-edge coverage and
    the transposed dropout lattice stay exact. Verified against
    jax.grad of the XLA composition with identical masks."""
    from graphneuralnetwork_tpu.core.bcsr import COL_BLOCK, ROW_BLOCK
    from graphneuralnetwork_tpu.ops.bcsr_attention import (
        _attend_bwd_kernels)

    hg, x, fs, fd = _fixture(seed=4, symmetric=True)
    n, heads, feat = x.shape
    rng = jax.random.PRNGKey(13)
    kp = 0.7
    bits = jax.random.bits(
        jax.random.fold_in(rng, 0),
        (hg.bcsr.tiles.shape[0], ROW_BLOCK, COL_BLOCK), jnp.uint32)
    keep = jax.random.bernoulli(
        jax.random.fold_in(rng, 1), kp,
        (hg.rem.senders.shape[0], heads))
    keep_mul = keep.astype(jnp.float32) / kp

    out, den, m = _run_kernel(hg, x, fs, fd, bits=bits,
                              keep_mul=keep_mul, keep_prob=kp)
    den = den[:n]
    m = jnp.where(den > 0, m[:n], 0.0)
    out3 = out[:n].reshape(n, heads, feat)
    g = jnp.asarray(np.random.default_rng(8).normal(
        size=(n, heads, feat)).astype(np.float32))
    dx, dfs, dfd = _attend_bwd_kernels(hg, bits, keep_mul, x, fs, fd, m,
                                       out3, den, g, 0.2, kp,
                                       interpret=True)

    def loss(xx, a, b):
        return jnp.sum(gat_tiled_attend(
            hg, xx, a, b, attn_dropout=1.0 - kp, dropout_rng=rng) * g)

    rdx, rdfs, rdfd = jax.grad(loss, argnums=(0, 1, 2))(x, fs, fd)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dfs), np.asarray(rdfs),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dfd), np.asarray(rdfd),
                               rtol=5e-4, atol=5e-5)


def test_bwd_kernels_interpret_dropout_matches_xla_grads():
    """With attention dropout, the backward kernels must see the SAME
    Bernoulli draws as the forward — pass B through the transposed
    lattice / permuted remainder multiplier (HybridGraph alignment
    maps). Reference: jax.grad of the XLA composition, which consumes
    identical mask operands (drawn from the same rng folds)."""
    from graphneuralnetwork_tpu.core.bcsr import COL_BLOCK, ROW_BLOCK
    from graphneuralnetwork_tpu.ops.bcsr_attention import (
        _attend_bwd_kernels)

    hg, x, fs, fd = _fixture(seed=3)
    n, heads, feat = x.shape
    rng = jax.random.PRNGKey(11)
    drop, kp = 0.4, 0.6
    # same draws gat_tiled_attend makes (fold 0 = tile lattice,
    # fold 1 = remainder keep)
    bits = jax.random.bits(
        jax.random.fold_in(rng, 0),
        (hg.bcsr.tiles.shape[0], ROW_BLOCK, COL_BLOCK), jnp.uint32)
    keep = jax.random.bernoulli(
        jax.random.fold_in(rng, 1), kp,
        (hg.rem.senders.shape[0], heads))
    keep_mul = keep.astype(jnp.float32) / kp

    out, den, m = _run_kernel(hg, x, fs, fd, bits=bits,
                              keep_mul=keep_mul, keep_prob=kp)
    den = den[:n]
    m = jnp.where(den > 0, m[:n], 0.0)
    out3 = out[:n].reshape(n, heads, feat)
    g = jnp.asarray(np.random.default_rng(7).normal(
        size=(n, heads, feat)).astype(np.float32))

    dx, dfs, dfd = _attend_bwd_kernels(hg, bits, keep_mul, x, fs, fd, m,
                                       out3, den, g, 0.2, kp,
                                       interpret=True)

    def loss(xx, a, b):
        return jnp.sum(gat_tiled_attend(
            hg, xx, a, b, attn_dropout=drop, dropout_rng=rng) * g)

    rdx, rdfs, rdfd = jax.grad(loss, argnums=(0, 1, 2))(x, fs, fd)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dfs), np.asarray(rdfs),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dfd), np.asarray(rdfd),
                               rtol=5e-4, atol=5e-5)


def test_online_kernel_interpret_bf16_tiles_binary_adjacency():
    """bf16 tile stores are exact for binary adjacencies (unit counts),
    so the kernel path with bf16 tiles must match the f32-tile XLA
    composition (the GAT CLI builds bf16 tiles under --dtype bfloat16)."""
    import dataclasses as _dc

    hg, x, fs, fd = _fixture(seed=5)
    n, heads, feat = x.shape
    hg_b = _dc.replace(
        hg, bcsr=_dc.replace(hg.bcsr,
                             tiles=hg.bcsr.tiles.astype(jnp.bfloat16)),
        bcsr_t=_dc.replace(hg.bcsr_t,
                           tiles=hg.bcsr_t.tiles.astype(jnp.bfloat16)))
    out, den, m = _run_kernel(hg_b, x, fs, fd)
    out = np.asarray(out[:n]).reshape(n, heads, feat)
    ref = np.asarray(gat_tiled_attend(hg, x, fs, fd))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
