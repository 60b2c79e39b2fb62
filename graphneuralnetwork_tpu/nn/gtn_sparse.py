"""Sparse GTN: learned metapath composition without dense [N, N] tensors.

The dense GTN (nn/gtn.py, mirroring GTN/models/GTLayer.py:25-30) stores
[C, N, N] channel adjacencies and composes them with batched matmuls —
O(N²) memory, fine for ACM-scale but a wall for larger graphs. This
module reformulates the whole model over STATIC sparsity patterns:

  * the pattern of every intermediate product is known at graph-build
    time (it depends only on the edge-type adjacency patterns, never on
    the learned mixing weights), so the host enumerates each
    composition's length-2 paths ("wedges") ONCE into flat index arrays
    (vectorised numpy — no per-edge Python loops);
  * on device, one composition step H' = D⁻¹(H + I) @ (Σ_u mix_u · A_u)
    is a gather + multiply + segment-sum over those wedge arrays —
    the same machinery as the framework's edge ops, fully jit-static;
  * learned parameters only ever enter as per-wedge scalars
    (mix[c, type]), so autodiff composes through the plan for free;
  * the final per-channel GCN conv is ``spmm_weighted`` with channels in
    the "heads" slot — the Pallas path on TPU.

Memory: O(Σ_l nnz(P_l) + Σ wedges) instead of O(T·N² + C·N²). Wedge
counts are the number of length-2 metapaths — host-checked at build; for
graphs whose products densify completely, fall back to the dense GTN.

Parameter tree is IDENTICAL to nn.GTN (gt{i}/conv{1,2}/weight, gcn_w,
linear1, linear2), so dense-trained params apply to the sparse model and
vice versa (parity-tested in tests/test_models.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph, build_graph


def _sorted_keys(pat, n):
    """CSR pattern → (rows, cols, sorted int64 keys row*n+col)."""
    pat = pat.tocsr()
    pat.sort_indices()
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(pat.indptr))
    cols = pat.indices.astype(np.int64)
    return rows, cols, rows * n + cols


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GTNPlan:
    """Host-precomputed composition plan (all leaves device arrays)."""

    # base mixture: type t's weights scattered into P0 via base_idx[t]
    base_idx: Tuple[jax.Array, ...]     # per type: int32[nnz_t] → P0 slot
    base_val: Tuple[jax.Array, ...]     # per type: f32[nnz_t]
    # per composition step s (s=0 composes Q1@Q2, s>=1 composes H@Q):
    step_h_idx: Tuple[jax.Array, ...]   # int32[W_s] into H value slots
    step_type: Tuple[jax.Array, ...]    # int32[W_s] edge-type u per wedge
    step_a_val: Tuple[jax.Array, ...]   # f32[W_s] A_u weight per wedge
    step_out: Tuple[jax.Array, ...]     # int32[W_s] into P_{s+1} slots
    step_row: Tuple[jax.Array, ...]     # int32[nnz_s] row of each H slot
    step_diag: Tuple[jax.Array, ...]    # int32[N] diag slot in P_s (-1 ∅)
    final_graph: Graph                  # P_L ∪ I as a padded device Graph
    final_edge_pos: jax.Array           # int32[nnz_L] → final real-edge slot
    final_diag: jax.Array               # int32[N] diagonal slots (final)
    nnz: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_types: int = dataclasses.field(metadata=dict(static=True))
    wedge_counts: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))


def _wedges(slot_csr, right, out_keys: np.ndarray, n: int):
    """Length-2 paths (i→j) ∈ left, (j→k) ∈ right, vectorised.

    ``slot_csr``: left pattern with data = H-slot-index + 1.
    Returns (h_slot, a_val, out_idx) with out_idx found by binary search
    into the sorted output-pattern keys."""
    left = slot_csr.tocsr()
    left.sort_indices()
    right = right.tocsr()
    right.sort_indices()
    li = np.repeat(np.arange(n, dtype=np.int64), np.diff(left.indptr))
    lj = left.indices.astype(np.int64)
    h_slots = (left.data - 1.0).astype(np.int64)
    deg_r = np.diff(right.indptr)
    counts = deg_r[lj]
    total = int(counts.sum())
    if total == 0:
        return (np.zeros(0, np.int32), np.zeros(0, np.float32),
                np.zeros(0, np.int32))
    rep_edge = np.repeat(np.arange(len(lj)), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                        counts)
    rpos = right.indptr[lj[rep_edge]] + offs
    k_idx = right.indices[rpos].astype(np.int64)
    a_val = right.data[rpos].astype(np.float32)
    i_idx = li[rep_edge]
    out_idx = np.searchsorted(out_keys, i_idx * n + k_idx)
    return (h_slots[rep_edge].astype(np.int32), a_val,
            out_idx.astype(np.int32))


def build_gtn_plan(adjs: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
                   n_nodes: int, num_layers: int = 2,
                   max_wedges: int = 250_000_000) -> GTNPlan:
    """``adjs``: per edge type (senders, receivers, weights) — the sparse
    form of the loader's [T, N, N] stack (identity slice included, as
    GTN/utils/data_utils.py:148 appends it).

    Convention matches the dense model: H[i, j] ≠ 0 ⇔ metapath i→j,
    compositions are row-major products H_next = H @ Q.
    """
    import scipy.sparse as sp

    n = n_nodes
    t_mats = [sp.csr_matrix((np.asarray(w, np.float32),
                             (np.asarray(s, np.int64),
                              np.asarray(r, np.int64))), shape=(n, n))
              for s, r, w in adjs]
    union = (sum((m != 0).astype(np.float32) for m in t_mats)
             != 0).astype(np.float32).tocsr()
    eye = sp.identity(n, np.float32, format="csr")

    def diag_slots(rows, cols, *, require_full=False):
        d = np.full(n, -1, np.int64)
        on = rows == cols
        d[rows[on]] = np.flatnonzero(on)
        if require_full and (d < 0).any():
            # the dense GTN normalises with D^-1(H + I) unconditionally;
            # without full diagonal support in the pattern the sparse
            # model would silently diverge from it, so refuse instead
            raise ValueError(
                "metapath composition pattern is missing diagonal "
                "entries — include the identity slice in the adjacency "
                "stack (GTN/utils/data_utils.py:148 appends it) so "
                "D^-1(H+I) normalisation matches the dense GTN")
        return d.astype(np.int32)

    # P0 = union pattern (the mixtures Q live on it)
    p_rows, p_cols, p_keys = _sorted_keys(union, n)
    base_idx, base_val = [], []
    for m in t_mats:
        mr, mc, mk = _sorted_keys((m != 0).astype(np.float32), n)
        m2 = m.tocsr()
        m2.sort_indices()
        base_idx.append(np.searchsorted(p_keys, mk).astype(np.int32))
        base_val.append(m2.data.astype(np.float32))

    step_h, step_t, step_a, step_o = [], [], [], []
    step_row, step_diag, wedge_counts = [], [], []
    nnz = [len(p_rows)]
    cur_pat = union
    cur_rows, cur_cols = p_rows, p_cols
    for s in range(num_layers):
        nxt = ((((cur_pat + eye) if s else cur_pat) @ union)
               != 0).astype(np.float32).tocsr()
        nxt_rows, nxt_cols, nxt_keys = _sorted_keys(nxt, n)

        step_row.append(cur_rows.astype(np.int32))
        # s=0 composes raw Q1@Q2 (no +I), so only later steps need the
        # full diagonal; P_s ⊇ I holds whenever the identity type is in
        # the stack (P_s = ... @ union ⊇ union ⊇ I)
        step_diag.append(diag_slots(cur_rows, cur_cols,
                                    require_full=(s > 0)))

        slot_csr = sp.csr_matrix(
            (np.arange(len(cur_rows), dtype=np.float64) + 1.0,
             (cur_rows, cur_cols)), shape=(n, n))
        hw, tw, aw, ow = [], [], [], []
        for u, m in enumerate(t_mats):
            h_slot, a_val, out_idx = _wedges(slot_csr, m, nxt_keys, n)
            hw.append(h_slot)
            tw.append(np.full(len(h_slot), u, np.int32))
            aw.append(a_val)
            ow.append(out_idx)
        W = sum(len(a) for a in hw)
        wedge_counts.append(W)
        if W > max_wedges:
            # the guard protects HOST plan-build memory (the vectorised
            # wedge enumeration holds several O(W) int64 arrays); on
            # DEVICE, SparseGTN streams oversized steps through a
            # lax.scan (wedge_block), so the old 50M device ceiling is
            # gone — raise max_wedges if the host has the RAM.
            raise ValueError(
                f"composition {s} needs {W} wedges (> {max_wedges}); "
                "raise max_wedges if the host has the RAM for the plan "
                "build, or use the dense GTN layout for this graph")
        cat = (lambda xs, d: np.concatenate(xs) if W else
               np.zeros(0, d))
        step_h.append(cat(hw, np.int32))
        step_t.append(cat(tw, np.int32))
        step_a.append(cat(aw, np.float32))
        step_o.append(cat(ow, np.int32))
        cur_pat, cur_rows, cur_cols = nxt, nxt_rows, nxt_cols
        nnz.append(len(nxt_rows))

    # final conv pattern: P_L ∪ I (add_eye normalisation before the conv)
    fi_rows, fi_cols, fi_keys = _sorted_keys(
        ((cur_pat + eye) != 0).astype(np.float32), n)
    # NOTE the orientation: H[i, j] weights neighbor j in row i's output
    # (z = H @ XW), so in the receiver-owned Graph sender=j, receiver=i.
    fg = build_graph(fi_cols, fi_rows, n)
    final_edge_pos = np.searchsorted(
        fi_keys, cur_rows * n + cur_cols).astype(np.int32)
    final_diag = np.searchsorted(
        fi_keys, np.arange(n, dtype=np.int64) * (n + 1)).astype(np.int32)

    dev = jnp.asarray
    return GTNPlan(
        base_idx=tuple(dev(a) for a in base_idx),
        base_val=tuple(dev(a) for a in base_val),
        step_h_idx=tuple(dev(a) for a in step_h),
        step_type=tuple(dev(a) for a in step_t),
        step_a_val=tuple(dev(a) for a in step_a),
        step_out=tuple(dev(a) for a in step_o),
        step_row=tuple(dev(a) for a in step_row),
        step_diag=tuple(dev(a) for a in step_diag),
        final_graph=fg,
        final_edge_pos=dev(final_edge_pos),
        final_diag=dev(final_diag),
        nnz=tuple(nnz),
        n_nodes=int(n),
        n_types=len(adjs),
        wedge_counts=tuple(wedge_counts),
    )


def stacked_adj_to_sparse(adj: np.ndarray):
    """[T, N, N] dense stack (the GTN loader's form) → per-type edge
    lists for ``build_gtn_plan``."""
    out = []
    for t in range(adj.shape[0]):
        r, c = np.nonzero(adj[t])
        out.append((r.astype(np.int64), c.astype(np.int64),
                    adj[t][r, c].astype(np.float32)))
    return out


class _GTMix(nn.Module):
    """Parameter-compatible stand-in for GTConv: returns the softmax
    mixing vector [C, T] instead of a mixed dense adjacency."""

    channels: int
    n_types: int

    @nn.compact
    def __call__(self) -> jax.Array:
        w = self.param("weight", nn.initializers.normal(0.1),
                       (self.channels, self.n_types), jnp.float32)
        return jax.nn.softmax(w, axis=-1)


class _GTLayerParams(nn.Module):
    """Owns conv1[/conv2] under the same scope names as nn.GTLayer."""

    channels: int
    n_types: int
    first: bool = True

    @nn.compact
    def __call__(self):
        m1 = _GTMix(self.channels, self.n_types, name="conv1")()
        if self.first:
            return m1, _GTMix(self.channels, self.n_types, name="conv2")()
        return m1, None


class SparseGTN(nn.Module):
    """GTN over a ``GTNPlan`` — same semantics and parameter tree as
    ``nn.GTN`` (parity-tested), O(nnz) instead of O(N²).

    Also accepts a ``parallel.gtn_sparse.ShardedGTNPlan``: compositions
    then run wedge-partitioned over the plan's device mesh (receiver-
    owned slots, one all_gather per step) with identical results.

    ``wedge_block`` bounds the per-step device working set: steps whose
    channel-folded wedge count exceeds it stream through a lax.scan of
    that chunk size (peak memory O(wedge_block + C·nnz) instead of
    O(C·W)), which is what breaks the old 50M-wedge ceiling."""

    num_classes: int
    channels: int = 2
    num_layers: int = 2
    hidden: int = 64
    dtype: Optional[jnp.dtype] = None
    wedge_block: int = 8_000_000

    @nn.compact
    def __call__(self, plan: GTNPlan, x: jax.Array,
                 *, deterministic: bool = True):
        C = self.channels
        n = plan.n_nodes

        def mixture(mix):
            """H0[c] values on P0: Σ_t mix[c, t] · A_t."""
            vals = jnp.zeros((C, plan.nnz[0]), jnp.float32)
            for t in range(plan.n_types):
                vals = vals.at[:, plan.base_idx[t]].add(
                    mix[:, t:t + 1] * plan.base_val[t][None, :])
            return vals

        def add_eye(vals, diag):
            safe = jnp.maximum(diag, 0)
            bump = (diag >= 0).astype(jnp.float32)
            return vals.at[:, safe].add(bump[None, :])

        def normalize(vals, row, diag):
            """D⁻¹(H + I) values on the same pattern (I ⊆ P whenever the
            identity edge-type is in the stack; missing diagonals are
            simply not bumped)."""
            vals = add_eye(vals, diag)
            deg = jax.ops.segment_sum(vals.T, row, num_segments=n).T
            return vals / jnp.maximum(deg[:, row], 1e-12)

        def compose(h_vals, mix, s):
            """H' = h @ (Σ_u mix_u A_u) via the wedge plan of step s.

            Flattened formulation: channels fold into the gather/scatter
            ids so every array is 1-D. The [W, C] form OOMed at scale —
            XLA copied the wedge tensor into a (8,128)-tiled layout in
            the backward pass, padding C=2 lanes to 128 (64× expansion,
            14.6 GB at 30M wedges)."""
            if hasattr(plan, "mesh"):      # ShardedGTNPlan: wedge-
                from ..parallel.gtn_sparse import compose_sharded
                return compose_sharded(plan, h_vals, mix, s, C)
            nnz_in, nnz_out = plan.nnz[s], plan.nnz[s + 1]
            n_t = plan.n_types
            ch = jnp.arange(C, dtype=jnp.int32)[:, None]
            gidx = (ch * nnz_in + plan.step_h_idx[s][None, :]).reshape(-1)
            oidx = (ch * nnz_out + plan.step_out[s][None, :]).reshape(-1)
            cidx = (ch * n_t + plan.step_type[s][None, :]).reshape(-1)
            aval = jnp.tile(plan.step_a_val[s], C)
            total = C * plan.wedge_counts[s]
            if total <= self.wedge_block:
                coef = mix.reshape(-1)[cidx] * aval
                vals = h_vals.reshape(-1)[gidx] * coef           # [C·W]
                out = jax.ops.segment_sum(vals, oidx,
                                          num_segments=C * nnz_out)
                return out.reshape(C, nnz_out)
            # blocked composition: stream wedge chunks through one
            # lax.scan — the [C·W] gathered-values tensor (the old 50M-
            # wedge memory ceiling) never materialises; peak extra
            # memory is one wedge_block chunk + the [C·nnz_out] output.
            chunk = int(self.wedge_block)
            nb = -(-total // chunk)
            pad = nb * chunk - total

            def padz(a):
                return jnp.pad(a, (0, pad))      # a_val pads 0 ⇒ inert

            gidx_b = padz(gidx).reshape(nb, chunk)
            oidx_b = padz(oidx).reshape(nb, chunk)
            cidx_b = padz(cidx).reshape(nb, chunk)
            aval_b = padz(aval).reshape(nb, chunk)
            h_flat = h_vals.reshape(-1)
            mix_flat = mix.reshape(-1)

            def body(acc, xs):
                gi, oi, ci, av = xs
                vals = h_flat[gi] * (mix_flat[ci] * av)
                return acc + jax.ops.segment_sum(
                    vals, oi, num_segments=C * nnz_out), None

            acc0 = jnp.zeros((C * nnz_out,), jnp.float32)
            out, _ = jax.lax.scan(body, acc0,
                                  (gidx_b, oidx_b, cidx_b, aval_b))
            return out.reshape(C, nnz_out)

        m1, m2 = _GTLayerParams(C, plan.n_types, first=True,
                                name="gt0")()
        h = compose(mixture(m1), m2, 0)
        for i in range(1, self.num_layers):
            mi, _ = _GTLayerParams(C, plan.n_types, first=False,
                                   name=f"gt{i}")()
            h = normalize(h, plan.step_row[i], plan.step_diag[i])
            h = compose(h, mi, i)

        # final D⁻¹(H+I) on the P_L ∪ I pattern, then per-channel conv
        n_real = int(plan.final_graph.n_edges)
        n_slots = int(plan.final_graph.senders.shape[0])
        ew = jnp.zeros((C, n_real), jnp.float32)
        ew = ew.at[:, plan.final_edge_pos].add(h)
        ew = ew.at[:, plan.final_diag].add(1.0)
        rows = plan.final_graph.receivers[:n_real]
        deg = jax.ops.segment_sum(ew.T, rows, num_segments=n).T
        ew = ew / jnp.maximum(deg[:, rows], 1e-12)
        if n_slots > n_real:
            ew = jnp.pad(ew, ((0, 0), (0, n_slots - n_real)))

        xw = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                      name="gcn_w")(x if self.dtype is None
                                    else x.astype(self.dtype))
        from ..ops.spmm import spmm_weighted
        xb = jnp.broadcast_to(xw[:, None, :], (n, C, self.hidden))
        z = spmm_weighted(plan.final_graph, ew.T.astype(xw.dtype), xb)
        z = nn.relu(z.astype(jnp.float32)).astype(xw.dtype)
        z = z.reshape(n, -1)                       # channel concat

        out = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(z)
        out = nn.relu(out)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="linear2")(out)
        return logits.astype(jnp.float32)
