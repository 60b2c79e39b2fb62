"""Mesh-sharded SparseGTN wedge composition (VERDICT r4 #4).

The wedge-plan GTN (nn/gtn_sparse.py) is the large-graph path — exactly
the one that needs the mesh. Its composition step is a gather x scalar x
segment-sum over static wedge arrays; this module partitions the wedges
**by output slot** (receiver-owned, like the halo partition): each
device owns a contiguous range of the output pattern's nonzero slots and
all wedges landing there, so the scatter-add is entirely local and the
only collectives are

  * one ``all_gather`` of the (small, O(nnz)) composed values per step —
    every device needs the full H for its next-step wedge gathers, and
  * the automatic gradient ``psum`` that ``jax.shard_map`` inserts for
    the replicated operands (H values and the mixing weights) on the
    backward pass — the "psum only the mixing-weight grads" design.

Wedge ranges are balanced by wedge count (not slot count): slot
boundaries are chosen by searchsorted on the cumulative per-slot wedge
histogram, so a hub row with millions of wedges does not serialise one
device.

``shard_gtn_plan(plan, mesh)`` precomputes the per-device wedge arrays
on host (build-time, like every other partitioner here) and returns a
``ShardedGTNPlan`` that ``SparseGTN`` transparently dispatches on — the
parameter tree and semantics are unchanged (1-vs-K parity tested in
tests/test_gtn_sharded.py).

Reference being scaled out: the dense bmm composition of
GTN/models/GTLayer.py:25-32, which holds [C, N, N] on one device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.gtn_sparse import GTNPlan


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedGTNPlan:
    """GTNPlan plus per-device wedge partitions (leading axis = device).

    ``base`` keeps everything the model needs outside compose (mixture
    scatter, normalisation rows/diags, the final conv graph); its flat
    ``step_*`` wedge arrays are retained but unused on this path.
    """

    base: GTNPlan
    sh_h_idx: Tuple[jax.Array, ...]    # per step: int32[K, W_k]
    sh_type: Tuple[jax.Array, ...]     # int32[K, W_k]
    sh_a_val: Tuple[jax.Array, ...]    # f32[K, W_k] (0 on padding)
    sh_out_loc: Tuple[jax.Array, ...]  # int32[K, W_k] local slot ids
    slot_cnt: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True))    # real slots per shard per step
    l_pad: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))    # max slots per shard per step
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    # --- delegates so SparseGTN can treat both plan types uniformly ---
    @property
    def nnz(self):
        return self.base.nnz

    @property
    def n_nodes(self):
        return self.base.n_nodes

    @property
    def n_types(self):
        return self.base.n_types

    @property
    def wedge_counts(self):
        return self.base.wedge_counts

    @property
    def base_idx(self):
        return self.base.base_idx

    @property
    def base_val(self):
        return self.base.base_val

    @property
    def step_row(self):
        return self.base.step_row

    @property
    def step_diag(self):
        return self.base.step_diag

    @property
    def final_graph(self):
        return self.base.final_graph

    @property
    def final_edge_pos(self):
        return self.base.final_edge_pos

    @property
    def final_diag(self):
        return self.base.final_diag


def shard_gtn_plan(plan: GTNPlan, mesh: Mesh,
                   axis: str = "data") -> ShardedGTNPlan:
    """Host-side wedge partitioning by output slot, balanced by wedge
    count; per-shard arrays are padded to a common width with inert
    (a_val=0) wedges."""
    k = int(mesh.shape[axis])
    sh_h, sh_t, sh_a, sh_o = [], [], [], []
    slot_cnt, l_pad = [], []
    for s in range(len(plan.wedge_counts)):
        h_idx = np.asarray(plan.step_h_idx[s])
        t_idx = np.asarray(plan.step_type[s])
        a_val = np.asarray(plan.step_a_val[s])
        out = np.asarray(plan.step_out[s], np.int64)
        nnz_out = plan.nnz[s + 1]

        order = np.argsort(out, kind="stable")
        h_idx, t_idx, a_val, out = (h_idx[order], t_idx[order],
                                    a_val[order], out[order])
        # slot boundaries balancing wedge count: shard j owns slots
        # [bounds[j], bounds[j+1]) and the (contiguous) wedges there
        w = len(out)
        per_slot = np.bincount(out, minlength=nnz_out)
        cum = np.concatenate([[0], np.cumsum(per_slot)])
        targets = (np.arange(1, k) * w) // k
        bounds = np.concatenate(
            [[0], np.searchsorted(cum[1:], targets, side="left") + 1,
             [nnz_out]])
        bounds = np.maximum.accumulate(bounds)   # monotone slot ranges
        wlo = cum[bounds]                        # wedge range per shard

        wk = int(max((wlo[1:] - wlo[:-1]).max(initial=1), 1))
        cnts = (bounds[1:] - bounds[:-1]).astype(np.int64)
        lp = int(max(cnts.max(initial=1), 1))
        H = np.zeros((k, wk), np.int32)
        T = np.zeros((k, wk), np.int32)
        A = np.zeros((k, wk), np.float32)        # 0 ⇒ inert padding
        O = np.zeros((k, wk), np.int32)
        for j in range(k):
            lo, hi = int(wlo[j]), int(wlo[j + 1])
            m = hi - lo
            H[j, :m] = h_idx[lo:hi]
            T[j, :m] = t_idx[lo:hi]
            A[j, :m] = a_val[lo:hi]
            O[j, :m] = out[lo:hi] - bounds[j]    # rebase to local slots
        sh_h.append(H)
        sh_t.append(T)
        sh_a.append(A)
        sh_o.append(O)
        slot_cnt.append(tuple(int(c) for c in cnts))
        l_pad.append(lp)

    def put(a):
        return jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P(axis, None)))

    return ShardedGTNPlan(
        base=plan,
        sh_h_idx=tuple(put(a) for a in sh_h),
        sh_type=tuple(put(a) for a in sh_t),
        sh_a_val=tuple(put(a) for a in sh_a),
        sh_out_loc=tuple(put(a) for a in sh_o),
        slot_cnt=tuple(slot_cnt),
        l_pad=tuple(l_pad),
        mesh=mesh,
        axis=axis,
    )


def compose_sharded(plan: ShardedGTNPlan, h_vals: jax.Array,
                    mix: jax.Array, s: int, channels: int) -> jax.Array:
    """H' = H @ (Σ_u mix_u A_u) over the sharded wedge partition of step
    ``s``; h_vals [C, nnz_in] replicated in, [C, nnz_out] replicated out
    (the all_gather). Channels fold into the 1-D gather/scatter ids like
    the single-device path (lane-padding physics, nn/gtn_sparse.py)."""
    c = channels
    nnz_in = plan.nnz[s]
    lp = plan.l_pad[s]
    n_t = plan.n_types
    k = int(plan.mesh.shape[plan.axis])

    @partial(
        jax.shard_map, mesh=plan.mesh,
        in_specs=(P(plan.axis), P(plan.axis), P(plan.axis), P(plan.axis),
                  P(), P()),
        out_specs=P(plan.axis),
    )
    def f(h_idx, t_idx, a_val, out_loc, h_flat, mix_flat):
        h_idx, t_idx, a_val, out_loc = (h_idx[0], t_idx[0], a_val[0],
                                        out_loc[0])
        ch = jnp.arange(c, dtype=jnp.int32)[:, None]
        gidx = (ch * nnz_in + h_idx[None, :]).reshape(-1)
        oidx = (ch * lp + out_loc[None, :]).reshape(-1)
        cidx = (ch * n_t + t_idx[None, :]).reshape(-1)
        coef = mix_flat[cidx] * jnp.tile(a_val, c)
        vals = h_flat[gidx] * coef
        out = jax.ops.segment_sum(vals, oidx, num_segments=c * lp)
        return out.reshape(1, c, lp)

    stacked = f(plan.sh_h_idx[s], plan.sh_type[s], plan.sh_a_val[s],
                plan.sh_out_loc[s], h_vals.reshape(-1), mix.reshape(-1))
    # reassemble the full pattern: concat each shard's real slot span
    parts = [stacked[j, :, :plan.slot_cnt[s][j]] for j in range(k)]
    return jnp.concatenate(parts, axis=1)
