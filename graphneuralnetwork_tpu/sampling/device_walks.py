"""On-device node2vec (p/q) and metapath-constrained walks.

Extends sampling/device_neighbor.py beyond uniform walks: the reference's
remaining host-side walk hot loops —

  * node2vec's per-edge alias transition tables + second-order walk
    (Node2vec/utils/sample_utils.py:72-170), and
  * metapath-constrained heterogeneous walks
    (MetaPath2Vec/utils/sample_utils.py:13-45)

— run as ``lax.scan``/unrolled steps over prebuilt HBM tables, so the
whole corpus generation is one jitted dispatch instead of a joblib fan-out
feeding a host→device copy.

Sampling design: instead of alias tables (two uniforms + one gather), the
biased draw uses **inverse-CDF over the padded neighbor slots**: the host
prebuilds, per directed edge (u→v), the normalised cumulative transition
probabilities over v's (≤ max_deg) neighbor slots with node2vec's biases
(1/p for the return hop, 1 for triangle closures, 1/q otherwise —
get_alias_edge, Node2vec/utils/sample_utils.py:122-146); on device one
uniform and ``sum(cum <= u)`` comparisons pick the slot. Exact (not
approximate) sampling from the same distribution the host walker draws
from, with one f32 gather row per step. Memory: the cum table is
[E, max_deg] f32 — fine for embedding-scale graphs, pick the COO walker
for extreme-degree-skew graphs.

Because a node's neighbor slots mirror its CSR row in order, slot j of
node v IS directed edge ``indptr[v] + j`` — the walk state carries that
edge id to index the next step's transition row.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _padded_slots(indptr: np.ndarray, values: np.ndarray, md: int,
                  fill) -> np.ndarray:
    """[N, md] matrix of each CSR row's first md entries of ``values``."""
    n = len(indptr) - 1
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    out = np.full((n, md), fill, values.dtype)
    pos = np.arange(len(values)) - np.repeat(indptr[:-1], deg)
    sel = pos < md
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)[sel]
    out[rows, pos[sel]] = values[sel]
    return out


def _normalised_cum(probs: np.ndarray) -> np.ndarray:
    """Row-normalised cumulative distribution; rows that sum to 0 (dead
    ends) become all-ones so draws clamp to slot 0 (masked by alive)."""
    cum = np.cumsum(probs, axis=1)
    tot = cum[:, -1:]
    return np.where(tot > 0, cum / np.maximum(tot, 1e-30),
                    1.0).astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Node2VecTables:
    """Device-resident transition structure for p/q walks.

    Per-step state is PACKED one row per node/edge —
    ``[cum (md) ‖ neighbor ids as f32 (md) ‖ deg ‖ indptr]`` — so a walk
    step is ONE wide row gather plus VPU elementwise math. The round-4
    unpacked layout needed five separate narrow/scalar gathers per step
    (deg[cur], indptr[cur], nbr[cur, j], cum[eid], …), each lowering to
    the per-element gather path (~16× slower than the numpy lock-step
    walker end-to-end); slot selection from the packed row uses a
    one-hot multiply-sum instead of a second gather. Node/edge ids and
    indptr values ride f32 lanes exactly while < 2^24 (guarded at
    build).
    """

    deg: jax.Array        # int32[N]
    node_pack: jax.Array  # f32[N, 2·md + 2]
    edge_pack: jax.Array  # f32[E, 2·md + 2]
    md: int = dataclasses.field(metadata=dict(static=True))

    # ---- compat views (tests / diagnostics) ----
    @property
    def node_cum(self) -> jax.Array:
        return self.node_pack[:, : self.md]

    @property
    def edge_cum(self) -> jax.Array:
        return self.edge_pack[:, : self.md]


def _pack(cum: np.ndarray, nbr_rows: np.ndarray, deg_rows: np.ndarray,
          iptr_rows: np.ndarray) -> np.ndarray:
    return np.concatenate(
        [cum, nbr_rows.astype(np.float32),
         deg_rows[:, None].astype(np.float32),
         iptr_rows[:, None].astype(np.float32)], axis=1)


def build_node2vec_tables(indptr: np.ndarray, indices: np.ndarray,
                          p: float = 1.0, q: float = 1.0,
                          weights=None) -> Node2VecTables:
    """Host build (vectorised numpy — no per-edge Python loop, unlike the
    reference's preprocess_transition_probs)."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    n = len(indptr) - 1
    e = len(indices)
    if max(n, e) >= 1 << 24:
        raise ValueError(
            "packed walk tables carry ids in f32 lanes (exact below "
            "2^24); this graph exceeds that — use the host walker")
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    md = max(int(deg.max(initial=1)), 1)
    w = (np.ones(e, np.float32) if weights is None
         else np.asarray(weights, np.float32))

    nbr = _padded_slots(indptr, indices.astype(np.int32), md,
                        np.int32(0))
    w_slots = _padded_slots(indptr, w, md, np.float32(0))
    valid = np.arange(md)[None, :] < deg[:, None]

    node_cum = _normalised_cum(w_slots * valid)
    node_pack = _pack(node_cum, nbr, deg, indptr[:-1])

    # second-order biases per directed edge e = (u → v): over v's slots x,
    # 1/p if x == u; 1 if (u, x) is an edge; 1/q otherwise.
    src_of = np.repeat(np.arange(n, dtype=np.int64), deg)   # [E]
    v_of = indices                                          # [E]
    xs = nbr[v_of].astype(np.int64)                         # [E, md]
    edge_key = np.sort(src_of * n + indices)
    qkey = src_of[:, None] * n + xs
    pos = np.searchsorted(edge_key, qkey)
    is_nb = edge_key[np.minimum(pos, e - 1)] == qkey
    bias = np.where(xs == src_of[:, None], 1.0 / p,
                    np.where(is_nb, 1.0, 1.0 / q)).astype(np.float32)
    probs = w_slots[v_of] * bias * valid[v_of]
    edge_cum = _normalised_cum(probs)
    # edge row carries the TARGET v's neighbor/deg/indptr data: after
    # traversing edge e=(u→v) the walker sits at v, so one row read
    # serves both the biased draw and the hop bookkeeping.
    edge_pack = _pack(edge_cum, nbr[v_of], deg[v_of], indptr[:-1][v_of])

    return Node2VecTables(
        deg=jnp.asarray(deg.astype(np.int32)),
        node_pack=jnp.asarray(node_pack),
        edge_pack=jnp.asarray(edge_pack),
        md=int(md))


def _packed_step(rows: jax.Array, u: jax.Array, md: int):
    """rows [W, 2·md+2], u [W, 1] uniforms → (j, nxt, new_eid, has_nbr).

    Slot draw = #(cum <= u) (padded slots carry cum=1, u < 1 never lands
    there); neighbor pick = one-hot multiply-sum over the packed id
    lanes (no second gather)."""
    cum = rows[:, :md]
    nbrf = rows[:, md:2 * md]
    degv = rows[:, 2 * md]
    iptr = rows[:, 2 * md + 1]
    j = jnp.sum(cum <= u, axis=1).astype(jnp.int32)       # [W]
    onehot = (jnp.arange(md, dtype=jnp.int32)[None, :]
              == j[:, None]).astype(jnp.float32)
    nxt = jnp.sum(nbrf * onehot, axis=1).astype(jnp.int32)
    new_eid = (iptr + j.astype(jnp.float32)).astype(jnp.int32)
    return nxt, new_eid, degv > 0


def device_node2vec_walks(key, starts: jax.Array, length: int,
                          t: Node2VecTables) -> jax.Array:
    """[W, length] p/q-biased walks, entirely on device (jit-safe).

    Matches Node2VecWalker.walk semantics: first hop draws from the node
    (edge-weight) distribution, later hops from the (prev→cur) edge's
    biased distribution; walkers at dead ends repeat the terminal node.
    One packed row gather per walker per step (see Node2VecTables).
    """
    starts = starts.astype(jnp.int32)
    if length == 1:
        return starts[:, None]
    md = t.md
    k0, krest = jax.random.split(jax.random.fold_in(key, 0))

    rows0 = t.node_pack[starts]
    u0 = jax.random.uniform(k0, (starts.shape[0], 1))
    nxt0, eid, alive0 = _packed_step(rows0, u0, md)
    cur1 = jnp.where(alive0, nxt0, starts)

    def step(carry, k):
        cur, eid, alive = carry
        rows = t.edge_pack[jnp.where(alive, eid, 0)]
        u = jax.random.uniform(k, (cur.shape[0], 1))
        nxt, new_eid, has_nbr = _packed_step(rows, u, md)
        still = alive & has_nbr
        return (jnp.where(still, nxt, cur),
                jnp.where(still, new_eid, eid), still), \
            jnp.where(still, nxt, cur)

    keys = jax.random.split(krest, max(length - 2, 1))
    (_, _, _), rest = jax.lax.scan(
        step, (cur1, eid, alive0), keys[: length - 2])
    walks = jnp.concatenate(
        [starts[None], cur1[None], rest], axis=0)     # [L, W]
    return walks.T


# ---------------------------------------------------------------------------
# metapath walks
# ---------------------------------------------------------------------------


def build_metapath_tables(hetero, metapath: Sequence[Tuple[str, str, str]]
                          ) -> List[Tuple[jax.Array, jax.Array]]:
    """Per-leg padded neighbor tables for the relation cycle."""
    from .device_neighbor import build_device_neighbor_table
    from .walks import csr_from_edges

    legs = []
    for key in metapath:
        s, d, _ = hetero.relations[key]
        indptr, indices, _ = csr_from_edges(
            s, d, hetero.node_counts[key[0]])
        legs.append(build_device_neighbor_table(indptr, indices))
    return legs


def device_metapath_walks(key, starts: jax.Array, length: int,
                          legs: Sequence[Tuple[jax.Array, jax.Array]]
                          ) -> jax.Array:
    """[W, length] metapath-constrained walks on device.

    Step t draws uniformly from leg ``(t-1) % len(legs)``'s neighbor
    table (the relation cycle repeats, MetaPath2Vec/utils/
    sample_utils.py:13-45); ids are per-type LOCAL, as the host
    ``metapath_walks`` returns. Dead ends self-absorb. The step loop is
    unrolled (length is static and small; each leg's table has its own
    shape, which a scan could not carry)."""
    cur = starts.astype(jnp.int32)
    out = [cur]
    alive = jnp.ones(cur.shape[0], bool)
    for step in range(1, length):
        table, deg = legs[(step - 1) % len(legs)]
        k = jax.random.fold_in(key, step)
        safe = jnp.where(alive, cur, 0)
        d = deg[safe]
        still = alive & (d > 0)
        j = jax.random.randint(k, cur.shape, 0, jnp.maximum(d, 1))
        nxt = table[safe, j]
        cur = jnp.where(still, nxt, cur)
        alive = still
        out.append(cur)
    return jnp.stack(out, axis=1)
