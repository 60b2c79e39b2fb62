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
    """Device-resident transition structure for p/q walks."""

    nbr: jax.Array        # int32[N, md] CSR-ordered neighbor slots
    deg: jax.Array        # int32[N]
    indptr: jax.Array     # int32[N + 1] (slot j of v ⇒ edge indptr[v]+j)
    node_cum: jax.Array   # f32[N, md] first-hop CDF (edge weights)
    edge_cum: jax.Array   # f32[E, md] second-order CDF with p/q biases


def build_node2vec_tables(indptr: np.ndarray, indices: np.ndarray,
                          p: float = 1.0, q: float = 1.0,
                          weights=None) -> Node2VecTables:
    """Host build (vectorised numpy — no per-edge Python loop, unlike the
    reference's preprocess_transition_probs)."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    n = len(indptr) - 1
    e = len(indices)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    md = max(int(deg.max(initial=1)), 1)
    w = (np.ones(e, np.float32) if weights is None
         else np.asarray(weights, np.float32))

    nbr = _padded_slots(indptr, indices.astype(np.int32), md,
                        np.int32(0))
    w_slots = _padded_slots(indptr, w, md, np.float32(0))
    valid = np.arange(md)[None, :] < deg[:, None]

    node_cum = _normalised_cum(w_slots * valid)

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

    return Node2VecTables(
        nbr=jnp.asarray(nbr), deg=jnp.asarray(deg.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        node_cum=jnp.asarray(node_cum), edge_cum=jnp.asarray(edge_cum))


def _cdf_draw(key, cum_rows: jax.Array) -> jax.Array:
    """One uniform per row; slot = #(cum <= u). Padded slots carry cum=1,
    and u < 1, so draws never land in padding."""
    u = jax.random.uniform(key, (cum_rows.shape[0], 1))
    return jnp.sum(cum_rows <= u, axis=1).astype(jnp.int32)


def device_node2vec_walks(key, starts: jax.Array, length: int,
                          t: Node2VecTables) -> jax.Array:
    """[W, length] p/q-biased walks, entirely on device (jit-safe).

    Matches Node2VecWalker.walk semantics: first hop draws from the node
    (edge-weight) distribution, later hops from the (prev→cur) edge's
    biased distribution; walkers at dead ends repeat the terminal node.
    """
    starts = starts.astype(jnp.int32)
    if length == 1:
        return starts[:, None]
    k0, krest = jax.random.split(jax.random.fold_in(key, 0))

    alive0 = t.deg[starts] > 0
    safe0 = jnp.where(alive0, starts, 0)
    j0 = _cdf_draw(k0, t.node_cum[safe0])
    eid = t.indptr[safe0] + j0
    cur1 = jnp.where(alive0, t.nbr[safe0, j0], starts)

    def step(carry, k):
        cur, eid, alive = carry
        still = alive & (t.deg[cur] > 0)
        safe_e = jnp.where(still, eid, 0)
        j = _cdf_draw(k, t.edge_cum[safe_e])
        safe_c = jnp.where(still, cur, 0)
        new_eid = t.indptr[safe_c] + j
        nxt = jnp.where(still, t.nbr[safe_c, j], cur)
        return (nxt, jnp.where(still, new_eid, eid), still), nxt

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
