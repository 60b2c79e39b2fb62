"""On-device fanout neighbor sampling (jit-safe, TPU-resident).

The reference samples neighbors on host CPU inside the DataLoader collate
(GraphSAGE_Pytorch/sample_utils.py:4-35), paying a host→device round trip
per batch. Here the padded neighbor table lives in HBM and each hop is a
`jax.random.randint` + row gather inside the jitted step — the whole
GraphSAGE epoch (sampling included) becomes ONE `lax.scan` dispatch
(train/sage_loop.py `device_sampling=True`).

Semantics match the host sampler exactly: fanout draws WITH replacement,
uniform over each node's true neighbor list; zero-degree nodes repeat
themselves.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_device_neighbor_table(
    indptr: np.ndarray, indices: np.ndarray,
    max_deg: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CSR → ([N, max_deg] int32 padded neighbor table, [N] int32 degree).

    Rows shorter than ``max_deg`` are padded with the node itself (never
    drawn: the sampler draws j < deg). ``max_deg`` caps the table for
    degree-skewed graphs — rows above the cap keep a uniform subsample of
    ``max_deg`` neighbors (their with-replacement draws then come from
    that subsample; exact when max_deg >= true max degree).
    """
    n = len(indptr) - 1
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    md = int(deg.max(initial=1)) if max_deg is None else int(max_deg)
    md = max(md, 1)
    table = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, md))
    # vectorised fill: scatter the first md CSR entries of every row
    pos = np.arange(len(indices)) - np.repeat(indptr[:-1], deg)
    sel = pos < md
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)[sel]
    table[rows, pos[sel]] = indices[sel].astype(np.int32)
    # rows over the cap get a random subsample instead of a truncation
    rng = np.random.default_rng(0)
    for v in np.flatnonzero(deg > md):
        table[v] = rng.choice(indices[indptr[v]:indptr[v + 1]], size=md,
                              replace=False).astype(np.int32)
    return jnp.asarray(table), jnp.asarray(np.minimum(deg, md), jnp.int32)


def device_sample_neighbors(key, nodes: jax.Array, table: jax.Array,
                            deg: jax.Array, fanout: int) -> jax.Array:
    """[B*fanout] neighbors drawn with replacement, uniform per node."""
    d = deg[nodes]                                      # [B]
    j = jax.random.randint(key, (nodes.shape[0], fanout), 0,
                           jnp.maximum(d, 1)[:, None])
    nbrs = table[nodes[:, None], j]                     # [B, fanout]
    self_rep = jnp.broadcast_to(nodes[:, None], nbrs.shape)
    return jnp.where(d[:, None] > 0, nbrs, self_rep).reshape(-1)


def device_multihop_sampling(key, nodes: jax.Array,
                             fanouts: Sequence[int], table: jax.Array,
                             deg: jax.Array) -> List[jax.Array]:
    """Jit-safe multihop sampling: hop k has B * prod(fanouts[:k]) nodes
    (same contract as sampling/neighbor.py:multihop_sampling)."""
    keys = jax.random.split(key, len(fanouts))
    result = [nodes.astype(jnp.int32)]
    for k, f in zip(keys, fanouts):
        result.append(device_sample_neighbors(k, result[-1], table, deg, f))
    return result


def device_uniform_walks(key, starts: jax.Array, length: int,
                         table: jax.Array, deg: jax.Array) -> jax.Array:
    """[W, length] uniform random walks, entirely on device.

    lax.scan over steps: each step is one randint + row gather from the
    HBM neighbor table — the device analogue of the host walkers
    (DeepWalk/data_utils.py:28-62) and the C++ OpenMP engine. Walks from
    zero-degree nodes stay put (same stop semantics as the host walker,
    which keeps rectangular shape by repeating the terminal node).
    """
    starts = starts.astype(jnp.int32)

    def step(carry, k):
        cur = carry
        nxt = device_sample_neighbors(k, cur, table, deg, 1)
        return nxt, cur

    keys = jax.random.split(key, max(length - 1, 1))
    last, prevs = jax.lax.scan(step, starts, keys[:length - 1])
    walks = jnp.concatenate([prevs, last[None]], axis=0)  # [L, W]
    return walks.T
