"""BiNE — Bipartite Network Embedding end-to-end driver.

Pipeline (BiNE/run.py:4-33, train_eval.py:16-88): HITS centrality on the
bipartite graph → centrality-proportional truncated walks on the two
homogeneous projections → joint loss

    L = α·o1(explicit) + β·o2(u implicit) + γ·o3(v implicit)

with o1 the weighted explicit-relation term over rated edges and o2/o3
masked skip-gram BCE terms (train_eval.py:60-63). Defaults: dim=128,
α=β=0.01, γ=0.1, maxT=32, minT=1, p_stop=0.15, window=5, neg=4, AdamW 1e-2
(BASELINE.md row BiNE).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.hetero import BipartiteGraph
from ..sampling import csr_from_edges, minibatches
from ..sampling.skipgram import skipgram_dataset
from ..sampling.walks import bine_walks
from ..train.linkpred import link_prediction_metrics
from ..train.metrics import optax_sigmoid_bce


@dataclass
class BiNEConfig:
    embed_dim: int = 128
    alpha: float = 0.01
    beta: float = 0.01
    gamma: float = 0.1
    max_t: int = 32
    min_t: int = 1
    p_stop: float = 0.15
    percent: float = 0.15
    window: int = 5
    num_negatives: int = 4
    batch_size: int = 128
    lr: float = 1e-2
    epochs: int = 5
    seed: int = 0
    logdir: Optional[str] = None  # TensorBoard dir (BiNE train_eval.py:41)


def hits_centrality(u, v, n_users: int, n_items: int,
                    iters: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    """Power-iteration HITS on the bipartite adjacency (replaces
    networkx.hits at BiNE/utils/graph_utils.py:178)."""
    hub = np.ones(n_users)
    for _ in range(iters):
        auth = np.zeros(n_items)
        np.add.at(auth, v, hub[u])
        auth /= max(np.linalg.norm(auth), 1e-12)
        hub = np.zeros(n_users)
        np.add.at(hub, u, auth[v])
        hub /= max(np.linalg.norm(hub), 1e-12)
    return hub, auth


def _side_dataset(bg: BipartiteGraph, side: str, centrality,
                  cfg: BiNEConfig, rng):
    g = bg.homogeneous_projection(side)
    s = np.asarray(g.senders)[: g.n_edges]
    r = np.asarray(g.receivers)[: g.n_edges]
    w = np.asarray(g.edge_weight)[: g.n_edges]
    n = bg.node_counts[side]
    indptr, indices, ws = csr_from_edges(s, r, n, w)
    walks = bine_walks(indptr, indices, ws, centrality, rng,
                       percent=cfg.percent, max_t=cfg.max_t,
                       min_t=cfg.min_t, p_stop=cfg.p_stop)
    max_len = max((len(wk) for wk in walks), default=1)
    mat = np.full((len(walks), max(max_len, 2)), -1, np.int64)
    for i, wk in enumerate(walks):
        mat[i, :len(wk)] = wk
    # subsampling disabled: BiNE keeps all tokens; -1 padding positions are
    # skipped by the pair extractor
    return skipgram_dataset(
        mat, n, window=cfg.window, num_negatives=cfg.num_negatives,
        rng=rng, subsample_t=None)


def train_bine(bg: Optional[BipartiteGraph] = None,
               test_edges=None,
               cfg: Optional[BiNEConfig] = None, verbose: bool = False):
    cfg = cfg or BiNEConfig()
    rng = np.random.default_rng(cfg.seed)
    if bg is None:
        # community-structured synthetic ratings so link pred is learnable
        nu, nv, n_comm = 150, 120, 6
        cu = rng.integers(0, n_comm, nu)
        cv = rng.integers(0, n_comm, nv)
        u = rng.integers(0, nu, 1500).astype(np.int32)
        v = np.empty(1500, np.int32)
        for i in range(1500):
            if rng.random() < 0.85:
                pool = np.flatnonzero(cv == cu[u[i]])
                v[i] = pool[rng.integers(0, len(pool))] if len(pool) else \
                    rng.integers(0, nv)
            else:
                v[i] = rng.integers(0, nv)
        w = rng.random(1500).astype(np.float32) * 4 + 1
        k = len(u)
        hold = rng.permutation(k)[: k // 10]
        keep = np.setdiff1d(np.arange(k), hold)
        bg = BipartiteGraph(nu, nv, u[keep], v[keep], w[keep])
        fu = rng.integers(0, nu, len(hold)).astype(np.int32)
        fv = rng.integers(0, nv, len(hold)).astype(np.int32)
        test_edges = ((u[hold], v[hold]), (fu, fv))

    nu = bg.node_counts["u"]
    nv = bg.node_counts["v"]
    eu, ev, ew = bg.relations[("u", "rate", "v")]
    hub, auth = hits_centrality(eu, ev, nu, nv)

    du = _side_dataset(bg, "u", hub, cfg, rng)
    dv = _side_dataset(bg, "v", auth, cfg, rng)

    key = jax.random.PRNGKey(cfg.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "U": jax.random.normal(k1, (nu, cfg.embed_dim)) * 0.01,
        "V": jax.random.normal(k2, (nv, cfg.embed_dim)) * 0.01,
        "Cu": jax.random.normal(k3, (nu, cfg.embed_dim)) * 0.01,
        "Cv": jax.random.normal(k4, (nv, cfg.embed_dim)) * 0.01,
    }
    tx = optax.adamw(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (e_u, e_v, e_w, cu, cnu, lu, mu, cv, cnv, lv, mv) = batch

        def loss_fn(p):
            # o1: explicit relations — weighted BCE on u·v
            # (BiNE/train_eval.py:16-24)
            logit = jnp.sum(p["U"][e_u] * p["V"][e_v], axis=-1)
            o1 = jnp.mean(e_w * optax_sigmoid_bce(
                logit, jnp.ones_like(logit)))
            # o2/o3: implicit skip-gram per side
            def sg(center_tab, ctx_tab, c, cn, lab, mask):
                logits = jnp.einsum(
                    "bd,bld->bl", center_tab[c], ctx_tab[cn])
                ls = optax_sigmoid_bce(logits, lab)
                return jnp.sum(ls * mask) / jnp.maximum(mask.sum(), 1.0)
            o2 = sg(p["U"], p["Cu"], cu, cnu, lu, mu)
            o3 = sg(p["V"], p["Cv"], cv, cnv, lv, mv)
            total = cfg.alpha * o1 + cfg.beta * o2 + cfg.gamma * o3
            return total, (o1, o2, o3)

        (loss, terms), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, terms

    # Per-term TensorBoard logging, mirroring the reference's three
    # add_scalar calls (BiNE/train_utils/train_eval.py:75-77).
    writer = None
    if cfg.logdir is not None:
        from ..utils.tb import SummaryWriter
        writer = SummaryWriter(cfg.logdir)

    history = []
    b = cfg.batch_size
    gstep = 0
    for epoch in range(1, cfg.epochs + 1):
        it_u = minibatches(du, b, rng)
        it_v = minibatches(dv, b, rng)
        tot, nb = 0.0, 0
        for be_u in minibatches((eu, ev, ew), b, rng):
            try:
                bu = next(it_u)
            except StopIteration:
                it_u = minibatches(du, b, rng)
                bu = next(it_u)
            try:
                bv = next(it_v)
            except StopIteration:
                it_v = minibatches(dv, b, rng)
                bv = next(it_v)
            batch = tuple(map(jnp.asarray, be_u + bu + bv))
            params, opt_state, loss, terms = step(params, opt_state, batch)
            tot += float(loss)
            nb += 1
            gstep += 1
            if writer is not None:
                writer.add_scalar("loss/o1_explicit", float(terms[0]),
                                  global_step=gstep)
                writer.add_scalar("loss/o2_implicit_u", float(terms[1]),
                                  global_step=gstep)
                writer.add_scalar("loss/o3_implicit_v", float(terms[2]),
                                  global_step=gstep)
        history.append((epoch, tot / max(nb, 1)))
        if verbose:
            print(f"epoch {epoch}: loss {history[-1][1]:.5f}")
    if writer is not None:
        writer.close()

    metrics = None
    if test_edges is not None:
        (tu, tv), (fu, fv) = test_edges
        emb_all = np.concatenate(
            [np.asarray(params["U"]), np.asarray(params["V"])])
        metrics = link_prediction_metrics(
            emb_all, (tu, tv + nu), (fu, fv + nu))
    return params, history, metrics
