"""GATNE end-to-end driver (multiplex heterogeneous link prediction).

Pipeline mirrors GATNE/run.py:58-66: per-type schema walks → window pairs
tagged with edge type → per-type neighbor tables → GATNE model + sampled-
negative skip-gram loss → vectorised all-node embedding dump → cosine
link-pred eval per edge type.

Defaults (GATNE/run.py:15-53): dim=200(amazon 256), edge_dim=16(att 32),
walks 10×len10, window=5, neg=5, neighbor_samples=10, batch=512 (lr tuned
down from the reference's SGD 0.4 for Adam).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.edgelist import MultiplexData, load_multiplex
from ..nn.embed import GATNE as GATNEModel
from ..sampling import csr_from_edges, minibatches, uniform_walks
from ..sampling.skipgram import NegativeSampler, centers_and_contexts
from ..train.linkpred import link_prediction_metrics


@dataclass
class GATNEConfig:
    embed_dim: int = 64
    edge_embed_dim: int = 16
    attn_dim: int = 32
    num_walks: int = 10
    walk_length: int = 10
    window: int = 5
    num_negatives: int = 5
    neighbor_samples: int = 10
    batch_size: int = 512
    lr: float = 1e-2
    epochs: int = 5
    seed: int = 0
    inductive: bool = False   # GATNE-I uses node features
    # Negative distribution: 'log_uniform' is the reference NSLoss Zipfian
    # over frequency rank (GATNE/train_utils/loss_utils.py:14-22);
    # 'frequency' is freq^0.75 skip-gram style.
    negative_sampling: str = "log_uniform"
    # v1/v2 neighbor aggregation (GATNE_Pytorch/models/GATNE.py:72-77)
    aggregator: str = "mean"
    # Training objective: 'nsloss' = v1 sampled-negative skip-gram
    # (GATNE/train_utils/loss_utils.py:7-42); 'masked_bce' = v2
    # Encoder/Decoder padded context+negative rows scored against a
    # decoder weight table under per-row masked BCE
    # (GATNE_Pytorch/models/GATNE.py:100-114, Collate_fn
    # utils/data_utils.py:168-188, SigmoidBCELoss
    # train_utils/loss_utils.py:4-10).
    loss: str = "nsloss"
    # Walk-corpus cache dir: walks persist across runs like the reference's
    # train_walks.txt (GATNE/utils/data_utils.py:171-177, 184-207).
    cache_dir: Optional[str] = None


def build_neighbor_tables(data: MultiplexData, samples: int,
                          rng: np.random.Generator) -> np.ndarray:
    """[N, T, S] per-type sampled neighbors with resampling; isolated nodes
    self-fill (GATNE/utils/data_utils.py:127-146)."""
    n, T = data.n_nodes, len(data.edge_types)
    out = np.empty((n, T, samples), np.int32)
    for t, ty in enumerate(data.edge_types):
        s, r = data.train_edges[ty]
        ss = np.concatenate([s, r])
        rr = np.concatenate([r, s])
        indptr, indices, _ = csr_from_edges(ss, rr, n)
        deg = indptr[1:] - indptr[:-1]
        off = (rng.random((n, samples)) *
               np.maximum(deg, 1)[:, None]).astype(np.int64)
        nb = indices[indptr[:-1][:, None] + off]
        self_rep = np.broadcast_to(
            np.arange(n, dtype=np.int32)[:, None], nb.shape)
        out[:, t, :] = np.where(deg[:, None] > 0, nb, self_rep)
    return out


def _generate_walks(data: MultiplexData, cfg: GATNEConfig,
                    rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Per-type walk corpora, persisted to ``cfg.cache_dir`` so reruns skip
    regeneration — the reference's train_walks.txt save/load
    (GATNE/utils/data_utils.py:171-177, 184-207), stored as one .npz."""
    import os
    cache = None
    if cfg.cache_dir is not None:
        os.makedirs(cfg.cache_dir, exist_ok=True)
        cache = os.path.join(
            cfg.cache_dir,
            f"walks_w{cfg.num_walks}_l{cfg.walk_length}_s{cfg.seed}.npz")
        if os.path.exists(cache):
            with np.load(cache) as z:
                return {ty: z[ty] for ty in data.edge_types}
    out = {}
    for ty in data.edge_types:
        s, r = data.train_edges[ty]
        ss = np.concatenate([s, r])
        rr = np.concatenate([r, s])
        indptr, indices, _ = csr_from_edges(ss, rr, data.n_nodes)
        nodes = np.unique(ss)
        starts = np.tile(nodes, cfg.num_walks)
        out[ty] = uniform_walks(indptr, indices, starts, cfg.walk_length,
                                rng)
    if cache is not None:
        tmp = cache + ".tmp.npz"
        np.savez_compressed(tmp, **out)
        os.replace(tmp, cache)
    return out


def generate_pairs(data: MultiplexData, cfg: GATNEConfig,
                   rng: np.random.Generator):
    """Per-type walks → (center, context, type) triples
    (GATNE/utils/data_utils.py:89-124)."""
    centers, contexts, types = [], [], []
    all_walks = _generate_walks(data, cfg, rng)
    for t, ty in enumerate(data.edge_types):
        walks = all_walks[ty]
        c, ctx = centers_and_contexts(walks.astype(np.int64),
                                      cfg.window, rng)
        for k in range(ctx.shape[1]):
            valid = ctx[:, k] >= 0
            centers.append(c[valid])
            contexts.append(ctx[valid, k])
            types.append(np.full(valid.sum(), t, np.int32))
    return (np.concatenate(centers).astype(np.int32),
            np.concatenate(contexts).astype(np.int32),
            np.concatenate(types))


def generate_padded_pairs(data: MultiplexData, cfg: GATNEConfig,
                          rng: np.random.Generator):
    """Per-type walks → padded per-center context rows for the v2
    masked-BCE pipeline: (centers [P], types [P], contexts [P, 2*window]
    padded -1) — the framework-side equivalent of Collate_fn's ragged
    context lists (GATNE_Pytorch/utils/data_utils.py:168-188)."""
    centers, types, contexts = [], [], []
    all_walks = _generate_walks(data, cfg, rng)
    for t, ty in enumerate(data.edge_types):
        walks = all_walks[ty]
        c, ctx = centers_and_contexts(walks.astype(np.int64),
                                      cfg.window, rng)
        keep = (ctx >= 0).any(axis=1)
        centers.append(c[keep])
        contexts.append(ctx[keep])
        types.append(np.full(keep.sum(), t, np.int32))
    return (np.concatenate(centers).astype(np.int32),
            np.concatenate(types),
            np.concatenate(contexts).astype(np.int32))


def train_gatne(data: Optional[MultiplexData] = None,
                cfg: Optional[GATNEConfig] = None, verbose: bool = False):
    cfg = cfg or GATNEConfig()
    data = data or load_multiplex(seed=cfg.seed)
    if cfg.loss == "masked_bce":
        return _train_gatne_masked_bce(data, cfg, verbose)
    if cfg.loss != "nsloss":
        raise ValueError(f"loss must be 'nsloss' or 'masked_bce', got "
                         f"{cfg.loss!r}")
    rng = np.random.default_rng(cfg.seed)
    T = len(data.edge_types)

    neighbors = build_neighbor_tables(data, cfg.neighbor_samples, rng)
    centers, contexts, types = generate_pairs(data, cfg, rng)
    freq = np.bincount(
        np.concatenate([centers, contexts]), minlength=data.n_nodes)
    if cfg.negative_sampling == "log_uniform":
        # NSLoss sample_weight (GATNE/train_utils/loss_utils.py:14-22):
        # Zipfian P(k) ∝ log(k+2) − log(k+1) over frequency rank k (the
        # reference indexes by its frequency-sorted Vocab; ranking by the
        # empirical corpus frequency reproduces that for any id order).
        rank = np.empty(data.n_nodes, np.int64)
        rank[np.argsort(-freq, kind="stable")] = np.arange(data.n_nodes)
        k = rank.astype(np.float64)
        w = (np.log(k + 2) - np.log(k + 1)) / np.log(data.n_nodes + 1)
        neg_sampler = NegativeSampler(w, power=1.0)
    else:
        neg_sampler = NegativeSampler(np.maximum(freq, 1))

    features = (jnp.asarray(data.features)
                if cfg.inductive and data.features is not None else None)
    model = GATNEModel(
        vocab_size=data.n_nodes, num_edge_types=T,
        embed_dim=cfg.embed_dim, edge_embed_dim=cfg.edge_embed_dim,
        attn_dim=cfg.attn_dim, inductive=cfg.inductive,
        feature_dim=(data.features.shape[1]
                     if cfg.inductive and data.features is not None
                     else None),
        aggregator=cfg.aggregator)
    neighbors_j = jnp.asarray(neighbors)

    # context table for the sampled-softmax loss (NSLoss,
    # GATNE/train_utils/loss_utils.py:7-42): a separate embedding table.
    ctx_table_key = jax.random.PRNGKey(cfg.seed + 1)
    ctx_table = jax.random.normal(
        ctx_table_key, (data.n_nodes, cfg.embed_dim)) * 0.01

    params = model.init(
        jax.random.PRNGKey(cfg.seed), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32),
        neighbors_j[:2],
        features)["params"]
    all_params = {"model": params, "ctx": ctx_table}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(all_params)

    @jax.jit
    def step(all_params, opt_state, c, ctx, ty, negs, neigh):
        def loss_fn(p):
            emb = model.apply({"params": p["model"]}, c, ty, neigh,
                              features)                       # [B, D]
            pos_e = p["ctx"][ctx]                             # [B, D]
            neg_e = p["ctx"][negs]                            # [B, K, D]
            pos_logit = jnp.sum(emb * pos_e, axis=-1)
            neg_logit = jnp.einsum("bd,bkd->bk", emb, neg_e)
            pos_l = -jax.nn.log_sigmoid(pos_logit)
            neg_l = -jax.nn.log_sigmoid(-neg_logit).sum(-1)
            return (pos_l + neg_l).mean()

        loss, grads = jax.value_and_grad(loss_fn)(all_params)
        updates, opt_state = tx.update(grads, opt_state, all_params)
        return optax.apply_updates(all_params, updates), opt_state, loss

    history = []
    bs = cfg.batch_size
    nb_dev = len(centers) // bs
    device_loop = jax.default_backend() != "cpu" and nb_dev > 0

    if device_loop:
        # One dispatch per epoch: the host pre-draws the WHOLE epoch's
        # shuffled pairs + negatives (the same vectorised sampler the
        # per-batch loop used — identical sampling semantics), then a
        # lax.scan steps every batch on device. The streamed loop paid
        # ~30 ms tunnel latency per batch. Batch arrays and the neighbor
        # table are jit ARGUMENTS (closure constants trip the remote
        # compiler's request limit).
        @jax.jit
        def epoch_fn(all_params, opt_state, cb, ctxb, tyb, negb, ntab):
            def body(carry, batch):
                p, o = carry
                c, ctx, ty, negs = batch
                p, o, loss = step(p, o, c, ctx, ty, negs, ntab[c])
                return (p, o), loss

            (all_params, opt_state), losses = jax.lax.scan(
                body, (all_params, opt_state), (cb, ctxb, tyb, negb))
            return all_params, opt_state, losses.mean()

    for epoch in range(1, cfg.epochs + 1):
        if device_loop:
            perm = rng.permutation(len(centers))[: nb_dev * bs]
            negs = neg_sampler.draw(
                (len(perm), cfg.num_negatives), rng,
                exclude=contexts[perm][:, None]).astype(np.int32)
            all_params, opt_state, mean_loss = epoch_fn(
                all_params, opt_state,
                jnp.asarray(centers[perm].reshape(nb_dev, bs)),
                jnp.asarray(contexts[perm].reshape(nb_dev, bs)),
                jnp.asarray(types[perm].reshape(nb_dev, bs)),
                jnp.asarray(negs.reshape(nb_dev, bs,
                                         cfg.num_negatives)),
                neighbors_j)
            mean_loss = float(mean_loss)
        else:
            tot, nb = 0.0, 0
            for c, ctx, ty in minibatches(
                    (centers, contexts, types), cfg.batch_size, rng):
                negs = neg_sampler.draw(
                    (len(c), cfg.num_negatives), rng,
                    exclude=ctx[:, None])
                all_params, opt_state, loss = step(
                    all_params, opt_state, jnp.asarray(c),
                    jnp.asarray(ctx), jnp.asarray(ty),
                    jnp.asarray(negs.astype(np.int32)),
                    neighbors_j[c])
                tot += float(loss)
                nb += 1
            mean_loss = tot / max(nb, 1)
        metrics = evaluate_gatne(model, all_params["model"], data,
                                 neighbors_j, features, split="valid")
        history.append((epoch, mean_loss, metrics))
        if verbose:
            print(f"epoch {epoch}: loss {mean_loss:.4f} "
                  f"val {metrics}")
    test_metrics = evaluate_gatne(model, all_params["model"], data,
                                  neighbors_j, features, split="test")
    return all_params, history, test_metrics


def _train_gatne_masked_bce(data: MultiplexData, cfg: GATNEConfig,
                            verbose: bool = False):
    """v2 Encoder/Decoder pipeline: padded context+negative rows scored
    against a decoder weight table, per-row masked BCE, AdamW
    (GATNE_Pytorch/models/GATNE.py:100-127, train_utils/train_eval.py:100,
    loss_utils.py:4-10). Row loss = sum(BCE·mask)/mask_count — the
    reference's loss(pred,labels,masks)/masks.sum(1)*masks.shape[1] reduces
    to exactly this per row."""
    from ..sampling.skipgram import batchify

    rng = np.random.default_rng(cfg.seed)
    T = len(data.edge_types)
    neighbors = build_neighbor_tables(data, cfg.neighbor_samples, rng)
    centers, types, contexts = generate_padded_pairs(data, cfg, rng)
    freq = np.bincount(
        np.concatenate([centers, contexts[contexts >= 0]]),
        minlength=data.n_nodes)
    neg_sampler = NegativeSampler(np.maximum(freq, 1))

    features = (jnp.asarray(data.features)
                if cfg.inductive and data.features is not None else None)
    model = GATNEModel(
        vocab_size=data.n_nodes, num_edge_types=T,
        embed_dim=cfg.embed_dim, edge_embed_dim=cfg.edge_embed_dim,
        attn_dim=cfg.attn_dim, inductive=cfg.inductive,
        feature_dim=(data.features.shape[1]
                     if cfg.inductive and data.features is not None
                     else None),
        aggregator=cfg.aggregator)
    neighbors_j = jnp.asarray(neighbors)

    enc_params = model.init(
        jax.random.PRNGKey(cfg.seed), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32), neighbors_j[:2], features)["params"]
    # Decoder weight table (GraphDecoder, GATNE_Pytorch/models/GATNE.py:
    # 100-114): xavier-uniform over [N, D].
    lim = float(np.sqrt(6.0 / (data.n_nodes + cfg.embed_dim)))
    dec = jax.random.uniform(
        jax.random.PRNGKey(cfg.seed + 1), (data.n_nodes, cfg.embed_dim),
        minval=-lim, maxval=lim)
    all_params = {"model": enc_params, "decoder": dec}
    tx = optax.adamw(cfg.lr)
    opt_state = tx.init(all_params)

    @jax.jit
    def step(all_params, opt_state, c, ty, ctx_neg, labels, mask, neigh):
        def loss_fn(p):
            emb = model.apply({"params": p["model"]}, c, ty, neigh,
                              features)                       # [B, D]
            w = p["decoder"][jnp.maximum(ctx_neg, 0)]         # [B, L, D]
            logits = jnp.einsum("bd,bld->bl", emb, w)
            ls = optax.sigmoid_binary_cross_entropy(logits, labels)
            per_row = (ls * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
            return per_row.mean()

        loss, grads = jax.value_and_grad(loss_fn)(all_params)
        updates, opt_state = tx.update(grads, opt_state, all_params)
        return optax.apply_updates(all_params, updates), opt_state, loss

    def draw_negs(c, ctx):
        # num_negatives per VALID context (the reference's dataset
        # builder draws len(context)*num_negatives per center,
        # utils/data_utils.py:104-151); excess slots pad to -1 and
        # batchify masks them out.
        negs = neg_sampler.draw((len(c), K), rng).astype(np.int64)
        n_ctx = (ctx >= 0).sum(1)
        slot = np.arange(K)[None, :]
        return np.where(
            slot < (n_ctx * cfg.num_negatives)[:, None], negs, -1)

    history = []
    K = cfg.num_negatives * contexts.shape[1]
    bs = cfg.batch_size
    nb_dev = len(centers) // bs
    device_loop = jax.default_backend() != "cpu" and nb_dev > 0

    if device_loop:
        # one lax.scan dispatch per epoch; whole-epoch arrays prebuilt on
        # host (batchify is row-independent, so epoch-wide == per-batch)
        # and passed as jit arguments (closure constants trip the remote
        # compiler's request limit)
        @jax.jit
        def epoch_fn(all_params, opt_state, cb, tyb, cnb, lbb, mkb,
                     ntab):
            def body(carry, batch):
                p, o = carry
                c, ty, cn, lb, mk = batch
                p, o, loss = step(p, o, c, ty, cn, lb, mk, ntab[c])
                return (p, o), loss

            (all_params, opt_state), losses = jax.lax.scan(
                body, (all_params, opt_state), (cb, tyb, cnb, lbb, mkb))
            return all_params, opt_state, losses.mean()

    for epoch in range(1, cfg.epochs + 1):
        if device_loop:
            perm = rng.permutation(len(centers))[: nb_dev * bs]
            c, ty, ctx = centers[perm], types[perm], contexts[perm]
            cc, ctx_neg, labels, mask = batchify(c, ctx,
                                                 draw_negs(c, ctx))
            L = ctx_neg.shape[1]
            all_params, opt_state, mean_loss = epoch_fn(
                all_params, opt_state,
                jnp.asarray(cc.reshape(nb_dev, bs).astype(np.int32)),
                jnp.asarray(ty.reshape(nb_dev, bs)),
                jnp.asarray(ctx_neg.reshape(nb_dev, bs, L)
                            .astype(np.int32)),
                jnp.asarray(labels.reshape(nb_dev, bs, L)),
                jnp.asarray(mask.reshape(nb_dev, bs, L)),
                neighbors_j)
            mean_loss = float(mean_loss)
        else:
            tot, nb = 0.0, 0
            for c, ty, ctx in minibatches(
                    (centers, types, contexts), cfg.batch_size, rng):
                cc, ctx_neg, labels, mask = batchify(c, ctx,
                                                     draw_negs(c, ctx))
                all_params, opt_state, loss = step(
                    all_params, opt_state, jnp.asarray(cc, jnp.int32),
                    jnp.asarray(ty),
                    jnp.asarray(ctx_neg.astype(np.int32)),
                    jnp.asarray(labels), jnp.asarray(mask),
                    neighbors_j[cc])
                tot += float(loss)
                nb += 1
            mean_loss = tot / max(nb, 1)
        metrics = evaluate_gatne(model, all_params["model"], data,
                                 neighbors_j, features, split="valid")
        history.append((epoch, mean_loss, metrics))
        if verbose:
            print(f"epoch {epoch}: loss {mean_loss:.4f} "
                  f"val {metrics}")
    test_metrics = evaluate_gatne(model, all_params["model"], data,
                                  neighbors_j, features, split="test")
    return all_params, history, test_metrics


def evaluate_gatne(model, params, data: MultiplexData, neighbors_j,
                   features, split: str = "test") -> Dict[str, float]:
    """Vectorised all-node × all-type embedding dump + per-type cosine
    link-pred metrics, averaged (replaces the O(N) loop at
    GATNE/train_utils/train_eval.py:54-68)."""
    n = data.n_nodes
    T = len(data.edge_types)
    nodes = jnp.arange(n, dtype=jnp.int32)
    per_type = {}
    fwd = jax.jit(lambda c, ty, nb: model.apply(
        {"params": params}, c, ty, nb, features))
    true_d = data.valid_true if split == "valid" else data.test_true
    false_d = data.valid_false if split == "valid" else data.test_false
    agg = None
    for t, ty in enumerate(data.edge_types):
        emb = np.asarray(
            fwd(nodes, jnp.full((n,), t, jnp.int32), neighbors_j))
        m = link_prediction_metrics(emb, true_d[ty], false_d[ty])
        per_type[ty] = m
        agg = (m if agg is None else
               {k: agg[k] + m[k] for k in m})
    return {k: v / T for k, v in agg.items()}
