"""Mini-batch GraphSAGE training — supervised and unsupervised modes.

Supervised (GraphSAGE_Pytorch/train_eval.py:67-128): fanout-sample a batch
of labelled nodes, CE loss on the folded output. Defaults: fanout [10,10],
dims [128, C], batch 64, SGD lr=0.1 wd=1e-4 (run.py:8-10) — exposed but
with Adam as the default optimizer (converges in far fewer steps on TPU).

Unsupervised (GraphSAGE/run.py:8-14, data_utils.py:50-70): each batch node
gets a context node (co-occurring within a short walk) and K negatives;
embeddings of all three are computed by the same sampled forward and scored
by dot product with binary-logit loss (train_eval.py:10-34).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.sage import SampledGraphSAGE
from ..sampling import csr_from_edges, multihop_sampling, uniform_walks
from ..sampling.skipgram import NegativeSampler
from .metrics import accuracy, binary_accuracy, masked_softmax_cross_entropy


@dataclass
class SageConfig:
    fanouts: Sequence[int] = (10, 10)
    hidden: int = 128
    batch_size: int = 64
    lr: float = 1e-2
    weight_decay: float = 1e-4
    epochs: int = 5
    aggregator: str = "mean"
    # "adamw" (TPU-fast default) or "sgd" = the reference recipe: SGD at
    # the reference lr under the warmup-poly schedule
    # (GraphSAGE_Pytorch/train_eval.py:74,28; run.py:8-10 lr=0.1 wd=1e-4).
    optimizer: str = "adamw"
    seed: int = 0
    # unsupervised mode
    num_negatives: int = 5
    walk_length: int = 5
    # On-device sampling: the neighbor table lives in HBM, each hop is a
    # randint + gather inside jit, and a whole epoch (sampling included)
    # runs as ONE lax.scan dispatch (sampling/device_neighbor.py). The
    # host-CPU path mirrors the reference's DataLoader collate instead.
    device_sampling: bool = False
    max_table_degree: Optional[int] = None


def _make_tx(cfg: "SageConfig", steps_per_epoch: int):
    from .schedule import make_optimizer
    return make_optimizer(cfg.optimizer, cfg.lr,
                          weight_decay=cfg.weight_decay,
                          total_steps=cfg.epochs * steps_per_epoch,
                          warmup_steps=steps_per_epoch, momentum=0.9)


def _gather_hops(features_dev, hops):
    """Gather hop features ON DEVICE: only the int32 hop index arrays cross
    the host→device boundary (the gathered features can be ~100× larger)."""
    return [features_dev[jnp.asarray(h)] for h in hops]


def train_sage_supervised(data, cfg: Optional[SageConfig] = None,
                          verbose: bool = False):
    cfg = cfg or SageConfig()
    if cfg.device_sampling:
        return train_sage_supervised_device(data, cfg, verbose=verbose)
    rng = np.random.default_rng(cfg.seed)
    indptr, indices, _ = csr_from_edges(
        data.senders, data.receivers, data.features.shape[0])
    dims = (cfg.hidden, data.num_classes)
    model = SampledGraphSAGE(dims=dims, fanouts=tuple(cfg.fanouts),
                             aggregator=cfg.aggregator)
    feats_dev = jnp.asarray(data.features)

    hops0 = multihop_sampling(data.train_idx[: cfg.batch_size],
                              cfg.fanouts, indptr, indices, rng)
    params = model.init(jax.random.PRNGKey(cfg.seed),
                        _gather_hops(feats_dev, hops0))["params"]
    tx = _make_tx(cfg, max(len(data.train_idx) // cfg.batch_size, 1))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, hop_feats, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, hop_feats)
            return masked_softmax_cross_entropy(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, loss,
                accuracy(logits, labels))

    @jax.jit
    def infer(params, hop_feats):
        return model.apply({"params": params}, hop_feats)

    def evaluate(params, idx):
        correct, total = 0, 0
        for i in range(0, len(idx) - cfg.batch_size + 1, cfg.batch_size):
            sel = idx[i:i + cfg.batch_size]
            hops = multihop_sampling(sel, cfg.fanouts, indptr, indices, rng)
            logits = infer(params, _gather_hops(feats_dev, hops))
            correct += int((np.argmax(np.asarray(logits), -1)
                            == data.labels[sel]).sum())
            total += len(sel)
        return correct / max(total, 1)

    history = []
    t0 = time.perf_counter()
    train_idx = np.asarray(data.train_idx)
    for epoch in range(1, cfg.epochs + 1):
        rng.shuffle(train_idx)
        tot, nb = 0.0, 0
        for i in range(0, len(train_idx) - cfg.batch_size + 1,
                       cfg.batch_size):
            sel = train_idx[i:i + cfg.batch_size]
            hops = multihop_sampling(sel, cfg.fanouts, indptr, indices, rng)
            params, opt_state, loss, acc = step(
                params, opt_state, _gather_hops(feats_dev, hops),
                jnp.asarray(data.labels[sel]))
            tot += float(loss)
            nb += 1
        val_acc = evaluate(params, np.asarray(data.val_idx))
        history.append((epoch, tot / max(nb, 1), val_acc))
        if verbose:
            print(f"epoch {epoch}: loss {history[-1][1]:.4f} "
                  f"val_acc {val_acc:.4f} "
                  f"({time.perf_counter()-t0:.1f}s)")
    test_acc = evaluate(params, np.asarray(data.test_idx))
    return params, history, test_acc


def train_sage_supervised_device(data, cfg: SageConfig,
                                 verbose: bool = False):
    """Fully on-device GraphSAGE: sampling, feature gather, forward and
    update all inside one jitted `lax.scan` per epoch — the host streams
    nothing but an epoch RNG key. Same math as the host-sampled path
    (with-replacement fanout draws, GraphSAGE_Pytorch/sample_utils.py:4-35).
    """
    from ..sampling.device_neighbor import (
        build_device_neighbor_table, device_multihop_sampling)

    indptr, indices, _ = csr_from_edges(
        data.senders, data.receivers, data.features.shape[0])
    table, deg = build_device_neighbor_table(
        indptr, indices, max_deg=cfg.max_table_degree)
    feats_dev = jnp.asarray(data.features)
    labels_dev = jnp.asarray(data.labels)
    dims = (cfg.hidden, data.num_classes)
    model = SampledGraphSAGE(dims=dims, fanouts=tuple(cfg.fanouts),
                             aggregator=cfg.aggregator)

    B = cfg.batch_size
    train_np = np.asarray(data.train_idx)
    if len(train_np) < B:  # wrap-pad tiny splits to one full static batch
        train_np = np.resize(train_np, B)
    train_ids = jnp.asarray(train_np, jnp.int32)
    nb = max(len(train_ids) // B, 1)

    key0 = jax.random.PRNGKey(cfg.seed)
    hops0 = device_multihop_sampling(key0, train_ids[:B], cfg.fanouts,
                                     table, deg)
    params = model.init(key0, [feats_dev[h] for h in hops0])["params"]
    tx = _make_tx(cfg, nb)
    opt_state = tx.init(params)

    def batch_loss(p, key, sel):
        hops = device_multihop_sampling(key, sel, cfg.fanouts, table, deg)
        logits = model.apply({"params": p}, [feats_dev[h] for h in hops])
        y = labels_dev[sel]
        return masked_softmax_cross_entropy(logits, y), (logits, y)

    @jax.jit
    def run_epoch(params, opt_state, key):
        kperm, kscan = jax.random.split(key)
        perm = jax.random.permutation(kperm, train_ids)[:nb * B]
        batches = perm.reshape(nb, B)

        def body(carry, sel):
            params, opt_state, k = carry
            k, kb = jax.random.split(k)
            (loss, (logits, y)), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params, kb, sel)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, k), (loss, accuracy(logits, y))

        (params, opt_state, _), (losses, accs) = jax.lax.scan(
            body, (params, opt_state, kscan), batches)
        return params, opt_state, losses.mean(), accs.mean()

    @jax.jit
    def eval_batches(params, key, idx_mat):
        def body(k, sel):
            k, kb = jax.random.split(k)
            hops = device_multihop_sampling(kb, sel, cfg.fanouts, table,
                                            deg)
            logits = model.apply({"params": params},
                                 [feats_dev[h] for h in hops])
            return k, accuracy(logits, labels_dev[sel])

        _, accs = jax.lax.scan(body, key, idx_mat)
        return accs.mean()

    def eval_split(params, idx, key):
        idx = np.asarray(idx)
        if len(idx) < B:
            idx = np.resize(idx, B)
        m = max(len(idx) // B, 1)
        mat = jnp.asarray(idx[:m * B].reshape(m, B), jnp.int32)
        return float(eval_batches(params, key, mat))

    history = []
    t0 = time.perf_counter()
    key = key0
    for epoch in range(1, cfg.epochs + 1):
        key, ke, kv = jax.random.split(key, 3)
        params, opt_state, loss, acc = run_epoch(params, opt_state, ke)
        val_acc = eval_split(params, data.val_idx, kv)
        history.append((epoch, float(loss), val_acc))
        if verbose:
            print(f"epoch {epoch}: loss {float(loss):.4f} "
                  f"val_acc {val_acc:.4f} "
                  f"({time.perf_counter()-t0:.1f}s)")
    key, kt = jax.random.split(key)
    test_acc = eval_split(params, data.test_idx, kt)
    return params, history, test_acc


def train_sage_unsupervised(data, cfg: Optional[SageConfig] = None,
                            verbose: bool = False):
    """Context/negative mode (GraphSAGE/data_utils.py:50-70): contexts from
    short uniform walks, negatives from degree^0.75; loss = binary logits
    on dot(emb_u, emb_ctx)=1 and dot(emb_u, emb_neg)=0."""
    cfg = cfg or SageConfig()
    rng = np.random.default_rng(cfg.seed)
    n = data.features.shape[0]
    indptr, indices, _ = csr_from_edges(data.senders, data.receivers, n)
    deg = (indptr[1:] - indptr[:-1]).astype(np.float64)
    neg_sampler = NegativeSampler(np.maximum(deg, 1))

    dims = (cfg.hidden, cfg.hidden)
    model = SampledGraphSAGE(dims=dims, fanouts=tuple(cfg.fanouts),
                             aggregator=cfg.aggregator)
    feats_dev = jnp.asarray(data.features)
    hops0 = multihop_sampling(np.arange(cfg.batch_size), cfg.fanouts,
                              indptr, indices, rng)
    params = model.init(jax.random.PRNGKey(cfg.seed),
                        _gather_hops(feats_dev, hops0))["params"]
    tx = _make_tx(cfg, max(n // cfg.batch_size, 1))
    opt_state = tx.init(params)
    K = cfg.num_negatives

    @partial(jax.jit, static_argnames=("b",))
    def step(params, opt_state, hop_u, hop_c, hop_n, b):
        def loss_fn(p):
            emb_u = model.apply({"params": p}, hop_u)          # [B, D]
            emb_c = model.apply({"params": p}, hop_c)          # [B, D]
            emb_n = model.apply({"params": p}, hop_n)          # [B*K, D]
            emb_n = emb_n.reshape(b, K, -1)
            pos = jnp.sum(emb_u * emb_c, -1)
            neg = jnp.einsum("bd,bkd->bk", emb_u, emb_n)
            logits = jnp.concatenate([pos[:, None], neg], axis=1)
            labels = jnp.concatenate(
                [jnp.ones((b, 1)), jnp.zeros((b, K))], axis=1)
            ls = optax.sigmoid_binary_cross_entropy(logits, labels)
            return ls.mean(), (logits, labels)

        (loss, (logits, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        acc = binary_accuracy(logits, labels)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    # contexts: next node within a short walk from each start
    history = []
    nodes = np.arange(n)
    for epoch in range(1, cfg.epochs + 1):
        rng.shuffle(nodes)
        tot, acc_sum, nb = 0.0, 0.0, 0
        for i in range(0, n - cfg.batch_size + 1, cfg.batch_size):
            batch = nodes[i:i + cfg.batch_size]
            walks = uniform_walks(indptr, indices, batch,
                                  cfg.walk_length, rng)
            ctx = walks[np.arange(len(batch)),
                        rng.integers(1, cfg.walk_length, len(batch))]
            negs = neg_sampler.draw((len(batch) * K,), rng)
            hop_u = multihop_sampling(batch, cfg.fanouts, indptr,
                                      indices, rng)
            hop_c = multihop_sampling(ctx, cfg.fanouts, indptr,
                                      indices, rng)
            hop_n = multihop_sampling(negs, cfg.fanouts, indptr,
                                      indices, rng)
            params, opt_state, loss, acc = step(
                params, opt_state,
                _gather_hops(feats_dev, hop_u),
                _gather_hops(feats_dev, hop_c),
                _gather_hops(feats_dev, hop_n), len(batch))
            tot += float(loss)
            acc_sum += float(acc)
            nb += 1
        history.append((epoch, tot / max(nb, 1), acc_sum / max(nb, 1)))
        if verbose:
            print(f"epoch {epoch}: loss {history[-1][1]:.4f} "
                  f"binary_acc {history[-1][2]:.4f}")
    return params, history


def sage_embed_all(model_params, data, cfg: SageConfig,
                   hidden_out: int | None = None) -> np.ndarray:
    """Embed every node with the trained unsupervised model."""
    rng = np.random.default_rng(cfg.seed)
    n = data.features.shape[0]
    indptr, indices, _ = csr_from_edges(data.senders, data.receivers, n)
    model = SampledGraphSAGE(
        dims=(cfg.hidden, hidden_out or cfg.hidden),
        fanouts=tuple(cfg.fanouts), aggregator=cfg.aggregator)
    feats_dev = jnp.asarray(data.features)
    infer = jax.jit(lambda p, h: model.apply({"params": p}, h))
    out = []
    b = cfg.batch_size
    idx = np.arange(n)
    pad = (-len(idx)) % b
    idx_p = np.concatenate([idx, idx[:pad]])
    for i in range(0, len(idx_p), b):
        sel = idx_p[i:i + b]
        hops = multihop_sampling(sel, cfg.fanouts, indptr, indices, rng)
        out.append(np.asarray(infer(model_params,
                                    _gather_hops(feats_dev, hops))))
    return np.concatenate(out)[:n]
