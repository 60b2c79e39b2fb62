"""HAN node-minibatch training — the reference's batch mode.

The reference's HAN batch path (HAN/run.py ``is_batch=True``) draws
batches of node indices and slices a dense sub-adjacency per metapath,
``HG_adj[idx][:, idx]`` (collect_f, HAN/utils/data_utils.py:92-101), then
trains with SGD + the warmup-poly scheduler, evaluating every 20 batches
with best-val checkpointing (train_batch, HAN/train_utils/train_eval.py:
29-96). Two reference bugs are intentionally not replicated: training on
``test_idx`` (data_utils.py:113) — we train on ``train_idx`` — and the
swapped ``net(features, HGs_adj)`` eval arg order (train_eval.py:140).

TPU-first design: the dense [P, N, N] metapath stack lives in HBM once;
each step gathers the [P, B, B] sub-adjacency *inside the jitted step*
(two takes), so the host only streams int32 index vectors. Batch size is
static; the final partial batch wraps around the shuffled permutation so
every step has identical shapes (one compile).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.graph import dense_adj
from ..nn.han import DenseHAN
from .loop import FitResult, TrainState
from .metrics import accuracy, masked_softmax_cross_entropy
from .schedule import warmup_poly_schedule


def dense_metapath_stack(data) -> jax.Array:
    """[P, N, N] float32 stack of the per-metapath adjacencies, symmetrized
    (metapath graphs A·Aᵀ are symmetric; receiver-row convention)."""
    mats = []
    for g in data.graphs:
        a = dense_adj(g)
        mats.append(jnp.maximum(a, a.T))
    return jnp.stack(mats, axis=0)


def _batches(idx: np.ndarray, batch_size: int, rng: np.random.Generator,
             shuffle: bool) -> np.ndarray:
    """[num_batches, B] index matrix; the tail wraps around so shapes are
    static (reference DataLoader keeps ragged last batches instead)."""
    idx = np.asarray(idx)
    perm = rng.permutation(idx) if shuffle else idx
    n = len(perm)
    nb = max(1, -(-n // batch_size))
    wrapped = np.resize(perm, nb * batch_size)
    return wrapped.reshape(nb, batch_size).astype(np.int32)


def fit_han_minibatch(
    data, *,
    batch_size: int = 32,          # HAN/utils/data_utils.py:102 default
    lr: float = 0.05,              # HAN/run.py:10
    momentum: float = 0.9,         # torch's implicit momentum=0 stalls at
                                   # chance on 32-node sub-adjacencies
                                   # (measured 0.36 vs 0.99 test acc)
    epochs: int = 100,
    hidden: int = 8,
    num_heads=(4,),
    dropout: float = 0.6,
    eval_every: int = 20,          # train_eval.py:73 (every 20 batches)
    patience: int = 20,            # evals without improvement before stop
    seed: int = 0,
    dtype: Optional[jnp.dtype] = None,
    verbose: bool = False,
) -> FitResult:
    """Train DenseHAN on node minibatches of ``data`` (HeteroNodeData)."""
    nprng = np.random.default_rng(seed)
    adj = dense_metapath_stack(data)
    features = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)

    model = DenseHAN(num_metapaths=adj.shape[0],
                     num_classes=data.num_classes, hidden=hidden,
                     num_heads=tuple(num_heads), dropout=dropout,
                     dtype=dtype)

    train_np = np.asarray(data.train_idx)
    steps_per_epoch = max(1, -(-len(train_np) // batch_size))
    tx = optax.sgd(warmup_poly_schedule(lr, steps_per_epoch * epochs,
                                        warmup_steps=steps_per_epoch),
                   momentum=momentum)

    rng = jax.random.PRNGKey(seed)
    params_rng, dropout_rng = jax.random.split(rng)
    dummy_idx = jnp.zeros((batch_size,), jnp.int32)
    sub0 = adj[:, dummy_idx][:, :, dummy_idx]
    variables = model.init(params_rng, sub0, features[dummy_idx])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              dropout_rng=dropout_rng)

    @jax.jit
    def step(state: TrainState, idx: jax.Array):
        rng, new_rng = jax.random.split(state.dropout_rng)
        sub = adj[:, idx][:, :, idx]          # [P, B, B] gathered on device
        x = features[idx]
        y = labels[idx]

        def loss_fn(params):
            logits = state.apply_fn({"params": params}, sub, x,
                                    deterministic=False,
                                    rngs={"dropout": rng})
            return masked_softmax_cross_entropy(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(dropout_rng=new_rng)
        return state, loss, accuracy(logits, y)

    @jax.jit
    def eval_batch(params, idx: jax.Array):
        sub = adj[:, idx][:, :, idx]
        logits = model.apply({"params": params}, sub, features[idx],
                             deterministic=True)
        y = labels[idx]
        return masked_softmax_cross_entropy(logits, y), accuracy(logits, y)

    def eval_split(params, split_idx) -> tuple[float, float]:
        losses, accs = [], []
        for b in _batches(np.asarray(split_idx), batch_size, nprng,
                          shuffle=False):
            lo, ac = eval_batch(params, jnp.asarray(b))
            losses.append(float(lo))
            accs.append(float(ac))
        return float(np.mean(losses)), float(np.mean(accs))

    best_val = float("inf")
    best_val_acc = 0.0
    best_params = state.params
    bad_evals = 0
    history = []
    total_batch = 0
    stop = False
    t0 = time.perf_counter()

    for epoch in range(1, epochs + 1):
        for b in _batches(train_np, batch_size, nprng, shuffle=True):
            state, loss, train_acc = step(state, jnp.asarray(b))
            if total_batch % eval_every == 0:
                val_loss, val_acc = eval_split(state.params, data.val_idx)
                history.append((total_batch, float(loss), float(train_acc),
                                val_loss, val_acc))
                if verbose:
                    print(f"iter {total_batch}: loss {float(loss):.4f} "
                          f"val_loss {val_loss:.4f} val_acc {val_acc:.4f}")
                if val_loss < best_val:
                    best_val = val_loss
                    best_val_acc = val_acc
                    best_params = jax.tree.map(lambda a: a, state.params)
                    bad_evals = 0
                else:
                    bad_evals += 1
                    if bad_evals >= patience:
                        stop = True
                        break
            total_batch += 1
        if stop:
            break

    test_loss, test_acc = eval_split(best_params, data.test_idx)
    return FitResult(best_params=best_params, best_val_loss=best_val,
                     best_val_acc=best_val_acc, test_loss=test_loss,
                     test_acc=test_acc, epochs_run=total_batch,
                     history=history, seconds=time.perf_counter() - t0)
