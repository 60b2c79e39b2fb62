"""Jitted training loop with the reference's training semantics.

One ``TrainState`` + ``train_step`` factory replaces the per-model
``train_eval.py`` copies. Preserved behaviors:

  * best-val checkpointing: save params whenever val loss improves
    (GCN/train_eval.py:49-55),
  * early stop after ``patience`` non-improving evals
    (GCN/train_eval.py:65-67),
  * eval every ``eval_every`` epochs (GCN/train_eval.py:49),
  * optional warmup+poly LR (HAN/train_utils/optimizer_utils.py:5-24).

Design difference from the reference: evaluation is folded into the same
jitted step (full-batch models) or a jitted eval fn, and the Python loop
only orchestrates host-side decisions (early stop, checkpointing). The
entire epoch runs on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .metrics import accuracy, masked_softmax_cross_entropy


class TrainState(train_state.TrainState):
    """flax TrainState + dropout rng."""
    dropout_rng: jax.Array = None


def create_train_state(model, graph, features, rng, tx,
                       init_kwargs: Optional[dict] = None) -> TrainState:
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(params_rng, graph, features,
                           **(init_kwargs or {}))
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        dropout_rng=dropout_rng)


def make_node_classification_step(model) -> Callable:
    """Jitted full-batch step: forward → masked CE on train_idx → adam/sgd
    update; returns (state, loss, train_acc). Mirrors the per-epoch body of
    GCN/train_eval.py:41-48."""

    @jax.jit
    def step(state: TrainState, graph, features, labels, train_idx):
        rng, new_rng = jax.random.split(state.dropout_rng)

        def loss_fn(params):
            logits = state.apply_fn(
                {"params": params}, graph, features,
                deterministic=False, rngs={"dropout": rng})
            sel = logits[train_idx]
            loss = masked_softmax_cross_entropy(sel, labels[train_idx])
            return loss, sel

        (loss, sel), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(dropout_rng=new_rng)
        acc = accuracy(sel, labels[train_idx])
        return state, loss, acc

    return step


def make_eval_fn(model) -> Callable:
    @jax.jit
    def evaluate(state: TrainState, graph, features, labels, idx):
        logits = state.apply_fn({"params": state.params}, graph, features,
                                deterministic=True)
        sel = logits[idx]
        loss = masked_softmax_cross_entropy(sel, labels[idx])
        return loss, accuracy(sel, labels[idx])

    return evaluate


@dataclass
class FitResult:
    best_params: Any
    best_val_loss: float
    best_val_acc: float
    test_loss: float = float("nan")
    test_acc: float = float("nan")
    epochs_run: int = 0
    history: list = field(default_factory=list)
    seconds: float = 0.0


def fit_node_classifier(
    model, data, *,
    epochs: int,
    optimizer: optax.GradientTransformation,
    eval_every: int = 20,
    patience: int = 10,
    seed: int = 0,
    verbose: bool = False,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> FitResult:
    """Full training run with best-val selection + early stop + final test,
    mirroring the control flow of GCN/train_eval.py:20-83. ``resume``
    restores a prior checkpoint first (is_current_train,
    GTN/train_utils/train_eval.py:22-25)."""
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, data.graph, data.features, rng,
                               optimizer)
    if resume and checkpoint_dir is not None:
        from .checkpoint import restore_checkpoint
        try:
            state, _ = restore_checkpoint(checkpoint_dir, state)
        except FileNotFoundError:
            pass
    step = make_node_classification_step(model)
    evaluate = make_eval_fn(model)

    best_val = float("inf")
    best_val_acc = 0.0
    best_params = state.params
    bad_evals = 0
    history = []
    t0 = time.perf_counter()
    epochs_run = 0

    for epoch in range(1, epochs + 1):
        state, loss, train_acc = step(
            state, data.graph, data.features, data.labels, data.train_idx)
        epochs_run = epoch
        if epoch % eval_every == 0 or epoch == epochs:
            val_loss, val_acc = evaluate(
                state, data.graph, data.features, data.labels, data.val_idx)
            val_loss = float(val_loss)
            history.append((epoch, float(loss), float(train_acc),
                            val_loss, float(val_acc)))
            if verbose:
                print(f"epoch {epoch}: loss {float(loss):.4f} "
                      f"train_acc {float(train_acc):.4f} "
                      f"val_loss {val_loss:.4f} val_acc {float(val_acc):.4f}")
            if val_loss < best_val:
                best_val = val_loss
                best_val_acc = float(val_acc)
                best_params = jax.tree.map(lambda a: a, state.params)
                bad_evals = 0
                if checkpoint_dir is not None:
                    from .checkpoint import save_checkpoint
                    save_checkpoint(checkpoint_dir, state, epoch)
            else:
                bad_evals += 1
                if bad_evals >= patience:   # GCN/train_eval.py:65-67
                    break

    # test with best params (GCN/train_eval.py:70-83)
    final = state.replace(params=best_params)
    test_loss, test_acc = evaluate(
        final, data.graph, data.features, data.labels, data.test_idx)
    return FitResult(
        best_params=best_params,
        best_val_loss=best_val,
        best_val_acc=best_val_acc,
        test_loss=float(test_loss),
        test_acc=float(test_acc),
        epochs_run=epochs_run,
        history=history,
        seconds=time.perf_counter() - t0,
    )
