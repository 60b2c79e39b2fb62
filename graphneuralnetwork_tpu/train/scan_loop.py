"""On-device multi-epoch training: fold whole epoch blocks into one jitted
``lax.scan`` dispatch.

The reference dispatches one optimizer step per Python-loop iteration
(GCN/train_eval.py:41-48); through a remote TPU tunnel each dispatch costs
~30ms, dwarfing sub-millisecond full-batch steps. ``scan_epochs`` runs K
epochs per dispatch entirely on device — the epochs/s headline path.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .loop import TrainState
from .metrics import accuracy, masked_softmax_cross_entropy


def make_scanned_node_classification_run(model, epochs_per_call: int):
    """Returns jitted fn: (state, graph, x, labels, train_idx, val_idx) ->
    (state, metrics dict of [K]-arrays with loss/train_acc/val_loss/val_acc
    sampled every epoch)."""

    @partial(jax.jit, static_argnums=())
    def run(state: TrainState, graph, x, labels, train_idx, val_idx):
        def epoch(carry, _):
            state = carry
            rng, new_rng = jax.random.split(state.dropout_rng)

            def loss_fn(params):
                logits = state.apply_fn(
                    {"params": params}, graph, x,
                    deterministic=False, rngs={"dropout": rng})
                sel = logits[train_idx]
                return masked_softmax_cross_entropy(
                    sel, labels[train_idx]), sel

            (loss, sel), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            state = state.replace(dropout_rng=new_rng)

            val_logits = state.apply_fn(
                {"params": state.params}, graph, x, deterministic=True)
            vsel = val_logits[val_idx]
            metrics = dict(
                loss=loss,
                train_acc=accuracy(sel, labels[train_idx]),
                val_loss=masked_softmax_cross_entropy(
                    vsel, labels[val_idx]),
                val_acc=accuracy(vsel, labels[val_idx]),
            )
            return state, metrics

        state, ms = jax.lax.scan(epoch, state, None, length=epochs_per_call)
        return state, ms

    return run


def fit_node_classifier_scan(
    model, data, *,
    epochs: int,
    optimizer,
    epochs_per_call: int = 100,
    patience_calls: int = 3,
    seed: int = 0,
    verbose: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = False,
):
    """Chunked fit: K epochs per device dispatch, host checks early-stop
    between chunks. Returns a loop.FitResult.

    ``checkpoint_dir`` saves params+opt_state on every val improvement
    (GCN/train_eval.py:53-55); ``resume`` loads a prior checkpoint before
    training, mirroring the reference's ``is_current_train`` flag
    (GTN/train_utils/train_eval.py:22-25)."""
    import time

    import numpy as np

    from .loop import FitResult, create_train_state, make_eval_fn

    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, data.graph, data.features, rng,
                               optimizer)
    # Resume restores params/opt state and then trains the full ``epochs``
    # budget on top — the reference loads the checkpoint and reruns its
    # configured loop (GTN/train_utils/train_eval.py:22-25).
    start_epoch = 0
    if resume and checkpoint_dir is not None:
        from .checkpoint import restore_checkpoint
        try:
            state, start_epoch = restore_checkpoint(checkpoint_dir, state)
            if verbose:
                print(f"resumed from {checkpoint_dir} "
                      f"at epoch {start_epoch}")
        except FileNotFoundError:
            pass  # fresh run — the flag tolerates a missing first ckpt
    done = 0
    run = make_scanned_node_classification_run(model, epochs_per_call)
    evaluate = make_eval_fn(model)

    best_val = float("inf")
    best_val_acc = 0.0
    best_params = state.params
    bad = 0
    history = []
    t0 = time.perf_counter()
    while done < epochs:
        state, ms = run(state, data.graph, data.features, data.labels,
                        data.train_idx, data.val_idx)
        done += epochs_per_call
        # best-val selection at chunk granularity: params correspond to the
        # END of the chunk, so compare the chunk-end val loss.
        end_val = float(np.asarray(ms["val_loss"])[-1])
        history.append((done, float(ms["loss"][-1]),
                        float(ms["train_acc"][-1]), end_val,
                        float(ms["val_acc"][-1])))
        if verbose:
            print(f"epoch {done}: val_loss {history[-1][3]:.4f} "
                  f"val_acc {history[-1][4]:.4f}")
        if end_val < best_val:
            best_val = end_val
            best_val_acc = float(np.asarray(ms["val_acc"])[-1])
            best_params = jax.tree.map(lambda a: a, state.params)
            bad = 0
            if checkpoint_dir is not None:
                from .checkpoint import save_checkpoint
                save_checkpoint(checkpoint_dir, state, start_epoch + done)
        else:
            bad += 1
            if bad >= patience_calls:
                break

    final = state.replace(params=best_params)
    test_loss, test_acc = evaluate(
        final, data.graph, data.features, data.labels, data.test_idx)
    return FitResult(
        best_params=best_params, best_val_loss=best_val,
        best_val_acc=best_val_acc, test_loss=float(test_loss),
        test_acc=float(test_acc), epochs_run=done, history=history,
        seconds=time.perf_counter() - t0)
