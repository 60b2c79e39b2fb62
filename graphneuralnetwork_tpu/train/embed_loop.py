"""Training loops for the embedding family (skip-gram style models).

One masked-BCE trainer covers DeepWalk / Node2vec / Struc2Vec /
MetaPath2Vec (replacing their copied train_eval loops, e.g.
DeepWalk/train_eval.py:17-71) plus LINE's combined first+second-order loss
(LINE/train_eval.py:47-51). Batches are streamed host→device; the step is
jitted once (static batch shapes from sampling/skipgram.batchify).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .metrics import binary_accuracy, masked_sigmoid_bce


def shard_batch_arrays(arrays, mesh, axis: str = "data"):
    """Data-parallel placement for skip-gram batches — the TPU analogue of
    the reference's ``nn.DataParallel`` scatter (LINE/train_eval.py:23):
    batch rows shard over the mesh, params stay replicated, and GSPMD
    inserts the gradient psum. Use inside a jitted step by passing sharded
    inputs; no code change to the step itself.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = []
    for a in arrays:
        spec = P(axis, *([None] * (jnp.ndim(a) - 1)))
        out.append(jax.device_put(jnp.asarray(a), NamedSharding(mesh,
                                                                spec)))
    return tuple(out)


def make_skipgram_step(model, tx):
    @jax.jit
    def step(params, opt_state, centers, ctx_neg, labels, mask):
        def loss_fn(p):
            logits = model.apply({"params": p}, centers, ctx_neg)
            return masked_sigmoid_bce(logits, labels, mask), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = binary_accuracy(logits, labels, mask)
        return params, opt_state, loss, acc

    return step


def make_line_step(model, tx):
    """LINE loss: BCE(first) + weight·BCE(second), pagerank/per-center
    weights optional (LINE/train_eval.py:47-51)."""

    @jax.jit
    def step(params, opt_state, centers, ctx_neg, labels, mask, weights):
        def loss_fn(p):
            first, second = model.apply({"params": p}, centers, ctx_neg)
            l1 = masked_sigmoid_bce(first, labels, mask)
            # per-center weighting of the 2nd-order term
            per = masked_sigmoid_bce(second * weights[:, None], labels, mask)
            return l1 + per, (first, second)

        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train_skipgram(
    model, arrays, *,
    epochs: int, batch_size: int,
    optimizer: optax.GradientTransformation,
    rng: Optional[np.random.Generator] = None,
    seed: int = 0, verbose: bool = False,
    step_fn_factory: Callable = make_skipgram_step,
    extra_batch_arrays: tuple = (),
    device_loop: Optional[bool] = None,
    device_loss_fn: Optional[Callable] = None,
):
    """Generic minibatch trainer; ``arrays`` = (centers, ctx_neg, labels,
    mask) [+ extras]. Returns (params, history).

    ``device_loop=True`` keeps the whole corpus on device and runs each
    epoch (shuffle + every batch step) inside ONE ``lax.scan`` dispatch —
    the host-streamed loop pays ~30 ms of tunnel latency per 256-row
    batch, which dominates wall-clock for every embedder on TPU. Default:
    on for accelerators when the loss is scan-expressible (the plain
    skip-gram step, or a caller-supplied ``device_loss_fn(params,
    *batch) -> (loss, acc)`` such as LINE's weighted loss). Passing
    ``device_loop=True`` with a custom ``step_fn_factory`` and no
    ``device_loss_fn`` raises: the scan body cannot express the custom
    step, and silently substituting the default skip-gram loss would
    train the wrong objective.

    Reproducibility note: the two paths draw their epoch shuffles from
    different RNGs — the device loop folds ``seed`` into a
    ``jax.random.PRNGKey`` while the host loop consumes the caller's
    numpy ``rng`` — so a CPU (host-loop) run and a TPU (device-loop) run
    with the same seed see different batch orders. Each path is
    individually deterministic given (seed, backend).
    """
    from ..sampling.skipgram import minibatches

    rng = rng or np.random.default_rng(seed)
    centers = arrays[0]
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(centers[:batch_size]),
        jnp.asarray(arrays[1][:batch_size]))["params"]
    tx = optimizer
    opt_state = tx.init(params)
    all_arrays = tuple(arrays) + tuple(extra_batch_arrays)
    if device_loop is None:
        device_loop = ((step_fn_factory is make_skipgram_step
                        or device_loss_fn is not None)
                       and jax.default_backend() != "cpu")
    elif (device_loop and step_fn_factory is not make_skipgram_step
          and device_loss_fn is None):
        raise ValueError(
            "device_loop=True with a custom step_fn_factory requires a "
            "device_loss_fn — the scanned epoch cannot express the custom "
            "step, and falling back to the default skip-gram loss would "
            "silently train the wrong objective (use device_loop=False, "
            "or supply device_loss_fn)")

    history = []
    t0 = time.perf_counter()

    if device_loop and len(centers) < batch_size:
        # fewer pairs than one batch: the reshape below would fail and
        # the host path handles the tiny-corpus case gracefully
        device_loop = False
    if device_loop:
        n = len(centers)
        nb = n // batch_size
        # arrays are jit ARGUMENTS: closing over them embeds the whole
        # corpus as HLO constants and the remote compile endpoint
        # rejects the request (HTTP 413) for large corpora (struc2vec)
        dev_arrays = tuple(jnp.asarray(a) for a in all_arrays)

        @jax.jit
        def epoch_fn(params, opt_state, key, *arrs):
            perm = jax.random.permutation(key, n)[: nb * batch_size]
            batches = tuple(a[perm].reshape((nb, batch_size)
                                            + a.shape[1:])
                            for a in arrs)

            def body(carry, batch):
                p, o = carry
                if device_loss_fn is not None:
                    (loss, acc), grads = jax.value_and_grad(
                        device_loss_fn, has_aux=True)(p, *batch)
                else:
                    centers_b, ctx_b, labels_b, mask_b = batch[:4]

                    def loss_fn(pp):
                        logits = model.apply({"params": pp}, centers_b,
                                             ctx_b)
                        return masked_sigmoid_bce(logits, labels_b,
                                                  mask_b), logits

                    (loss, logits), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(p)
                    acc = binary_accuracy(logits, labels_b, mask_b)
                upd, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, upd)
                return (p, o), (loss, acc)

            (params, opt_state), (losses, accs) = jax.lax.scan(
                body, (params, opt_state), batches)
            return params, opt_state, losses.mean(), accs.mean()

        key = jax.random.PRNGKey(seed ^ 0x5F5E)
        for epoch in range(1, epochs + 1):
            key, sub = jax.random.split(key)
            params, opt_state, loss, acc = epoch_fn(params, opt_state,
                                                    sub, *dev_arrays)
            history.append((epoch, float(loss), float(acc)))
            if verbose:
                print(f"epoch {epoch}: loss {history[-1][1]:.4f} "
                      f"acc {history[-1][2]:.4f} "
                      f"({time.perf_counter() - t0:.1f}s)")
        return params, history

    step = step_fn_factory(model, tx)
    for epoch in range(1, epochs + 1):
        losses, accs, nb = 0.0, 0.0, 0
        for batch in minibatches(all_arrays, batch_size, rng):
            out = step(params, opt_state, *map(jnp.asarray, batch))
            params, opt_state, loss = out[0], out[1], out[2]
            losses += float(loss)
            accs += float(out[3]) if len(out) > 3 else 0.0
            nb += 1
        history.append((epoch, losses / max(nb, 1), accs / max(nb, 1)))
        if verbose:
            print(f"epoch {epoch}: loss {history[-1][1]:.4f} "
                  f"acc {history[-1][2]:.4f} "
                  f"({time.perf_counter() - t0:.1f}s)")
    return params, history


def get_embedding(params, table: str = "center") -> np.ndarray:
    """Extract the learned node embedding table
    (DeepWalk/train_eval.py:74-87, minus the hardcoded .cuda() bug)."""
    return np.asarray(params[table])
