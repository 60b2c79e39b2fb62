"""Metric library — the TPU-native form of the reference's scale_utils.

Plain variants replicate GTN/train_utils/scale_utils.py:15-155
(accuracy/TP/TN/FP/FN/precision/recall/Fβ over class predictions); masked
variants replicate GATNE/train_utils/scale_utils.py:4-187 (padded skip-gram
batches with a validity mask); binary-threshold variants cover the
sigmoid>0.5 paths (GraphSAGE/train_eval.py:31-34).

All functions are jit-safe (static num_classes, no data-dependent shapes)
and return f32 scalars, so they can run inside the train step and be
psum-reduced across hosts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy(logits, labels, mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is None:
        return correct.mean()
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)


def binary_accuracy(logits, labels, mask=None, threshold=0.5):
    """sigmoid(logits) > threshold vs {0,1} labels
    (GraphSAGE/train_eval.py:31-34; masked form
    GATNE/train_utils/scale_utils.py:19-31)."""
    pred = (jax.nn.sigmoid(logits) > threshold).astype(jnp.float32)
    correct = (pred == labels.astype(jnp.float32)).astype(jnp.float32)
    if mask is None:
        return correct.mean()
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)


def confusion_counts(pred, labels, num_classes: int, mask=None):
    """Per-class TP/FP/FN/TN as [C] vectors (one-vs-rest)."""
    if mask is None:
        mask = jnp.ones_like(labels, dtype=jnp.float32)
    m = mask.astype(jnp.float32)
    onehot_p = jax.nn.one_hot(pred, num_classes) * m[:, None]
    onehot_l = jax.nn.one_hot(labels, num_classes) * m[:, None]
    tp = jnp.sum(onehot_p * onehot_l, axis=0)
    fp = jnp.sum(onehot_p * (m[:, None] - onehot_l * m[:, None]), axis=0)
    fn = jnp.sum((onehot_l - onehot_p * onehot_l) * m[:, None], axis=0)
    total = jnp.sum(m)
    tn = total - tp - fp - fn
    return tp, fp, fn, tn


def precision_recall_fbeta(logits, labels, num_classes: int, mask=None,
                           beta: float = 1.0, average: str = "macro"):
    """Macro/micro precision, recall, Fβ (GTN scale_utils semantics)."""
    pred = jnp.argmax(logits, axis=-1)
    tp, fp, fn, _ = confusion_counts(pred, labels, num_classes, mask)
    if average == "micro":
        tp, fp, fn = jnp.sum(tp), jnp.sum(fp), jnp.sum(fn)
    prec = tp / jnp.maximum(tp + fp, 1e-12)
    rec = tp / jnp.maximum(tp + fn, 1e-12)
    b2 = beta * beta
    f = (1 + b2) * prec * rec / jnp.maximum(b2 * prec + rec, 1e-12)
    if average == "macro":
        prec, rec, f = prec.mean(), rec.mean(), f.mean()
    return prec, rec, f


def masked_softmax_cross_entropy(logits, labels, mask=None):
    losses = -jax.nn.log_softmax(logits)[
        jnp.arange(labels.shape[0]), labels]
    if mask is None:
        return losses.mean()
    m = mask.astype(losses.dtype)
    return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_sigmoid_bce(logits, labels, mask=None):
    """Masked per-row BCE-with-logits for padded skip-gram batches —
    SigmoidBCELoss (GATNE_Pytorch/train_utils/loss_utils.py:4-10)."""
    losses = optax_sigmoid_bce(logits, labels)
    if mask is None:
        return losses.mean()
    m = mask.astype(losses.dtype)
    # reference reduces per-row: mean over valid entries of each row, then
    # mean over rows — replicate: weight each row by its valid fraction.
    row = jnp.sum(losses * m, axis=-1) / jnp.maximum(
        jnp.sum(m, axis=-1), 1.0)
    return row.mean()


def optax_sigmoid_bce(logits, labels):
    labels = labels.astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


class Accumulator:
    """Running sums for logged means — HAN/train_utils/
    distributed_utils.py:8-22 (host-side, not jitted)."""

    def __init__(self, n: int):
        self.data = [0.0] * n

    def add(self, *args):
        self.data = [a + float(b) for a, b in zip(self.data, args)]

    def reset(self):
        self.data = [0.0] * len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]
