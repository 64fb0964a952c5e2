"""Streaming classification metrics as pure state pytrees.

Replaces the reference's torchmetrics Accuracy/AUROC accumulators
(``/root/reference/models/Disentangle/STiLModel.py:122-152``) with
device-resident state that can be updated *inside* a jitted eval step —
no host sync per batch.

- Accuracy: exact (correct, total) counters. Binary task follows
  torchmetrics semantics: a (B,) class-1 probability thresholded at 0.5
  (``STiLModel.py:461-464``).
- AUROC: histogram-bucketed scores (default 8192 buckets). Binary AUC is
  the rank statistic over bucket counts (ties get 0.5 credit), matching
  torchmetrics within bucket resolution (~1e-4). Multiclass uses
  macro-averaged one-vs-rest per-class histograms.

All updates support a `weight` mask so padded batch tails don't count.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.struct

DEFAULT_BUCKETS = 8192


@flax.struct.dataclass
class AccuracyState:
    correct: jax.Array  # f32 scalar
    total: jax.Array  # f32 scalar


def accuracy_init() -> AccuracyState:
    return AccuracyState(jnp.zeros((), jnp.float32),
                         jnp.zeros((), jnp.float32))


def accuracy_update(state: AccuracyState, preds: jax.Array,
                    labels: jax.Array,
                    weight: Optional[jax.Array] = None) -> AccuracyState:
    """preds: (B, C) probabilities/logits, or (B,) class-1 prob (binary)."""
    if preds.ndim == 2:
        pred_cls = jnp.argmax(preds, axis=-1)
    else:
        pred_cls = (preds >= 0.5).astype(jnp.int32)
    hit = (pred_cls == labels.astype(pred_cls.dtype)).astype(jnp.float32)
    if weight is None:
        weight = jnp.ones_like(hit)
    weight = weight.astype(jnp.float32)
    return AccuracyState(state.correct + jnp.sum(hit * weight),
                         state.total + jnp.sum(weight))


def accuracy_compute(state: AccuracyState) -> jax.Array:
    return state.correct / jnp.clip(state.total, 1.0)


@flax.struct.dataclass
class AUROCState:
    pos: jax.Array  # (C, K) or (K,) positive-score histogram
    neg: jax.Array


def auroc_init(num_classes: int = 2,
               num_buckets: int = DEFAULT_BUCKETS) -> AUROCState:
    if num_classes == 2:
        shape = (num_buckets,)
    else:
        shape = (num_classes, num_buckets)
    return AUROCState(jnp.zeros(shape, jnp.float32),
                      jnp.zeros(shape, jnp.float32))


def _bucketize(scores: jax.Array, num_buckets: int) -> jax.Array:
    idx = jnp.floor(jnp.clip(scores, 0.0, 1.0) * (num_buckets - 1) + 0.5)
    return idx.astype(jnp.int32)


def auroc_update(state: AUROCState, preds: jax.Array, labels: jax.Array,
                 weight: Optional[jax.Array] = None) -> AUROCState:
    """Binary: preds (B,) class-1 prob. Multiclass: preds (B, C) probs."""
    if state.pos.ndim == 1:
        k = state.pos.shape[0]
        if preds.ndim == 2:
            preds = preds[:, 1]
        if weight is None:
            weight = jnp.ones(preds.shape[0], jnp.float32)
        weight = weight.astype(jnp.float32)
        idx = _bucketize(preds, k)
        is_pos = (labels == 1).astype(jnp.float32) * weight
        is_neg = (labels == 0).astype(jnp.float32) * weight
        return AUROCState(state.pos.at[idx].add(is_pos),
                          state.neg.at[idx].add(is_neg))
    c, k = state.pos.shape
    if weight is None:
        weight = jnp.ones(preds.shape[0], jnp.float32)
    weight = weight.astype(jnp.float32)
    idx = _bucketize(preds, k)  # (B, C)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32) * weight[:, None]
    counter = jnp.zeros((c, k), jnp.float32)
    flat_idx = jnp.arange(c)[None, :] * k + idx
    pos = counter.reshape(-1).at[flat_idx.reshape(-1)].add(
        onehot.reshape(-1)).reshape(c, k)
    neg = counter.reshape(-1).at[flat_idx.reshape(-1)].add(
        ((weight[:, None] - onehot)).reshape(-1)).reshape(c, k)
    return AUROCState(state.pos + pos, state.neg + neg)


def _auc_from_hist(pos: jax.Array, neg: jax.Array) -> jax.Array:
    p_total = jnp.sum(pos, axis=-1)
    n_total = jnp.sum(neg, axis=-1)
    neg_below = jnp.cumsum(neg, axis=-1) - neg
    credit = pos * (neg_below + 0.5 * neg)
    auc = jnp.sum(credit, axis=-1) / jnp.clip(p_total * n_total, 1.0)
    valid = (p_total > 0) & (n_total > 0)
    return auc, valid


def auroc_compute(state: AUROCState) -> jax.Array:
    auc, valid = _auc_from_hist(state.pos, state.neg)
    if state.pos.ndim == 1:
        return jnp.where(valid, auc, 0.0)
    # macro average over classes present in the data
    valid_f = valid.astype(jnp.float32)
    return jnp.sum(auc * valid_f) / jnp.clip(jnp.sum(valid_f), 1.0)
