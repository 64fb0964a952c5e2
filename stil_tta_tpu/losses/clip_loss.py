"""Symmetric InfoNCE (CLIP) loss.

Parity target: ``/root/reference/utils/clip_loss.py:6-40``: L2-normalize
both embeddings, cosine-similarity logits / temperature, CE against the
diagonal in both directions weighted lambda_0 / (1 - lambda_0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stil_tta_tpu.losses.common import at_least_f32, cross_entropy


def clip_loss(out0: jax.Array, out1: jax.Array, temperature: float,
              lambda_0: float = 0.5, row_weights: jax.Array | None = None):
    """``row_weights`` (0/1 per row) excludes padded rows from both the
    similarity matrix (as -1e9 columns) and the loss reduction, making a
    padded batch compute exactly what the reference computes on the
    smaller final batch (its val loader does not pad)."""
    out0 = at_least_f32(out0)
    out1 = at_least_f32(out1)
    out0 = out0 / jnp.clip(jnp.linalg.norm(out0, axis=1, keepdims=True),
                           1e-12)
    out1 = out1 / jnp.clip(jnp.linalg.norm(out1, axis=1, keepdims=True),
                           1e-12)
    logits = (out0 @ out1.T) / temperature
    labels = jnp.arange(out0.shape[0])
    if row_weights is None:
        loss = (lambda_0 * cross_entropy(logits, labels)
                + (1.0 - lambda_0) * cross_entropy(logits.T, labels))
        return loss, logits, labels
    w = row_weights.astype(jnp.float32)
    col_mask = jnp.where(w > 0, 0.0, -1e9)
    logits = logits + col_mask[None, :] + col_mask[:, None]
    denom = jnp.clip(jnp.sum(w), 1.0)
    nll0 = cross_entropy(logits, labels, "none")
    nll1 = cross_entropy(logits.T, labels, "none")
    loss = (lambda_0 * jnp.sum(nll0 * w)
            + (1.0 - lambda_0) * jnp.sum(nll1 * w)) / denom
    return loss, logits, labels
