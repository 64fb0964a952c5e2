"""Shared loss primitives (pure functions, f32).

``cross_entropy`` matches ``torch.nn.CrossEntropyLoss`` /
``F.cross_entropy`` semantics (softmax + NLL over the last axis);
``soft_cross_entropy`` is the soft-target form the reference uses for
pseudo-label losses (``STiLModel.py:301-303``). ``entropy_loss`` is
FreeMatch's self-adaptive fairness regularizer
(``/root/reference/models/MatchModel/FreeMatchFolder/freematch_utils.py:17-45``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def at_least_f32(x: jax.Array) -> jax.Array:
    """Cast to f32 for bf16 inputs but KEEP f64 (promote, never
    truncate) — f64 end-to-end parity tests rely on the loss graph not
    injecting f32 noise; bf16/f32 production HLO is unchanged."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  reduction: str = "mean") -> jax.Array:
    logits = at_least_f32(logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def soft_cross_entropy(logits: jax.Array, target_probs: jax.Array,
                       reduction: str = "mean") -> jax.Array:
    logits = at_least_f32(logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.sum(at_least_f32(target_probs) * logp, axis=-1)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def entropy_loss(mask: jax.Array, logits_s: jax.Array, prob_model: jax.Array,
                 label_hist: jax.Array) -> jax.Array:
    """FreeMatch self-adaptive fairness (``freematch_utils.py:17-45``).

    mask: (B,) confidence mask; logits_s: strong-view logits;
    prob_model / label_hist: EMA class-distribution state.
    """
    mask = mask.astype(jnp.float32)
    prob_s = jax.nn.softmax(at_least_f32(logits_s), axis=-1)
    denom = jnp.sum(mask)
    safe = jnp.clip(denom, 1.0)
    # histogram of confident strong predictions (masked select -> weights)
    max_idx_s = jnp.argmax(prob_s, axis=-1)
    num_classes = logits_s.shape[-1]
    hist_s = jnp.zeros(num_classes).at[max_idx_s].add(mask) / safe
    prob_s_mean = jnp.sum(prob_s * mask[:, None], axis=0) / safe

    inv0 = lambda v: jnp.where(v > 0, 1.0 / jnp.clip(v, 1e-12), 0.0)
    mod_prob = prob_model * inv0(label_hist)
    mod_prob = mod_prob / jnp.sum(mod_prob)
    mod_mean_prob = prob_s_mean * inv0(hist_s)
    mod_mean_prob = mod_mean_prob / jnp.clip(jnp.sum(mod_mean_prob), 1e-12)
    loss = jnp.sum(mod_prob * jnp.log(mod_mean_prob + 1e-12))
    # reference guards `mask.sum() > 0` (``freematch_model.py:198-201``)
    return jnp.where(denom > 0, loss, 0.0)
