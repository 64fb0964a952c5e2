"""CLUB mutual-information upper bound (variance-1 "CLUBMean" variant).

Parity target: ``/root/reference/models/Disentangle/utils/club.py:88-130``:
q(y|x) with unit variance parameterised by an MLP mean head; the MI bound
is E[log q(y|x)] - E_neg[log q(y'|x)], the learning loss is the negative
log-likelihood of q.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.losses.common import at_least_f32


class CLUBMean(nn.Module):
    """Mean head: Linear(x_dim, hidden) -> ReLU -> Linear(hidden, y_dim)
    (``club.py:96-103``). Runs in f32: the quadratic forms are
    numerically sensitive and tiny."""

    y_dim: int
    hidden_size: int = 512

    @nn.compact
    def __call__(self, x_samples: jax.Array) -> jax.Array:
        x = at_least_f32(x_samples)
        h = nn.Dense(self.hidden_size, param_dtype=jnp.float32,
                     name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.y_dim, param_dtype=jnp.float32, name="fc2")(h)


def club_losses(mu: jax.Array, y_samples: jax.Array,
                weights: jax.Array | None = None):
    """Given mu = CLUBMean(x), return (mi_upper_bound, learning_loss).

    mi bound (``club.py:105-125``): positive = -(mu - y)^2 / 2 summed over
    dims; negative pairs via the full (B, B) difference; mean over batch.
    learning loss (``club.py:127-130``): -loglikelihood.

    ``weights`` (0/1 per row) excludes padded rows from every reduction
    (incl. the negative-pair means), matching the unpadded computation.
    """
    mu = at_least_f32(mu)
    y = at_least_f32(y_samples)
    positive = -jnp.sum((mu - y) ** 2, axis=-1) / 2.0
    # negative_i = -mean_j ||y_j - mu_i||^2 / 2, expanded algebraically to
    # avoid materialising the reference's (B, B, D) tensor
    # (``club.py:113-119``): mean_j||y_j||^2 - 2 mu_i . mean_j y_j + ||mu_i||^2
    if weights is None:
        y_sq_mean = jnp.mean(jnp.sum(y ** 2, axis=-1))
        y_mean = jnp.mean(y, axis=0)
        wmean = jnp.mean
    else:
        w = weights.astype(jnp.float32)
        denom = jnp.clip(jnp.sum(w), 1.0)
        y_sq_mean = jnp.sum(jnp.sum(y ** 2, axis=-1) * w) / denom
        y_mean = jnp.sum(y * w[:, None], axis=0) / denom
        wmean = lambda v: jnp.sum(v * w) / denom
    negative = -(y_sq_mean - 2.0 * (mu @ y_mean)
                 + jnp.sum(mu ** 2, axis=-1)) / 2.0
    mi_bound = wmean(positive - negative)
    learning_loss = wmean(jnp.sum((mu - y) ** 2, axis=1))
    return mi_bound, learning_loss
