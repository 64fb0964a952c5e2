"""Prototype clustering loss (PGLS).

Parity target: ``/root/reference/utils/prototype_loss.py:14-40``:
softmax(feat @ prototypes.T / T), log, CE against the hard argmax of the
(soft) label, masked to confident samples (max prob >= threshold), mean
over the *full* batch (confident-sample losses averaged over all rows,
exactly as the reference's ``(loss * conf_mask).mean()``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stil_tta_tpu.losses.common import at_least_f32


def prototype_loss(label: jax.Array, prototypes: jax.Array, feat: jax.Array,
                   temperature: float, threshold: float) -> jax.Array:
    label = at_least_f32(label)
    sim = (at_least_f32(feat) @ at_least_f32(prototypes).T) \
        / temperature
    sim = jax.nn.softmax(sim, axis=1)
    log_sim = jnp.log(sim + 1e-7)

    max_prob = jnp.max(label, axis=1)
    max_id = jnp.argmax(label, axis=1)
    conf_mask = (max_prob >= threshold).astype(jnp.float32)
    picked = jnp.take_along_axis(log_sim, max_id[:, None], axis=1)[:, 0]
    return jnp.mean(-picked * conf_mask)
