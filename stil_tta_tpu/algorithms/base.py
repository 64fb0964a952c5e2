"""Shared algorithm scaffolding.

The reference copy-pastes ~70% of its Lightning modules across 8
algorithms (SURVEY.md §7.6). Here the shared machinery — train state,
EMAN/EMA teacher update, distribution alignment, confidence masking,
pseudo-label sharpening — lives once, and each algorithm is a thin pure
train-step over it.

Every piece of mutable cross-step state the reference keeps in torch
buffers (EMA weights, DA queue, prototypes, feature banks, FreeMatch EMA
scalars — SURVEY.md §6 'mutable cross-step state under jit') is an
explicit field of a donated flax.struct dataclass threaded through the
jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from stil_tta_tpu.losses.common import at_least_f32
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    """Common trainable state; algorithms extend it."""

    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None        # teacher subtree (see each algorithm)
    ema_batch_stats: Any = None
    rng: Any = None
    step: jax.Array = flax.struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def ema_update(ema_tree, new_tree, momentum: float, eman: bool = True,
               ema_stats=None, new_stats=None):
    """EMAN teacher update (``STiLModel.py:154-168``): lerp every weight;
    with ``eman`` also lerp the BN running stats (they live in the torch
    state_dict); integer batch counters (which we don't keep) were
    copied. With ``eman=False`` only parameters are lerped and the
    teacher's BN stats stay frozen at their init copy."""
    lerp = lambda e, p: e * momentum + (1.0 - momentum) * p
    new_ema = jax.tree_util.tree_map(lerp, ema_tree, new_tree)
    if ema_stats is None:
        return new_ema
    if eman:
        new_ema_stats = jax.tree_util.tree_map(lerp, ema_stats, new_stats)
    else:
        new_ema_stats = ema_stats
    return new_ema, new_ema_stats


@flax.struct.dataclass
class DAState:
    """Distribution-alignment queue (``STiLModel.py:100-104, 171-180``):
    a 256-deep ring of batch-mean class distributions."""

    queue: jax.Array  # (L, C)
    ptr: jax.Array    # () int32

    @classmethod
    def create(cls, num_classes: int, length: int = 256) -> "DAState":
        return cls(jnp.zeros((length, num_classes), jnp.float32),
                   jnp.zeros((), jnp.int32))


def distribution_alignment(da: DAState, probs: jax.Array):
    """Align probs by the running marginal. Under GSPMD the batch mean is
    already global (the reference all-reduces then divides by world size
    — ``STiLModel.py:172-176``)."""
    mean = jnp.mean(probs, axis=0)
    queue = da.queue.at[da.ptr].set(mean)
    ptr = (da.ptr + 1) % da.queue.shape[0]
    aligned = probs / jnp.clip(jnp.mean(queue, axis=0), 1e-12)
    aligned = aligned / jnp.sum(aligned, axis=1, keepdims=True)
    return DAState(queue, ptr), jax.lax.stop_gradient(aligned)


def sharpen(logits: jax.Array, temperature: float) -> jax.Array:
    """``STiLModel.py:195-196``."""
    return jax.nn.softmax(
        at_least_f32(jax.lax.stop_gradient(logits)) / temperature,
        axis=1)


def one_hot_hard(probs: jax.Array) -> jax.Array:
    return jax.nn.one_hot(jnp.argmax(probs, axis=1), probs.shape[-1],
                          dtype=jnp.float32)


def merge_subtree(params, path: str, subtree):
    """Functional replacement of a top-level submodule's params."""
    d = dict(params)
    d[path] = subtree
    return type(params)(d) if not isinstance(params, dict) else d


def tree_copy(tree):
    return jax.tree_util.tree_map(jnp.array, tree)
