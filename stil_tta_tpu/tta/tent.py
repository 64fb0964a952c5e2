"""Test-time adaptation (TTA).

The "-TTA" fork's contribution is a shifted-distribution evaluation
harness with a ``tta: True`` flag wired to an *unimplemented* hook
(``/root/reference/models/Disentangle/STiLModel.py:523-524``:
``# TODO: Implement TTA here``; ``configs/config_dvm_STiL.yaml:215``).
This module implements it, TPU-style (everything jitted, state threaded):

- ``bn_adapt``: re-estimate BatchNorm running statistics on the shifted
  test distribution (a momentum sweep over test batches).
- ``tent``: entropy minimisation of the multimodal head w.r.t. the
  normalisation affine parameters only (Wang et al., ICLR 2021 — "Tent:
  fully test-time adaptation by entropy minimization"), after a
  bn_adapt pass.
- ``eata`` / ``sar``: sample-filtered and sharpness-aware variants
  (see ``stil_tta_tpu/tta/methods.py``).

Strategy and knobs via config: ``tta_strategy``
('tent' | 'bn_adapt' | 'eata' | 'sar'), ``tta_lr``, ``tta_steps``,
``tta_momentum`` (+ the eata/sar knobs in methods.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stil_tta_tpu.data.loader import EpochSampler


def _is_bn_path(path) -> bool:
    """BatchNorm modules are named bn1/bn2/bn3/downsample_bn in the
    ResNet; LayerNorms ('norm*') are excluded (Tent adapts BN only)."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    return any(str(n).startswith("bn") or str(n).endswith("_bn")
               for n in names)


def bn_param_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_bn_path(path), params)


def entropy(probs: jax.Array) -> jax.Array:
    return -jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1)


def adapt(cfg, algo, state, cache):
    """Adapt ``state`` on the (unlabeled) test cache; returns new state."""
    strategy = cfg.tta_strategy or "tent"
    state = estimate_bn_stats(cfg, algo, state, cache)
    if strategy in ("eata", "sar"):
        from stil_tta_tpu.tta import methods
        return (methods.eata_adapt if strategy == "eata"
                else methods.sar_adapt)(cfg, algo, state, cache)
    if strategy == "bn_adapt":
        return state
    return _tent_phase(cfg, algo, state, cache)


def estimate_bn_stats(cfg, algo, state, cache):
    """Phase 1 of every strategy: BN-statistics re-estimation on the
    shifted test cache (one momentum sweep)."""
    batch_size = int(cfg.batch_size)
    momentum = float(cfg.tta_momentum or 0.1)
    net = algo.net
    aug = algo.aug_eval
    n = int(np.asarray(cache["labels"]).shape[0])

    # ---- phase 1: BN statistics re-estimation on the shifted data.
    # Dropout is disabled for the stats pass (a rate-0 clone) so the
    # re-estimated statistics are noise-free, and flax BatchNorm's
    # internal running-stat momentum is algebraically inverted so that
    # ``tta_momentum`` alone controls the adaptation rate.
    from stil_tta_tpu.models.resnet import BN
    bn_m = float(BN.keywords["momentum"])  # torch-semantics 0.9
    stats_net = net.clone(**{k: 0.0 for k in ("drop_rate",
                                              "embedding_dropout")
                             if hasattr(net, k)})

    @jax.jit
    def stats_step(batch_stats, images, tabular):
        imgs = aug(jax.random.key(0), images)
        _, mut = stats_net.apply(
            {"params": state.params, "batch_stats": batch_stats},
            imgs, tabular, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)})
        # recover the raw test-batch statistics from flax's internal
        # blend (new = m*old + (1-m)*batch), then apply tta_momentum once
        batch = jax.tree_util.tree_map(
            lambda old, new: (new - bn_m * old) / (1.0 - bn_m),
            batch_stats, mut["batch_stats"])
        return jax.tree_util.tree_map(
            lambda old, b: (1 - momentum) * old + momentum * b,
            batch_stats, batch)

    bs = state.batch_stats
    sampler = EpochSampler(n, batch_size, shuffle=True, drop_last=False,
                           seed=0)
    for idx, _ in sampler.epoch():
        bs = stats_step(bs, jnp.take(cache["images"], jnp.asarray(idx), 0),
                        jnp.take(cache["tabular"], jnp.asarray(idx), 0))
    return dataclasses.replace(state, batch_stats=bs)


def _tent_phase(cfg, algo, state, cache):
    # ---- phase 2: Tent — entropy minimisation over BN affine params
    batch_size = int(cfg.batch_size)
    net = algo.net
    aug = algo.aug_eval
    n = int(np.asarray(cache["labels"]).shape[0])
    bs = state.batch_stats
    sampler = EpochSampler(n, batch_size, shuffle=True, drop_last=False,
                           seed=0)
    lr = float(cfg.tta_lr or 1e-3)
    steps = int(cfg.tta_steps or 1)
    from stil_tta_tpu.tta.methods import _masked_tx
    mask = bn_param_mask(state.params)
    not_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    # adam on the BN affine leaves; everything else hard-zeroed
    # (the shared masked chain — eata/sar use the same one)
    tx = _masked_tx(lr, mask, not_mask)
    opt_state = tx.init(state.params)

    @jax.jit
    def tent_step(params, opt_state, images, tabular):
        imgs = aug(jax.random.key(0), images)

        def loss_fn(p):
            outs = net.apply({"params": p, "batch_stats": bs},
                             imgs, tabular, train=False)
            probs = jax.nn.softmax(outs["out_m"].astype(jnp.float32),
                                   axis=1)
            return jnp.mean(entropy(probs))

        grads = jax.grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    params = state.params
    for _ in range(steps):
        for idx, _ in sampler.epoch():
            params, opt_state = tent_step(
                params, opt_state,
                jnp.take(cache["images"], jnp.asarray(idx), 0),
                jnp.take(cache["tabular"], jnp.asarray(idx), 0))
    return dataclasses.replace(state, params=params)
