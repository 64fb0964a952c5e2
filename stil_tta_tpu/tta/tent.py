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


def knob(value, default):
    """Config knob with a ``None -> default`` contract: an explicit 0
    (e.g. ``tta_steps: 0`` = BN-adapt only, ``tta_fisher_alpha: 0`` =
    anchor off) is a real value, unlike with ``value or default``."""
    return default if value is None else value


def tta_batches(cache, batch_size: int, seed: int = 0):
    """Shuffled one-epoch batch iterator over the test cache with pad
    rows REMOVED: ``EpochSampler(drop_last=False)`` pads the final
    batch with weight-0 copies of its first row, and BN statistics,
    entropy losses and EMA trackers must only see real samples — the
    tail batch simply runs at its natural smaller shape (one extra jit
    specialization). Yields ``(images, tabular, missing-or-None)``, the
    missing-tabular mask sliced alongside so adaptation sees the same
    masked inputs the eval forward scores."""
    n = int(np.asarray(cache["labels"]).shape[0])
    sampler = EpochSampler(n, batch_size, shuffle=True, drop_last=False,
                           seed=seed)
    missing = cache.get("missing")
    for idx, w in sampler.epoch():
        j = jnp.asarray(np.asarray(idx)[np.asarray(w) > 0])
        yield (jnp.take(cache["images"], j, 0),
               jnp.take(cache["tabular"], j, 0),
               None if missing is None else jnp.take(missing, j, 0))


def accepts_missing_mask(net) -> bool:
    """Whether the network's ``__call__`` takes a ``missing_mask``
    kwarg (the DisCo/semi-multimodal backbones do; the Match-family
    backbones don't)."""
    import inspect
    try:
        return "missing_mask" in inspect.signature(
            type(net).__call__).parameters
    except (TypeError, ValueError):
        return False


def missing_kw(missing, net=None) -> dict:
    """``missing_mask`` kwarg dict for ``net.apply`` — empty when the
    cache has no mask, and also when ``net`` is given but its
    ``__call__`` accepts no such kwarg (a Match-family config with
    ``missing_tabular`` enabled must not TypeError inside adaptation —
    its eval forward can't consume the mask either)."""
    if missing is None or (net is not None
                           and not accepts_missing_mask(net)):
        return {}
    return {"missing_mask": missing}


STRATEGIES = ("tent", "bn_adapt", "eata", "sar")


def adapt(cfg, algo, state, cache):
    """Adapt ``state`` on the (unlabeled) test cache; returns new state."""
    strategy = knob(cfg.tta_strategy, "tent")
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown tta_strategy {strategy!r}; "
                         f"expected one of {STRATEGIES}")
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
    momentum = float(knob(cfg.tta_momentum, 0.1))
    net = algo.net
    aug = algo.aug_eval

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
    def stats_step(batch_stats, images, tabular, missing):
        imgs = aug(jax.random.key(0), images)
        _, mut = stats_net.apply(
            {"params": state.params, "batch_stats": batch_stats},
            imgs, tabular, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
            **missing_kw(missing, stats_net))
        # recover the raw test-batch statistics from flax's internal
        # blend (new = m*old + (1-m)*batch), then apply tta_momentum once
        batch = jax.tree_util.tree_map(
            lambda old, new: (new - bn_m * old) / (1.0 - bn_m),
            batch_stats, mut["batch_stats"])
        return jax.tree_util.tree_map(
            lambda old, b: (1 - momentum) * old + momentum * b,
            batch_stats, batch)

    bs = state.batch_stats
    for images, tabular, missing in tta_batches(cache, batch_size):
        bs = stats_step(bs, images, tabular, missing)
    return dataclasses.replace(state, batch_stats=bs)


def _tent_phase(cfg, algo, state, cache):
    # ---- phase 2: Tent — entropy minimisation over BN affine params
    batch_size = int(cfg.batch_size)
    net = algo.net
    aug = algo.aug_eval
    bs = state.batch_stats
    # fallbacks mirror base/semisl.yaml so a stripped config behaves
    # the same across every strategy (eata/sar use the same values)
    lr = float(knob(cfg.tta_lr, 1e-4))
    steps = int(knob(cfg.tta_steps, 1))
    from stil_tta_tpu.tta.methods import _masked_tx
    mask = bn_param_mask(state.params)
    not_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    # adam on the BN affine leaves; everything else hard-zeroed
    # (the shared masked chain — eata/sar use the same one)
    tx = _masked_tx(lr, mask, not_mask)
    opt_state = tx.init(state.params)

    @jax.jit
    def tent_step(params, opt_state, images, tabular, missing):
        imgs = aug(jax.random.key(0), images)

        def loss_fn(p):
            outs = net.apply({"params": p, "batch_stats": bs},
                             imgs, tabular, train=False,
                             **missing_kw(missing, net))
            probs = jax.nn.softmax(outs["out_m"].astype(jnp.float32),
                                   axis=1)
            return jnp.mean(entropy(probs))

        grads = jax.grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    params = state.params
    for ep in range(steps):
        # epoch-dependent seed: each adaptation epoch sees a fresh
        # permutation (a fixed seed would replay the identical batch
        # order every epoch)
        for images, tabular, missing in tta_batches(cache, batch_size,
                                                    seed=ep):
            params, opt_state = tent_step(params, opt_state, images,
                                          tabular, missing)
    return dataclasses.replace(state, params=params)
