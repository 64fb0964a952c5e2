"""Additional test-time-adaptation strategies: EATA and SAR.

Beyond the reference's scope (its TTA hook is an unimplemented TODO,
``/root/reference/models/Disentangle/STiLModel.py:523-524``): two
well-established entropy-based TTA methods, implemented TPU-style —
fixed-shape jitted steps, masking instead of boolean indexing, state
threaded functionally.

- ``eata`` — Efficient Anti-forgetting Test-time Adaptation (Niu et
  al., ICML 2022): entropy minimisation restricted to *reliable*
  (low-entropy) and *non-redundant* (prediction differs from a running
  mean) samples, with per-sample weights ``exp(E0 - e)``, plus an
  optional Fisher-weighted anchor to the source parameters
  (``tta_fisher_alpha > 0``; 0 = the paper's "ETA" ablation).
- ``sar`` — Sharpness-Aware and Reliable entropy minimisation (Niu et
  al., ICLR 2023): the reliable-sample filter + a SAM two-step update
  (ascend along the gradient, descend from the perturbed point) on the
  BN affine parameters, with the paper's model-recovery reset when the
  smoothed entropy loss collapses below ``tta_reset_constant``.

Both run after the shared BN-statistics re-estimation phase
(``tent.estimate_bn_stats``); adaptation itself uses eval-mode BN with
the re-estimated statistics — the same design as our Tent (the official
implementations instead leave BN in batch-stat mode; re-estimated
running stats are equivalent in expectation and keep the jitted step
deterministic).

Config knobs (None -> defaults): ``tta_lr``, ``tta_steps``,
``tta_e_margin_scale`` (0.4, margin = scale * ln(num_classes)),
``tta_d_margin`` (0.05), ``tta_fisher_alpha`` (0.0),
``tta_fisher_samples`` (2000), ``tta_sam_rho`` (0.05),
``tta_reset_constant`` (0.2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stil_tta_tpu.tta.tent import (bn_param_mask, knob, missing_kw,
                                   tta_batches)


def _masked_tx(lr, mask, not_mask):
    return optax.chain(optax.masked(optax.adam(lr), mask),
                       optax.masked(optax.set_to_zero(), not_mask))


def eata_sample_weights(ent: jax.Array, e_margin: float,
                        sel: jax.Array) -> jax.Array:
    """EATA per-sample weights ``exp(E0 − e)`` over the selected mask.

    The weight is a DETACHED coefficient (official EATA uses
    ``entropys.detach()`` inside the exp): without stop_gradient,
    ``d/dθ[ent·exp(E0−ent)]`` flips sign for ent > 1 nat and the update
    would push those samples' entropy UP instead of down."""
    return jax.lax.stop_gradient(jnp.exp(e_margin - ent)) * sel


def _common(cfg, algo, state, cache):
    net, aug = algo.net, algo.aug_eval
    mask = bn_param_mask(state.params)
    not_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    num_classes = int(cfg.num_classes)
    e_margin = (float(knob(cfg.tta_e_margin_scale, 0.4))
                * float(np.log(num_classes)))

    def logits_fn(params, images, tabular, missing):
        imgs = aug(jax.random.key(0), images)
        outs = net.apply({"params": params,
                          "batch_stats": state.batch_stats},
                         imgs, tabular, train=False,
                         **missing_kw(missing, net))
        return outs["out_m"].astype(jnp.float32)

    def batches(seed: int = 0):
        # seed per adaptation epoch so tta_steps > 1 sees fresh
        # permutations, not the same one replayed
        return tta_batches(cache, int(cfg.batch_size), seed=seed)

    return logits_fn, batches, mask, not_mask, e_margin, num_classes


def eata_adapt(cfg, algo, state, cache):
    """EATA phase 2 (after BN-stat re-estimation)."""
    logits_fn, batches, mask, not_mask, e_margin, num_classes = _common(
        cfg, algo, state, cache)
    d_margin = float(knob(cfg.tta_d_margin, 0.05))
    fisher_alpha = float(knob(cfg.tta_fisher_alpha, 0.0))
    tx = _masked_tx(float(knob(cfg.tta_lr, 1e-4)), mask, not_mask)
    opt_state = tx.init(state.params)
    params0 = state.params

    # Optional anti-forgetting anchor: diagonal Fisher of the
    # pseudo-label CE on the (first ``tta_fisher_samples`` of the) test
    # cache, evaluated at the source parameters — EATA eq. (1)/(2).
    fisher = None
    if fisher_alpha > 0.0:
        budget = int(knob(cfg.tta_fisher_samples, 2000))

        @jax.jit
        def fisher_step(params, images, tabular, missing):
            def ce(p):
                logits = logits_fn(p, images, tabular, missing)
                labels = jnp.argmax(jax.lax.stop_gradient(logits), axis=1)
                logp = jax.nn.log_softmax(logits)
                return -jnp.mean(
                    jnp.take_along_axis(logp, labels[:, None], 1))
            g = jax.grad(ce)(params)
            return jax.tree_util.tree_map(lambda t: t * t, g)

        acc = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        seen = used = 0
        for images, tabular, missing in batches():
            sq = fisher_step(state.params, images, tabular, missing)
            acc = jax.tree_util.tree_map(jnp.add, acc, sq)
            used += 1
            seen += int(images.shape[0])
            if seen >= budget:
                break
        fisher = jax.tree_util.tree_map(lambda t: t / max(used, 1), acc)

    @jax.jit
    def eata_step(params, opt_state, probs_ema, ema_valid, images,
                  tabular, missing):
        def loss_fn(p):
            logits = logits_fn(p, images, tabular, missing)
            logp = jax.nn.log_softmax(logits)
            probs = jnp.exp(logp)
            ent = -jnp.sum(probs * logp, axis=-1)
            reliable = ent < e_margin
            # redundancy filter: cosine similarity of the prediction to
            # the running mean of previously-adapted predictions
            cos = (jnp.sum(probs * probs_ema[None, :], axis=-1)
                   / (jnp.linalg.norm(probs, axis=-1)
                      * jnp.linalg.norm(probs_ema) + 1e-12))
            novel = jnp.where(ema_valid > 0, jnp.abs(cos) < d_margin, True)
            sel = reliable & novel
            w = eata_sample_weights(ent, e_margin, sel)
            loss = jnp.sum(ent * w) / jnp.maximum(jnp.sum(sel), 1)
            if fisher is not None:
                anchors = jax.tree_util.tree_map(
                    lambda f, a, b: jnp.sum(f * (a - b) ** 2),
                    fisher, p, params0)
                loss = loss + fisher_alpha * sum(
                    jax.tree_util.tree_leaves(anchors))
            return loss, (probs, sel)

        grads, (probs, sel) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # running mean of selected predictions (0.9/0.1 EMA, held when
        # a batch selects nothing)
        nsel = jnp.sum(sel)
        batch_mean = (jnp.sum(probs * sel[:, None], axis=0)
                      / jnp.maximum(nsel, 1))
        new_ema = jnp.where(
            ema_valid > 0, 0.9 * probs_ema + 0.1 * batch_mean, batch_mean)
        probs_ema = jnp.where(nsel > 0, new_ema, probs_ema)
        ema_valid = jnp.maximum(ema_valid, (nsel > 0).astype(jnp.int32))
        return params, new_opt, probs_ema, ema_valid

    params = state.params
    probs_ema = jnp.zeros((num_classes,), jnp.float32)
    ema_valid = jnp.asarray(0, jnp.int32)
    for ep in range(int(knob(cfg.tta_steps, 1))):
        for images, tabular, missing in batches(seed=ep):
            params, opt_state, probs_ema, ema_valid = eata_step(
                params, opt_state, probs_ema, ema_valid, images,
                tabular, missing)
    return dataclasses.replace(state, params=params)


def sar_adapt(cfg, algo, state, cache):
    """SAR phase 2 (after BN-stat re-estimation)."""
    logits_fn, batches, mask, not_mask, e_margin, _ = _common(
        cfg, algo, state, cache)
    rho = float(knob(cfg.tta_sam_rho, 0.05))
    reset_constant = float(knob(cfg.tta_reset_constant, 0.2))
    tx = _masked_tx(float(knob(cfg.tta_lr, 1e-4)), mask, not_mask)
    params0 = state.params
    opt_state0 = tx.init(params0)  # recovery reset target

    def filtered_entropy(p, images, tabular, missing):
        logits = logits_fn(p, images, tabular, missing)
        logp = jax.nn.log_softmax(logits)
        probs = jnp.exp(logp)
        ent = -jnp.sum(probs * logp, axis=-1)
        sel = ent < e_margin
        loss = jnp.sum(ent * sel) / jnp.maximum(jnp.sum(sel), 1)
        return loss, (ent, sel)

    @jax.jit
    def sar_step(params, opt_state, ema_loss, ema_valid, images,
                 tabular, missing):
        # first step: ascend to the sharpness point along the masked grad
        (_, (_, sel)), g1 = jax.value_and_grad(
            filtered_entropy, has_aux=True)(params, images, tabular,
                                            missing)
        g1 = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), g1, mask)
        gnorm = optax.global_norm(g1)
        perturbed = jax.tree_util.tree_map(
            lambda p, g: p + rho * g / (gnorm + 1e-12), params, g1)
        # second step: descend from the perturbed point, re-filtering on
        # the perturbed entropies (SAR's filter_ids_2)
        def second(p):
            _, (ent2, _) = filtered_entropy(p, images, tabular, missing)
            sel2 = sel & (ent2 < e_margin)
            loss2 = jnp.sum(ent2 * sel2) / jnp.maximum(jnp.sum(sel2), 1)
            return loss2, sel2

        (loss2, sel2), g2 = jax.value_and_grad(
            second, has_aux=True)(perturbed)
        updates, new_opt = tx.update(g2, opt_state, params)
        params = optax.apply_updates(params, updates)
        # the EMA only tracks batches whose SECOND filter selected
        # something — an empty sel2 makes loss2 an artificial 0 that
        # must neither enter the EMA nor trigger a recovery reset
        # (official SAR: a nan loss skips the EMA update)
        ok = jnp.isfinite(loss2) & (jnp.sum(sel2) > 0)
        new_ema = jnp.where(ema_valid > 0,
                            0.9 * ema_loss + 0.1 * loss2, loss2)
        ema_loss = jnp.where(ok, new_ema, ema_loss)
        ema_valid = jnp.maximum(ema_valid, ok.astype(jnp.int32))
        # model recovery (paper §3.3) folded into the jitted step so
        # the adaptation loop never blocks on a device->host sync: a
        # collapsed, uniformly confident model drives the smoothed
        # loss toward zero — reset params + opt and keep adapting
        reset = (ema_valid > 0) & (ema_loss < reset_constant)
        pick = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(reset, x, y), a, b)
        params = pick(params0, params)
        new_opt = pick(opt_state0, new_opt)
        ema_loss = jnp.where(reset, 0.0, ema_loss)
        ema_valid = jnp.where(reset, 0, ema_valid)
        return params, new_opt, ema_loss, ema_valid

    params, opt_state = state.params, tx.init(state.params)
    ema_loss = jnp.asarray(0.0, jnp.float32)
    ema_valid = jnp.asarray(0, jnp.int32)
    for ep in range(int(knob(cfg.tta_steps, 1))):
        for images, tabular, missing in batches(seed=ep):
            params, opt_state, ema_loss, ema_valid = sar_step(
                params, opt_state, ema_loss, ema_valid, images,
                tabular, missing)
    return dataclasses.replace(state, params=params)
