"""FreeMatch (self-adaptive thresholding + fairness regularizer).

Parity target: ``/root/reference/models/MatchModel/FreeMatchFolder/
FreeMatch.py`` + ``freematch_model.py``: EMA scalars ``time_p``, class
distribution ``p_model``, ``label_hist`` updated at momentum m=0.999
(``freematch_model.py:49-53, 127-143``); mask
``max_prob >= time_p * p_model[ŷ] / max(p_model)`` (``:145-165``); hard
one-hot pseudo-labels from the teacher's weak view (``:190-192``);
loss = ``sup + λ_u·unsup + λ_e·ent`` after ``start_epoch``
(``FreeMatch.py:88-98``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from stil_tta_tpu.algorithms.base import ema_update
from stil_tta_tpu.algorithms.match_common import MatchBase, MatchState
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.ops.metrics import accuracy_update
from stil_tta_tpu.losses import cross_entropy, entropy_loss, \
    soft_cross_entropy

SELF_ADAPT_M = 0.999  # freematch_model.py:48 (`self.m`)


class FreeMatch(MatchBase):
    name = "FreeMatch"
    LOG_KEYS = ("loss", "loss_x", "loss_u", "loss_e", "threshold1_ratio")

    def extra_state(self, rng) -> Dict[str, jax.Array]:
        c = self.num_classes
        return {"p_model": jnp.full((c,), 1.0 / c, jnp.float32),
                "label_hist": jnp.full((c,), 1.0 / c, jnp.float32),
                "time_p": jnp.asarray(1.0 / c, jnp.float32)}

    def make_train_step(self):
        cfg = self.cfg
        c = self.num_classes
        lambda_u = float(cfg.lambda_u)
        lambda_e = float(cfg.lambda_e or 0.01)
        start_epoch = int(cfg.start_epoch)
        momentum = float(cfg.ema_momentum)
        binary = c == 2
        m = SELF_ADAPT_M

        def step(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            rng, kl, ku, kd = jax.random.split(state.rng, 4)
            bl = gather_batch(cache_l, idx_l)
            bu = gather_batch(cache_u, idx_u)
            y_l, y_u = bl["labels"], bu["labels"]
            b_l, b_u = y_l.shape[0], y_u.shape[0]

            img_x, tab_x = self.labeled_views(kl, bl["images"],
                                              bl["tabular"],
                                              marginal_table(cache_l))
            (img_w, tab_w), (img_s, tab_s), _ = self.weak_strong_views(
                ku, bu["images"], bu["tabular"], marginal_table(cache_u))

            def loss_fn(params):
                # Student forward FIRST, then the EMAN state-dict lerp
                # from the student's POST-forward BN stats, then the
                # eval-mode teacher on u_w — the reference's ordering
                # (``freematch_model.py:179-188``: main() mutates running
                # stats, momentum_update_ema(), ema.eval() forward). The
                # teacher block is stop_gradient'd (zero backward cost).
                logits, _, new_stats = self.apply_student(
                    params, state.batch_stats,
                    jnp.concatenate([img_x, img_s]),
                    jnp.concatenate([tab_x, tab_s]), kd)
                ema_p, ema_bs = ema_update(state.ema_params, params,
                                           momentum, True,
                                           state.ema_batch_stats,
                                           new_stats)
                ema_p = jax.lax.stop_gradient(ema_p)
                ema_bs = jax.lax.stop_gradient(ema_bs)
                state_t = dataclasses.replace(state, ema_params=ema_p,
                                              ema_batch_stats=ema_bs)
                logits_uw, _ = self.apply_teacher(state_t, img_w, tab_w)
                probs_uw = jax.nn.softmax(logits_uw, axis=1)

                # self-adaptive threshold state update (:127-143); batch
                # means are global under GSPMD (reference all-gathers)
                max_probs = jnp.max(probs_uw, axis=1)
                max_idx = jnp.argmax(probs_uw, axis=1)
                time_p = state.extra["time_p"] * m \
                    + (1 - m) * jnp.mean(max_probs)
                p_model = state.extra["p_model"] * m \
                    + (1 - m) * jnp.mean(probs_uw, axis=0)
                hist = jnp.zeros((c,)).at[max_idx].add(1.0)
                label_hist = state.extra["label_hist"] * m \
                    + (1 - m) * hist / jnp.sum(hist)

                # masking (:145-165)
                mod = p_model / jnp.max(p_model)
                mask = (max_probs >= time_p * mod[max_idx]) \
                    .astype(jnp.float32)
                pseudo_label = jax.nn.one_hot(max_idx, c,
                                              dtype=jnp.float32)

                logits_x, logits_us = logits[:b_l], logits[b_l:]
                loss_x = cross_entropy(logits_x, y_l)
                # NOTE the reference applies NO confidence mask to the
                # consistency CE (``FreeMatch.py:35, 93``: plain
                # CrossEntropyLoss over all unlabeled samples); the mask
                # only feeds the fairness loss and logging.
                loss_u = soft_cross_entropy(logits_us, pseudo_label)
                loss_e = entropy_loss(mask, logits_us, p_model, label_hist)
                gate = (epoch > start_epoch).astype(jnp.float32)
                total = loss_x + gate * (lambda_u * loss_u
                                         + lambda_e * loss_e)
                logs = {"loss": total, "loss_x": loss_x, "loss_u": loss_u,
                        "loss_e": loss_e,
                        "threshold1_ratio": jnp.mean(mask)}
                return total, (new_stats, ema_p, ema_bs, time_p, p_model,
                               label_hist, logits_x, logits_us, logs)

            grads, (new_stats, ema_p, ema_bs, time_p, p_model, label_hist,
                    logits_x, logits_us, logs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            prob_x = jax.nn.softmax(logits_x, axis=1)
            prob_u = jax.nn.softmax(logits_us, axis=1)
            acc, acc_u, new_logs = self.update_logs(
                state, logs, prob_x, y_l, prob_u, y_u, binary)
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                extra={"p_model": p_model, "label_hist": label_hist,
                       "time_p": time_p},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        m_micro = int(cfg.micro_batches or 1)

        def step_micro(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                       epoch: jax.Array):
            """Micro-batched FreeMatch step (``micro_batches: m > 1``;
            OFF by default pending a FreeMatch-recipe convergence gate).

            Divergences (same classes as the STiL/SimMatch fast
            profiles): ghost BN, pre-step EMAN lerp, and per-chunk
            masks computed from the pre-step EMA scalars lerped with
            the CHUNK's own means (the committed scalars use the
            full-batch means and are EXACT: mean of equal-size chunk
            means = batch mean; label_hist accumulates raw counts and
            normalizes once). At m=0.999 the per-chunk scalar lerp
            moves the threshold by <=0.1% within a step."""
            rng, kl, ku, kd = jax.random.split(state.rng, 4)
            b_l, b_u = idx_l.shape[0], idx_u.shape[0]
            assert b_l % m_micro == 0 and b_u % m_micro == 0, (
                f"micro_batches={m_micro} must divide labeled ({b_l}) "
                f"and unlabeled ({b_u}) batch sizes")
            blc = b_l // m_micro
            il = idx_l.reshape(m_micro, blc)
            iu = idx_u.reshape(m_micro, b_u // m_micro)
            kls = jax.random.split(kl, m_micro)
            kus = jax.random.split(ku, m_micro)
            kds = jax.random.split(kd, m_micro)
            marg_l = marginal_table(cache_l)
            marg_u = marginal_table(cache_u)
            params = state.params
            ex = state.extra
            ema_p, ema_bs = ema_update(state.ema_params, params,
                                       momentum, True,
                                       state.ema_batch_stats,
                                       state.batch_stats)
            ema_p = jax.lax.stop_gradient(ema_p)
            ema_bs = jax.lax.stop_gradient(ema_bs)
            state_t = dataclasses.replace(state, ema_params=ema_p,
                                          ema_batch_stats=ema_bs)

            def body(carry, xs):
                (bstats, gacc, maxp_acc, pm_acc, hist_acc, acc, acc_u,
                 lacc) = carry
                il_c, iu_c, kl_c, ku_c, kd_c = xs
                bl = gather_batch(cache_l, il_c)
                bu = gather_batch(cache_u, iu_c)
                y_l, y_u = bl["labels"], bu["labels"]
                img_x, tab_x = self.labeled_views(kl_c, bl["images"],
                                                  bl["tabular"], marg_l)
                (img_w, tab_w), (img_s, tab_s), _ = \
                    self.weak_strong_views(ku_c, bu["images"],
                                           bu["tabular"], marg_u)

                def loss_fn(p):
                    logits, _, new_stats = self.apply_student(
                        p, bstats, jnp.concatenate([img_x, img_s]),
                        jnp.concatenate([tab_x, tab_s]), kd_c)
                    logits_uw, _ = self.apply_teacher(state_t, img_w,
                                                      tab_w)
                    probs_uw = jax.nn.softmax(logits_uw, axis=1)
                    max_probs = jnp.max(probs_uw, axis=1)
                    max_idx = jnp.argmax(probs_uw, axis=1)
                    # chunk-lerped scalars for THIS chunk's mask
                    time_p_c = ex["time_p"] * m \
                        + (1 - m) * jnp.mean(max_probs)
                    p_model_c = ex["p_model"] * m \
                        + (1 - m) * jnp.mean(probs_uw, axis=0)
                    hist = jnp.zeros((c,)).at[max_idx].add(1.0)
                    label_hist_c = ex["label_hist"] * m \
                        + (1 - m) * hist / jnp.sum(hist)
                    mod = p_model_c / jnp.max(p_model_c)
                    mask = (max_probs >= time_p_c * mod[max_idx]) \
                        .astype(jnp.float32)
                    pseudo_label = jax.nn.one_hot(max_idx, c,
                                                  dtype=jnp.float32)
                    logits_x, logits_us = logits[:blc], logits[blc:]
                    loss_x = cross_entropy(logits_x, y_l)
                    loss_u = soft_cross_entropy(logits_us, pseudo_label)
                    loss_e = entropy_loss(mask, logits_us, p_model_c,
                                          label_hist_c)
                    gate = (epoch > start_epoch).astype(jnp.float32)
                    total = loss_x + gate * (lambda_u * loss_u
                                             + lambda_e * loss_e)
                    logs = {"loss": total, "loss_x": loss_x,
                            "loss_u": loss_u, "loss_e": loss_e,
                            "threshold1_ratio": jnp.mean(mask)}
                    return total, (new_stats, jnp.mean(max_probs),
                                   jnp.mean(probs_uw, axis=0), hist,
                                   logits_x, logits_us, logs)

                grads, (new_bstats, mean_maxp, mean_probs, hist,
                        logits_x, logits_us, logs) = jax.grad(
                    loss_fn, has_aux=True)(params)
                gacc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), gacc, grads)
                maxp_acc = maxp_acc + mean_maxp
                pm_acc = pm_acc + mean_probs
                hist_acc = hist_acc + hist
                prob_x = jax.nn.softmax(logits_x, axis=1)
                prob_u = jax.nn.softmax(logits_us, axis=1)
                px = prob_x[:, 1] if binary else prob_x
                pu = prob_u[:, 1] if binary else prob_u
                acc = accuracy_update(acc, px, y_l)
                acc_u = accuracy_update(acc_u, pu, y_u)
                lacc = {k: lacc[k] + logs[k] for k in lacc}
                return (new_bstats, gacc, maxp_acc, pm_acc, hist_acc,
                        acc, acc_u, lacc), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            carry0 = (state.batch_stats, zero_g, jnp.float32(0),
                      jnp.zeros((c,), jnp.float32),
                      jnp.zeros((c,), jnp.float32),
                      state.acc_train, state.acc_train_u,
                      {k: jnp.zeros((), jnp.float32)
                       for k in self.LOG_KEYS})
            (new_stats, gacc, maxp_acc, pm_acc, hist_acc, acc, acc_u,
             lacc), _ = jax.lax.scan(body, carry0,
                                     (il, iu, kls, kus, kds))

            grads = jax.tree_util.tree_map(lambda g: g / m_micro, gacc)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)
            # committed EMA scalars from FULL-batch statistics (exact)
            time_p = ex["time_p"] * m + (1 - m) * (maxp_acc / m_micro)
            p_model = ex["p_model"] * m + (1 - m) * (pm_acc / m_micro)
            label_hist = ex["label_hist"] * m \
                + (1 - m) * hist_acc / jnp.sum(hist_acc)
            new_logs = {k: state.log_sums[k] + lacc[k] / m_micro
                        for k in state.log_sums}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                extra={"p_model": p_model, "label_hist": label_hist,
                       "time_p": time_p},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step if m_micro == 1 else step_micro,
                       donate_argnums=(0,))
