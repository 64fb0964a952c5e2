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

        return jax.jit(step, donate_argnums=(0,))
