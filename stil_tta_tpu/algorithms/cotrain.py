"""Co-Training with cross-modal pseudo-labels.

Parity target: ``/root/reference/models/SemiMultimodal/CoTraining.py``
(+ ``CoTraining_SAINT.py``, identical but for the backbone import —
SURVEY.md §2.5): 3-head concat backbone with optional EMAN teacher
(``:44-52, 94-109``); cross-modal soft pseudo-labeling — the imaging
head learns from the tabular teacher's soft labels and vice versa,
masked at ``co_threshold`` (``:141-149``); loss = ``α·CE_l +
rate_uce·(L_i + L_t)`` after ``start_epoch`` (``:156-159``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from stil_tta_tpu.algorithms.base import ema_update
from stil_tta_tpu.algorithms.match_common import MatchState
from stil_tta_tpu.algorithms.mmatch import MMatch
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.losses import cross_entropy, soft_cross_entropy


class CoTrain(MMatch):
    name = "CoTrain_Pseudo"
    LOG_KEYS = ("loss", "CEloss", "CEloss_unlabelled_i",
                "CEloss_unlabelled_t", "threshold_i_ratio",
                "threshold_t_ratio")

    def extra_state(self, rng):
        return {}

    def make_train_step(self):
        cfg = self.cfg
        c = self.num_classes
        alpha = float(cfg.alpha)
        rate_uce = float(cfg.rate_uce)
        threshold = float(cfg.co_threshold)
        start_epoch = int(cfg.start_epoch)
        use_ema = bool(cfg.use_ema)
        eman = bool(cfg.eman)
        momentum = float(cfg.ema_momentum)
        binary = c == 2

        def step(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            rng, kl, ku, kd = jax.random.split(state.rng, 4)
            bl = gather_batch(cache_l, idx_l)
            bu = gather_batch(cache_u, idx_u)
            y_l, y_u = bl["labels"], bu["labels"]
            b_l, b_u = y_l.shape[0], y_u.shape[0]

            img_l, tab_l = self.contrastive_views(kl, bl["images"],
                                                  bl["tabular"],
                                                  marginal_table(cache_l))
            img_u, tab_u = self.contrastive_views(ku, bu["images"],
                                                  bu["tabular"],
                                                  marginal_table(cache_u))
            images = jnp.concatenate([img_l, img_u])
            tabs = jnp.concatenate([tab_l, tab_u])

            def loss_fn(params):
                om, oi, ot, _, new_stats = self._apply_3head(
                    params, state.batch_stats, images, tabs, kd)
                # EMAN teacher (``CoTraining.py:94-109, 128-137``):
                # student forward first, then the state-dict lerp from
                # the student's POST-forward BN stats, then the
                # eval-mode teacher (reference ordering — training_step
                # calls model.forward, then momentum_update_ema inside
                # no_grad, then ema.forward). stop_gradient prunes the
                # teacher from the backward.
                if use_ema:
                    ema_p, ema_bs = ema_update(state.ema_params, params,
                                               momentum, eman,
                                               state.ema_batch_stats,
                                               new_stats)
                    ema_p = jax.lax.stop_gradient(ema_p)
                    ema_bs = jax.lax.stop_gradient(ema_bs)
                    _, oi_e, ot_e, _ = self.net.apply(
                        {"params": ema_p, "batch_stats": ema_bs}, images,
                        tabs, train=False)
                    t_i = jax.lax.stop_gradient(oi_e)
                    t_t = jax.lax.stop_gradient(ot_e)
                else:
                    ema_p, ema_bs = state.ema_params, state.ema_batch_stats
                    t_i = jax.lax.stop_gradient(oi)
                    t_t = jax.lax.stop_gradient(ot)
                pseudo_i = jax.nn.softmax(t_i[b_l:], axis=1)
                pseudo_t = jax.nn.softmax(t_t[b_l:], axis=1)
                mask_i = (jnp.max(pseudo_i, axis=1) >= threshold) \
                    .astype(jnp.float32)
                mask_t = (jnp.max(pseudo_t, axis=1) >= threshold) \
                    .astype(jnp.float32)
                loss_ce = (cross_entropy(om[:b_l], y_l)
                           + cross_entropy(oi[:b_l], y_l)
                           + cross_entropy(ot[:b_l], y_l))
                # cross-modal: imaging student <- tabular teacher, and
                # vice versa (``CoTraining.py:147-149``)
                loss_i_u = jnp.mean(soft_cross_entropy(
                    oi[b_l:], pseudo_t, "none") * mask_t)
                loss_t_u = jnp.mean(soft_cross_entropy(
                    ot[b_l:], pseudo_i, "none") * mask_i)
                gate = (epoch > start_epoch).astype(jnp.float32)
                total = alpha * loss_ce + gate * rate_uce * (loss_i_u
                                                             + loss_t_u)
                logs = {"loss": total, "CEloss": loss_ce,
                        "CEloss_unlabelled_i": loss_i_u,
                        "CEloss_unlabelled_t": loss_t_u,
                        "threshold_i_ratio": jnp.mean(mask_i),
                        "threshold_t_ratio": jnp.mean(mask_t)}
                return total, (new_stats, ema_p, ema_bs, om, logs)

            grads, (new_stats, ema_p, ema_bs, om, logs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            prob_m = jax.nn.softmax(om, axis=1)
            acc, acc_u, new_logs = self.update_logs(
                state, logs, prob_m[:b_l], y_l, prob_m[b_l:], y_u, binary)
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step, donate_argnums=(0,))


class CoTrainSAINT(CoTrain):
    """``CoTraining_SAINT.py`` — backbone import swap only."""

    name = "CoTrain_Pseudo_SAINT"
    tabular_encoder = "saint"
