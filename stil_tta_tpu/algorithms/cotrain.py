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

        m_micro = int(cfg.micro_batches or 1)

        def step_micro(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                       epoch: jax.Array):
            """Micro-batched Co-Training step (``micro_batches: m > 1``;
            OFF by default pending its convergence gate). No banks or
            DA here — for the transformer backbone the only divergences
            are ghost BN and the pre-step EMAN lerp (from pre-forward
            running stats); the cross-modal pseudo-labels and masks are
            per-sample and decompose exactly.

            CoTrain_Pseudo_SAINT inherits this step, but NOTE its
            SAINT encoder's intersample (colrow) attention couples the
            batch axis: under chunking each row attends over B/m
            samples instead of B — an ADDITIONAL divergence of the
            chunked-in-batch-coupling class (same as CoMatch's graphs).
            Gate the SAINT variant separately before adopting."""
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
            if use_ema:
                ema_p, ema_bs = ema_update(state.ema_params, params,
                                           momentum, eman,
                                           state.ema_batch_stats,
                                           state.batch_stats)
                ema_p = jax.lax.stop_gradient(ema_p)
                ema_bs = jax.lax.stop_gradient(ema_bs)
            else:
                ema_p, ema_bs = state.ema_params, state.ema_batch_stats
            from stil_tta_tpu.ops.metrics import accuracy_update

            def body(carry, xs):
                bstats, gacc, acc, acc_u, lacc = carry
                il_c, iu_c, kl_c, ku_c, kd_c = xs
                bl = gather_batch(cache_l, il_c)
                bu = gather_batch(cache_u, iu_c)
                y_l, y_u = bl["labels"], bu["labels"]
                img_l, tab_l = self.contrastive_views(
                    kl_c, bl["images"], bl["tabular"], marg_l)
                img_u, tab_u = self.contrastive_views(
                    ku_c, bu["images"], bu["tabular"], marg_u)
                images = jnp.concatenate([img_l, img_u])
                tabs = jnp.concatenate([tab_l, tab_u])

                def loss_fn(p):
                    om, oi, ot, _, new_stats = self._apply_3head(
                        p, bstats, images, tabs, kd_c)
                    if use_ema:
                        _, oi_e, ot_e, _ = self.net.apply(
                            {"params": ema_p, "batch_stats": ema_bs},
                            images, tabs, train=False)
                        t_i = jax.lax.stop_gradient(oi_e)
                        t_t = jax.lax.stop_gradient(ot_e)
                    else:
                        t_i = jax.lax.stop_gradient(oi)
                        t_t = jax.lax.stop_gradient(ot)
                    pseudo_i = jax.nn.softmax(t_i[blc:], axis=1)
                    pseudo_t = jax.nn.softmax(t_t[blc:], axis=1)
                    mask_i = (jnp.max(pseudo_i, axis=1) >= threshold) \
                        .astype(jnp.float32)
                    mask_t = (jnp.max(pseudo_t, axis=1) >= threshold) \
                        .astype(jnp.float32)
                    loss_ce = (cross_entropy(om[:blc], y_l)
                               + cross_entropy(oi[:blc], y_l)
                               + cross_entropy(ot[:blc], y_l))
                    loss_i_u = jnp.mean(soft_cross_entropy(
                        oi[blc:], pseudo_t, "none") * mask_t)
                    loss_t_u = jnp.mean(soft_cross_entropy(
                        ot[blc:], pseudo_i, "none") * mask_i)
                    gate = (epoch > start_epoch).astype(jnp.float32)
                    total = alpha * loss_ce + gate * rate_uce * (
                        loss_i_u + loss_t_u)
                    logs = {"loss": total, "CEloss": loss_ce,
                            "CEloss_unlabelled_i": loss_i_u,
                            "CEloss_unlabelled_t": loss_t_u,
                            "threshold_i_ratio": jnp.mean(mask_i),
                            "threshold_t_ratio": jnp.mean(mask_t)}
                    return total, (new_stats, om, logs)

                grads, (new_bstats, om, logs) = jax.grad(
                    loss_fn, has_aux=True)(params)
                gacc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), gacc, grads)
                prob_m = jax.nn.softmax(om, axis=1)
                px = prob_m[:blc, 1] if binary else prob_m[:blc]
                pu = prob_m[blc:, 1] if binary else prob_m[blc:]
                acc = accuracy_update(acc, px, y_l)
                acc_u = accuracy_update(acc_u, pu, y_u)
                lacc = {k: lacc[k] + logs[k] for k in lacc}
                return (new_bstats, gacc, acc, acc_u, lacc), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            carry0 = (state.batch_stats, zero_g,
                      state.acc_train, state.acc_train_u,
                      {k: jnp.zeros((), jnp.float32)
                       for k in self.LOG_KEYS})
            (new_stats, gacc, acc, acc_u, lacc), _ = jax.lax.scan(
                body, carry0, (il, iu, kls, kus, kds))
            grads = jax.tree_util.tree_map(lambda g: g / m_micro, gacc)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)
            new_logs = {k: state.log_sums[k] + lacc[k] / m_micro
                        for k in state.log_sums}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step if m_micro == 1 else step_micro,
                       donate_argnums=(0,))


class CoTrainSAINT(CoTrain):
    """``CoTraining_SAINT.py`` — backbone import swap only."""

    name = "CoTrain_Pseudo_SAINT"
    tabular_encoder = "saint"
