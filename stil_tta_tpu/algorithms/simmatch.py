"""SimMatch (semantic + instance pseudo-labeling).

Parity target: ``/root/reference/models/MatchModel/SimMatch.py`` +
``simmatch_model.py``: student/EMA pair over ResNet or multimodal
backbone; an instance bank holding one embedding per labeled sample
(``bank (dim, K)``, ``labels (K,)``, K = len(labeled set) —
``simmatch_model.py:68-70``, ``trainers/evaluate.py:60-61``); DA queue;
semantic pseudo-labels smoothed by instance-aggregated probs
(``:268-282``); instance loss = CE between teacher and student
bank-similarity distributions at temps ``tt``/``st`` (``:284-286``).
Loss: ``loss_x + λ_u·masked soft-CE + λ_in·loss_in`` gated after
``start_epoch`` (``SimMatch.py:86-97``).

TPU notes: the scatter bank update rides ``.at[].set`` (XLA scatter; the
reference all-gathers then writes identically on every rank —
``simmatch_model.py:140-147``); everything else is batched matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from stil_tta_tpu.algorithms.base import (DAState, distribution_alignment,
                                          ema_update)
from stil_tta_tpu.algorithms.match_common import MatchBase, MatchState
from stil_tta_tpu.data.loader import (dataset_indices, gather_batch,
                                       marginal_table)
from stil_tta_tpu.losses import cross_entropy, soft_cross_entropy
from stil_tta_tpu.ops.metrics import accuracy_update


class SimMatch(MatchBase):
    name = "SimMatch"
    LOG_KEYS = ("loss", "loss_x", "loss_u", "loss_in", "threshold1_ratio")

    def extra_state(self, rng) -> Dict[str, jax.Array]:
        k = int(self.cfg.K)
        dim = int(self.cfg.projection_dim)
        bank = jax.random.normal(jax.random.key(7), (dim, k), jnp.float32)
        bank = bank / jnp.linalg.norm(bank, axis=0, keepdims=True)
        return {"bank": bank, "bank_labels": jnp.zeros((k,), jnp.int32)}

    def make_train_step(self):
        cfg = self.cfg
        c = self.num_classes
        threshold = float(cfg.sim_threshold)
        lambda_u, lambda_in = float(cfg.lambda_u), float(cfg.lambda_in)
        tt, st = float(cfg.tt), float(cfg.st)
        c_smooth = float(cfg.c_smooth)
        start_epoch = int(cfg.start_epoch)
        momentum = float(cfg.ema_momentum)
        use_da = bool(cfg.DA)
        binary = c == 2

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

            bank = state.extra["bank"]
            bank_labels = state.extra["bank_labels"]
            onehot_bank = jax.nn.one_hot(bank_labels, c)  # (K, C)

            def loss_fn(params):
                # Student forward FIRST, then the EMAN state-dict lerp
                # from the student's POST-forward BN stats, then the
                # eval-mode teacher on (x, u_w) — the reference's exact
                # ordering (``simmatch_model.py:240-264``: main() mutates
                # running stats in train mode, momentum_update_ema()
                # lerps the state dict, ema.eval() forward). The teacher
                # block is stop_gradient'd so XLA prunes it from the
                # backward — same cost as hoisting it out of loss_fn.
                logits, feat, new_stats = self.apply_student(
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
                logits_k, feat_k = self.apply_teacher(
                    state_t, jnp.concatenate([img_x, img_w]),
                    jnp.concatenate([tab_x, tab_w]))
                feat_kx, feat_ku = feat_k[:b_l], feat_k[b_l:]
                prob_ku_orig = jax.nn.softmax(logits_k[b_l:], axis=1)
                if use_da:
                    da, prob_ku_orig = distribution_alignment(
                        state.da, prob_ku_orig)
                else:
                    da = state.da

                # semantic-instance teacher distribution (:268-282)
                teacher_logits = feat_ku @ bank
                teacher_prob_orig = jax.nn.softmax(teacher_logits / tt,
                                                   axis=1)
                factor = prob_ku_orig @ onehot_bank.T  # prob[b, lbl[k]]
                teacher_prob = teacher_prob_orig * factor
                teacher_prob = teacher_prob / jnp.clip(
                    jnp.sum(teacher_prob, axis=1, keepdims=True), 1e-12)
                aggregated = teacher_prob_orig @ onehot_bank  # (B, C)
                prob_ku = (c_smooth * prob_ku_orig
                           + (1 - c_smooth) * aggregated)
                mask = (jnp.max(prob_ku, axis=1) >= threshold) \
                    .astype(jnp.float32)

                logits_qx, logits_qu = logits[:b_l], logits[b_l:]
                feat_qu = feat[b_l:]
                loss_x = cross_entropy(logits_qx, y_l)
                loss_u = jnp.mean(
                    soft_cross_entropy(logits_qu, prob_ku, "none") * mask)
                student_prob = jax.nn.softmax((feat_qu @ bank) / st, axis=1)
                loss_in = jnp.mean(jnp.sum(
                    -teacher_prob * jnp.log(student_prob + 1e-12), axis=1))
                gate = (epoch > start_epoch).astype(jnp.float32)
                total = loss_x + gate * (lambda_u * loss_u
                                         + lambda_in * loss_in)
                logs = {"loss": total, "loss_x": loss_x, "loss_u": loss_u,
                        "loss_in": loss_in,
                        "threshold1_ratio": jnp.mean(mask)}
                return total, (new_stats, ema_p, ema_bs, feat_kx, da,
                               logits_qx, logits_qu, logs)

            grads, (new_stats, ema_p, ema_bs, feat_kx, da, logits_qx,
                    logits_qu, logs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            # instance-bank scatter update (:140-147): teacher embeddings
            # of the labeled batch at their DATASET indices (host-stream
            # virtual caches carry them under "index"; the raw gather
            # index there is just arange(B))
            ds_l = dataset_indices(cache_l, idx_l)
            new_bank = bank.at[:, ds_l].set(feat_kx.T)
            new_bank_labels = bank_labels.at[ds_l].set(y_l)

            prob_x = jax.nn.softmax(logits_qx, axis=1)
            prob_u = jax.nn.softmax(logits_qu, axis=1)
            acc, acc_u, new_logs = self.update_logs(
                state, logs, prob_x, y_l, prob_u, y_u, binary)
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                da=da,
                extra={"bank": new_bank, "bank_labels": new_bank_labels},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        m_micro = int(cfg.micro_batches or 1)

        def step_micro(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                       epoch: jax.Array):
            """Micro-batched SimMatch step (``micro_batches: m > 1``):
            m sequential chunks of B/m, gradients accumulated, ONE
            Adam/EMAN update and ONE bank scatter per step — the same
            schedule that bought STiL +18% (docs/BENCHMARKS.md
            round-4; SimMatch measurement: round-5).

            Documented divergences from the single-batch semantics
            (same classes as STiL's step_micro; OFF by default —
            config micro_batches stays 1 pending a SimMatch-recipe
            convergence gate):
            - ghost BN (B/m statistics; running stats lerped m
              times/step),
            - the EMAN lerp consumes PRE-step running stats (the
              reference lerps post-forward ones),
            - DA: each chunk aligns against the queue with its own
              chunk mean in the new slot; the committed slot is the
              mean of chunk means (= the full-batch mean).
            Everything else decomposes exactly: the bank is frozen
            during the step in the reference too (update after the
            backward), chunk losses are equal-sized means, and the
            end-of-step scatter writes the identical rows."""
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
            bank = state.extra["bank"]
            bank_labels = state.extra["bank_labels"]
            onehot_bank = jax.nn.one_hot(bank_labels, c)

            # pre-step EMAN lerp (divergence: pre-forward stats)
            ema_p, ema_bs = ema_update(state.ema_params, params,
                                       momentum, True,
                                       state.ema_batch_stats,
                                       state.batch_stats)
            ema_p = jax.lax.stop_gradient(ema_p)
            ema_bs = jax.lax.stop_gradient(ema_bs)
            state_t = dataclasses.replace(state, ema_params=ema_p,
                                          ema_batch_stats=ema_bs)

            def body(carry, xs):
                bstats, gacc, da_acc, acc, acc_u, lacc = carry
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
                    logits, feat, new_stats = self.apply_student(
                        p, bstats, jnp.concatenate([img_x, img_s]),
                        jnp.concatenate([tab_x, tab_s]), kd_c)
                    logits_k, feat_k = self.apply_teacher(
                        state_t, jnp.concatenate([img_x, img_w]),
                        jnp.concatenate([tab_x, tab_w]))
                    feat_kx, feat_ku = feat_k[:blc], feat_k[blc:]
                    prob_ku_orig = jax.nn.softmax(logits_k[blc:], axis=1)
                    if use_da:
                        da_c, prob_ku_orig = distribution_alignment(
                            state.da, prob_ku_orig)
                        chunk_mean = da_c.queue[state.da.ptr]
                    else:
                        chunk_mean = jnp.zeros((c,), jnp.float32)
                    teacher_logits = feat_ku @ bank
                    teacher_prob_orig = jax.nn.softmax(
                        teacher_logits / tt, axis=1)
                    factor = prob_ku_orig @ onehot_bank.T
                    teacher_prob = teacher_prob_orig * factor
                    teacher_prob = teacher_prob / jnp.clip(
                        jnp.sum(teacher_prob, axis=1, keepdims=True),
                        1e-12)
                    aggregated = teacher_prob_orig @ onehot_bank
                    prob_ku = (c_smooth * prob_ku_orig
                               + (1 - c_smooth) * aggregated)
                    mask = (jnp.max(prob_ku, axis=1) >= threshold) \
                        .astype(jnp.float32)
                    logits_qx, logits_qu = logits[:blc], logits[blc:]
                    feat_qu = feat[blc:]
                    loss_x = cross_entropy(logits_qx, y_l)
                    loss_u = jnp.mean(soft_cross_entropy(
                        logits_qu, prob_ku, "none") * mask)
                    student_prob = jax.nn.softmax(
                        (feat_qu @ bank) / st, axis=1)
                    loss_in = jnp.mean(jnp.sum(
                        -teacher_prob * jnp.log(student_prob + 1e-12),
                        axis=1))
                    gate = (epoch > start_epoch).astype(jnp.float32)
                    total = loss_x + gate * (lambda_u * loss_u
                                             + lambda_in * loss_in)
                    logs = {"loss": total, "loss_x": loss_x,
                            "loss_u": loss_u, "loss_in": loss_in,
                            "threshold1_ratio": jnp.mean(mask)}
                    return total, (new_stats, feat_kx, chunk_mean,
                                   logits_qx, logits_qu, logs)

                grads, (new_bstats, feat_kx, chunk_mean, logits_qx,
                        logits_qu, logs) = jax.grad(
                    loss_fn, has_aux=True)(params)
                gacc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), gacc, grads)
                da_acc = da_acc + chunk_mean
                prob_x = jax.nn.softmax(logits_qx, axis=1)
                prob_u = jax.nn.softmax(logits_qu, axis=1)
                px = prob_x[:, 1] if binary else prob_x
                pu = prob_u[:, 1] if binary else prob_u
                acc = accuracy_update(acc, px, y_l)
                acc_u = accuracy_update(acc_u, pu, y_u)
                lacc = {k: lacc[k] + logs[k] for k in lacc}
                return (new_bstats, gacc, da_acc, acc, acc_u,
                        lacc), feat_kx

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            carry0 = (state.batch_stats, zero_g,
                      jnp.zeros((c,), jnp.float32),
                      state.acc_train, state.acc_train_u,
                      {k: jnp.zeros((), jnp.float32)
                       for k in self.LOG_KEYS})
            (new_stats, gacc, da_acc, acc, acc_u, lacc), feat_kx_all = \
                jax.lax.scan(body, carry0, (il, iu, kls, kus, kds))

            grads = jax.tree_util.tree_map(lambda g: g / m_micro, gacc)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)
            if use_da:
                queue = state.da.queue.at[state.da.ptr].set(
                    da_acc / m_micro)
                da = DAState(queue,
                             (state.da.ptr + 1) % state.da.queue.shape[0])
            else:
                da = state.da
            feat_kx_flat = feat_kx_all.reshape(b_l, -1)
            ds_l = dataset_indices(cache_l, idx_l)
            new_bank = bank.at[:, ds_l].set(feat_kx_flat.T)
            y_l_all = gather_batch(cache_l, idx_l)["labels"]
            new_bank_labels = bank_labels.at[ds_l].set(y_l_all)
            new_logs = {k: state.log_sums[k] + lacc[k] / m_micro
                        for k in state.log_sums}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                da=da,
                extra={"bank": new_bank,
                       "bank_labels": new_bank_labels},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step if m_micro == 1 else step_micro,
                       donate_argnums=(0,))
