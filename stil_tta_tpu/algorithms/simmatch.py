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

from stil_tta_tpu.algorithms.base import distribution_alignment, ema_update
from stil_tta_tpu.algorithms.match_common import MatchBase, MatchState
from stil_tta_tpu.data.loader import (dataset_indices, gather_batch,
                                       marginal_table)
from stil_tta_tpu.losses import cross_entropy, soft_cross_entropy


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

        return jax.jit(step, donate_argnums=(0,))
