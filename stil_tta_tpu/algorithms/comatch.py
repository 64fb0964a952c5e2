"""CoMatch (graph-based contrastive co-training of class probs and
embeddings).

Parity target: ``/root/reference/models/MatchModel/CoMatch.py`` +
``comatch_model.py``: momentum encoder; two circular queues (K=2560) —
strong-aug features+probs and weak-aug features+probs incl. labeled
one-hots (``comatch_model.py:80-90, 116-146, 314-321``); DA via a
128-window history of batch-mean probs (``:270-284``); memory-smoothed
pseudo-labels (``:287-293``); pseudo-label graph Q = [probs·probsᵀ
(diag=1), probs·bank] and embedding graph from the two strong views +
queue (``:295-312``); loss = ``loss_x + λ_u·masked soft-CE +
min(epoch+1, λ_c)·graph-contrastive`` with edge threshold
``contrast_th`` (``CoMatch.py:96-117``). Requires two strong views
(``trainers/evaluate.py:54``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from stil_tta_tpu.algorithms.base import ema_update
from stil_tta_tpu.algorithms.match_common import MatchBase, MatchState
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.losses import cross_entropy, soft_cross_entropy
from stil_tta_tpu.ops.metrics import accuracy_update

DA_WINDOW = 128  # comatch_model.py:281 (`len(self.hist_prob) > 128`)


class CoMatch(MatchBase):
    name = "CoMatch"
    LOG_KEYS = ("loss", "loss_x", "loss_u", "loss_contrast",
                "threshold1_ratio")

    def extra_state(self, rng) -> Dict[str, jax.Array]:
        k = int(self.cfg.K or 2560)
        dim = int(self.cfg.projection_dim)
        c = self.num_classes
        norm = lambda x: x / jnp.linalg.norm(x, axis=0, keepdims=True)
        return {
            "queue_s": norm(jax.random.normal(jax.random.key(11),
                                              (dim, k), jnp.float32)),
            "probs_u": jnp.zeros((c, k), jnp.float32),
            "queue_w": jax.random.normal(jax.random.key(13), (dim, k),
                                         jnp.float32),
            "probs_xu": jnp.zeros((c, k), jnp.float32),
            "ptr_s": jnp.zeros((), jnp.int32),
            "ptr_w": jnp.zeros((), jnp.int32),
            # DA history ring (list in the reference; fixed ring here)
            "hist_prob": jnp.zeros((DA_WINDOW, c), jnp.float32),
            "hist_len": jnp.zeros((), jnp.int32),
            "hist_ptr": jnp.zeros((), jnp.int32),
        }

    @staticmethod
    def _enqueue(queue, probs, ptr, z, t):
        """Circular enqueue with boundary truncation
        (``comatch_model.py:118-146``). Batch and K are static, so the
        truncation is a mask over scatter indices."""
        k = queue.shape[1]
        b = z.shape[0]
        offs = jnp.arange(b)
        idx = ptr + offs
        valid = idx < k  # truncate at the boundary, as the reference does
        idx = jnp.where(valid, idx, k)  # out-of-range -> dropped
        queue = queue.at[:, idx].set(jnp.where(valid[None, :], z.T,
                                               queue.at[:, idx].get()),
                                     mode="drop")
        probs = probs.at[:, idx].set(jnp.where(valid[None, :], t.T,
                                               probs.at[:, idx].get()),
                                     mode="drop")
        new_ptr = (ptr + jnp.minimum(b, k - ptr)) % k
        return queue, probs, new_ptr

    def make_train_step(self):
        cfg = self.cfg
        c = self.num_classes
        thr = float(cfg.co_threshold)
        contrast_th = float(cfg.contrast_th)
        lam_u, lam_c_max = float(cfg.lam_u), float(cfg.lam_c)
        alpha = float(cfg.alpha)
        temp = float(cfg.co_temperature or cfg.temperature)
        start_epoch = int(cfg.start_epoch)
        momentum = float(cfg.ema_momentum)
        binary = c == 2

        def step(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            rng, kl, ku, kd, kt = jax.random.split(state.rng, 5)
            bl = gather_batch(cache_l, idx_l)
            bu = gather_batch(cache_u, idx_u)
            y_l, y_u = bl["labels"], bu["labels"]
            b_l, b_u = y_l.shape[0], y_u.shape[0]
            ex = state.extra

            img_x, tab_x = self.labeled_views(kl, bl["images"],
                                              bl["tabular"],
                                              marginal_table(cache_l))
            (img_w, tab_w), (img_s0, tab_s0), (img_s1, tab_s1) = \
                self.weak_strong_views(ku, bu["images"], bu["tabular"],
                                       marginal_table(cache_u), two_strong=True)

            # momentum encoder update + teacher fwd on (x, u_w, u_s1).
            # NOTE two reference quirks kept (``comatch_model.py``):
            # (1) the lerp is *parameters only* (``:111-115``), unlike
            # SimMatch/FreeMatch's state-dict lerp; (2) the momentum
            # encoder is never switched to eval() — Lightning leaves it
            # in TRAIN mode, so its forward normalises by the current
            # batch statistics (``:245-253``; its own running stats
            # drift but are never read). We therefore run the teacher
            # with train-mode BN and discard the mutated stats.
            ema_p, ema_bs = ema_update(state.ema_params, state.params,
                                       momentum, False,
                                       state.ema_batch_stats,
                                       state.batch_stats)
            ema_p = jax.lax.stop_gradient(ema_p)
            logits_m, feats_m, _ = self.apply_student(
                ema_p, state.ema_batch_stats,
                jnp.concatenate([img_x, img_w, img_s1]),
                jnp.concatenate([tab_x, tab_w, tab_s1]), kt)
            logits_m = jax.lax.stop_gradient(logits_m)
            feats_m = jax.lax.stop_gradient(feats_m)
            outputs_uw = logits_m[b_l:b_l + b_u]
            feature_uw = feats_m[b_l:b_l + b_u]
            feature_xuw = feats_m[:b_l + b_u]
            features_us1 = feats_m[b_l + b_u:]

            probs = jax.nn.softmax(outputs_uw, axis=1)
            # DA over a 128-deep history ring (:270-284)
            mean_p = jnp.mean(probs, axis=0)
            hist = ex["hist_prob"].at[ex["hist_ptr"]].set(mean_p)
            hist_len = jnp.minimum(ex["hist_len"] + 1, DA_WINDOW)
            hist_ptr = (ex["hist_ptr"] + 1) % DA_WINDOW
            probs_avg = jnp.sum(hist, axis=0) / hist_len.astype(jnp.float32)
            probs = probs / jnp.clip(probs_avg, 1e-12)
            probs = probs / jnp.sum(probs, axis=1, keepdims=True)
            probs_orig = probs

            # memory-smoothed refinement after start_epoch (:287-293)
            a = jnp.exp((feature_uw @ ex["queue_w"]) / temp)
            a = a / jnp.clip(jnp.sum(a, axis=1, keepdims=True), 1e-12)
            smoothed = alpha * probs + (1 - alpha) * (a @ ex["probs_xu"].T)
            probs = jnp.where(epoch > start_epoch, smoothed, probs)

            # pseudo-label graph Q (:295-306)
            q_self = probs @ probs.T
            q_self = q_self * (1 - jnp.eye(b_u)) + jnp.eye(b_u)
            q_past = probs @ ex["probs_u"]
            q = jnp.concatenate([q_self, q_past], axis=1)

            mask = (jnp.max(probs, axis=1) >= thr).astype(jnp.float32)

            def loss_fn(params):
                logits, feats, new_stats = self.apply_student(
                    params, state.batch_stats,
                    jnp.concatenate([img_x, img_s0]),
                    jnp.concatenate([tab_x, tab_s0]), kd)
                outputs_x, outputs_us0 = logits[:b_l], logits[b_l:]
                features_us0 = feats[b_l:]
                loss_x = cross_entropy(outputs_x, y_l)
                loss_u = jnp.mean(soft_cross_entropy(
                    outputs_us0, probs, "none") * mask)
                # embedding graph over the two strong views + queue
                sim_self = jnp.exp((features_us0 @ features_us1.T) / temp)
                sim_past = jnp.exp((features_us0 @ ex["queue_s"]) / temp)
                sim = jnp.concatenate([sim_self, sim_past], axis=1)
                pos_mask = (q >= contrast_th).astype(jnp.float32)
                q_mask = q * pos_mask
                q_mask = q_mask / jnp.clip(
                    jnp.sum(q_mask, axis=1, keepdims=True), 1e-12)
                pos_probs = (sim * pos_mask) / jnp.clip(
                    jnp.sum(sim, axis=1, keepdims=True), 1e-12)
                log_probs = jnp.log(pos_probs + 1e-7) * pos_mask
                loss_contrast = jnp.mean(-jnp.sum(log_probs * q_mask,
                                                  axis=1))
                lam_c = jnp.minimum(epoch.astype(jnp.float32) + 1.0,
                                    lam_c_max)
                gate = (epoch > start_epoch).astype(jnp.float32)
                total = loss_x + gate * (lam_u * loss_u
                                         + lam_c * loss_contrast)
                logs = {"loss": total, "loss_x": loss_x, "loss_u": loss_u,
                        "loss_contrast": loss_contrast,
                        "threshold1_ratio": jnp.mean(mask)}
                return total, (new_stats, outputs_x, outputs_us0, logs)

            grads, (new_stats, outputs_x, outputs_us0, logs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            # queue updates (:314-321)
            queue_s, probs_u, ptr_s = self._enqueue(
                ex["queue_s"], ex["probs_u"], ex["ptr_s"], features_us1,
                probs)
            onehot = jax.nn.one_hot(y_l, c, dtype=jnp.float32)
            probs_xu_new = jnp.concatenate([onehot, probs_orig], axis=0)
            queue_w, probs_xu, ptr_w = self._enqueue(
                ex["queue_w"], ex["probs_xu"], ex["ptr_w"], feature_xuw,
                probs_xu_new)

            prob_x = jax.nn.softmax(outputs_x, axis=1)
            prob_u = jax.nn.softmax(outputs_us0, axis=1)
            acc, acc_u, new_logs = self.update_logs(
                state, logs, prob_x, y_l, prob_u, y_u, binary)
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                extra={"queue_s": queue_s, "probs_u": probs_u,
                       "queue_w": queue_w, "probs_xu": probs_xu,
                       "ptr_s": ptr_s, "ptr_w": ptr_w,
                       "hist_prob": hist, "hist_len": hist_len,
                       "hist_ptr": hist_ptr},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        m_micro = int(cfg.micro_batches or 1)

        def step_micro(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                       epoch: jax.Array):
            """Micro-batched CoMatch step (``micro_batches: m > 1``; OFF
            by default pending a CoMatch-recipe convergence gate).

            Documented divergences (docs/BENCHMARKS.md round-5 /
            PARITY.md fast-profile entry):
            - ghost BN on student AND momentum encoder (the reference
              quirk keeps the momentum encoder in train-mode BN, so its
              normalisation also sees B/m statistics),
            - the pseudo-label and embedding GRAPHS couple in-batch
              samples, so each chunk builds its graph over B_u/m
              samples + the (frozen) queues — the chunked-in-batch-
              negatives divergence class,
            - DA: each chunk aligns with its own chunk mean in the
              history slot; the committed slot is the mean of chunk
              means; hist_len/ptr advance once per step.
            Exact: the momentum lerp is params-only from pre-step
            params (identical to monolithic), queue reads are frozen
            within the step in the reference too, and both end-of-step
            enqueues write the identical full-batch rows in order."""
            rng, kl, ku, kd, kt = jax.random.split(state.rng, 5)
            b_l, b_u = idx_l.shape[0], idx_u.shape[0]
            assert b_l % m_micro == 0 and b_u % m_micro == 0, (
                f"micro_batches={m_micro} must divide labeled ({b_l}) "
                f"and unlabeled ({b_u}) batch sizes")
            blc = b_l // m_micro
            buc = b_u // m_micro
            il = idx_l.reshape(m_micro, blc)
            iu = idx_u.reshape(m_micro, buc)
            kls = jax.random.split(kl, m_micro)
            kus = jax.random.split(ku, m_micro)
            kds = jax.random.split(kd, m_micro)
            kts = jax.random.split(kt, m_micro)
            marg_l = marginal_table(cache_l)
            marg_u = marginal_table(cache_u)
            params = state.params
            ex = state.extra
            ema_p, _ = ema_update(state.ema_params, params, momentum,
                                  False, state.ema_batch_stats,
                                  state.batch_stats)
            ema_p = jax.lax.stop_gradient(ema_p)
            ema_bs = state.ema_batch_stats

            def body(carry, xs):
                bstats, gacc, mean_acc, acc, acc_u, lacc = carry
                il_c, iu_c, kl_c, ku_c, kd_c, kt_c = xs
                bl = gather_batch(cache_l, il_c)
                bu = gather_batch(cache_u, iu_c)
                y_l, y_u = bl["labels"], bu["labels"]
                img_x, tab_x = self.labeled_views(kl_c, bl["images"],
                                                  bl["tabular"], marg_l)
                (img_w, tab_w), (img_s0, tab_s0), (img_s1, tab_s1) = \
                    self.weak_strong_views(ku_c, bu["images"],
                                           bu["tabular"], marg_u,
                                           two_strong=True)
                logits_m, feats_m, _ = self.apply_student(
                    ema_p, ema_bs,
                    jnp.concatenate([img_x, img_w, img_s1]),
                    jnp.concatenate([tab_x, tab_w, tab_s1]), kt_c)
                logits_m = jax.lax.stop_gradient(logits_m)
                feats_m = jax.lax.stop_gradient(feats_m)
                outputs_uw = logits_m[blc:blc + buc]
                feature_uw = feats_m[blc:blc + buc]
                feature_xuw = feats_m[:blc + buc]
                features_us1 = feats_m[blc + buc:]

                probs = jax.nn.softmax(outputs_uw, axis=1)
                chunk_mean = jnp.mean(probs, axis=0)
                hist_c = ex["hist_prob"].at[ex["hist_ptr"]].set(
                    chunk_mean)
                hist_len_c = jnp.minimum(ex["hist_len"] + 1, DA_WINDOW)
                probs_avg = (jnp.sum(hist_c, axis=0)
                             / hist_len_c.astype(jnp.float32))
                probs = probs / jnp.clip(probs_avg, 1e-12)
                probs = probs / jnp.sum(probs, axis=1, keepdims=True)
                probs_orig = probs
                a = jnp.exp((feature_uw @ ex["queue_w"]) / temp)
                a = a / jnp.clip(jnp.sum(a, axis=1, keepdims=True),
                                 1e-12)
                smoothed = (alpha * probs
                            + (1 - alpha) * (a @ ex["probs_xu"].T))
                probs = jnp.where(epoch > start_epoch, smoothed, probs)
                q_self = probs @ probs.T
                q_self = q_self * (1 - jnp.eye(buc)) + jnp.eye(buc)
                q_past = probs @ ex["probs_u"]
                q = jnp.concatenate([q_self, q_past], axis=1)
                mask = (jnp.max(probs, axis=1) >= thr) \
                    .astype(jnp.float32)

                def loss_fn(p):
                    logits, feats, new_stats = self.apply_student(
                        p, bstats, jnp.concatenate([img_x, img_s0]),
                        jnp.concatenate([tab_x, tab_s0]), kd_c)
                    outputs_x, outputs_us0 = logits[:blc], logits[blc:]
                    features_us0 = feats[blc:]
                    loss_x = cross_entropy(outputs_x, y_l)
                    loss_u = jnp.mean(soft_cross_entropy(
                        outputs_us0, probs, "none") * mask)
                    sim_self = jnp.exp(
                        (features_us0 @ features_us1.T) / temp)
                    sim_past = jnp.exp(
                        (features_us0 @ ex["queue_s"]) / temp)
                    sim = jnp.concatenate([sim_self, sim_past], axis=1)
                    pos_mask = (q >= contrast_th).astype(jnp.float32)
                    q_mask = q * pos_mask
                    q_mask = q_mask / jnp.clip(
                        jnp.sum(q_mask, axis=1, keepdims=True), 1e-12)
                    pos_probs = (sim * pos_mask) / jnp.clip(
                        jnp.sum(sim, axis=1, keepdims=True), 1e-12)
                    log_probs = jnp.log(pos_probs + 1e-7) * pos_mask
                    loss_contrast = jnp.mean(
                        -jnp.sum(log_probs * q_mask, axis=1))
                    lam_c = jnp.minimum(
                        epoch.astype(jnp.float32) + 1.0, lam_c_max)
                    gate = (epoch > start_epoch).astype(jnp.float32)
                    total = loss_x + gate * (lam_u * loss_u
                                             + lam_c * loss_contrast)
                    logs = {"loss": total, "loss_x": loss_x,
                            "loss_u": loss_u,
                            "loss_contrast": loss_contrast,
                            "threshold1_ratio": jnp.mean(mask)}
                    return total, (new_stats, logits[:blc],
                                   logits[blc:], logs)

                grads, (new_bstats, outputs_x, outputs_us0, logs) = \
                    jax.grad(loss_fn, has_aux=True)(params)
                gacc = jax.tree_util.tree_map(
                    lambda ag, g: ag + g.astype(ag.dtype), gacc, grads)
                mean_acc = mean_acc + chunk_mean
                prob_x = jax.nn.softmax(outputs_x, axis=1)
                prob_u = jax.nn.softmax(outputs_us0, axis=1)
                px = prob_x[:, 1] if binary else prob_x
                pu = prob_u[:, 1] if binary else prob_u
                acc = accuracy_update(acc, px, y_l)
                acc_u = accuracy_update(acc_u, pu, y_u)
                lacc = {k: lacc[k] + logs[k] for k in lacc}
                return ((new_bstats, gacc, mean_acc, acc, acc_u, lacc),
                        (features_us1, feature_xuw, probs, probs_orig))

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            carry0 = (state.batch_stats, zero_g,
                      jnp.zeros((c,), jnp.float32),
                      state.acc_train, state.acc_train_u,
                      {k: jnp.zeros((), jnp.float32)
                       for k in self.LOG_KEYS})
            ((new_stats, gacc, mean_acc, acc, acc_u, lacc),
             (f_us1, f_xuw, probs_all, probs_orig_all)) = jax.lax.scan(
                body, carry0, (il, iu, kls, kus, kds, kts))

            grads = jax.tree_util.tree_map(lambda g: g / m_micro, gacc)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)

            # DA history commit: one slot per step, mean of chunk means
            hist = ex["hist_prob"].at[ex["hist_ptr"]].set(
                mean_acc / m_micro)
            hist_len = jnp.minimum(ex["hist_len"] + 1, DA_WINDOW)
            hist_ptr = (ex["hist_ptr"] + 1) % DA_WINDOW

            # queue updates with the full-batch rows in the monolithic
            # order: f_xuw stacks per-chunk [x_chunk, u_chunk] blocks,
            # so split and regroup to [all labeled, all unlabeled]
            # before pairing with [onehot, probs_orig]
            dim = f_us1.shape[-1]
            f_us1 = f_us1.reshape(b_u, dim)
            f_x = f_xuw[:, :blc].reshape(b_l, dim)
            f_u = f_xuw[:, blc:].reshape(b_u, dim)
            f_xuw = jnp.concatenate([f_x, f_u], axis=0)
            probs_all = probs_all.reshape(b_u, c)
            probs_orig_all = probs_orig_all.reshape(b_u, c)
            queue_s, probs_u, ptr_s = self._enqueue(
                ex["queue_s"], ex["probs_u"], ex["ptr_s"], f_us1,
                probs_all)
            y_l_all = gather_batch(cache_l, idx_l)["labels"]
            onehot = jax.nn.one_hot(y_l_all, c, dtype=jnp.float32)
            probs_xu_new = jnp.concatenate([onehot, probs_orig_all],
                                           axis=0)
            queue_w, probs_xu, ptr_w = self._enqueue(
                ex["queue_w"], ex["probs_xu"], ex["ptr_w"], f_xuw,
                probs_xu_new)

            new_logs = {k: state.log_sums[k] + lacc[k] / m_micro
                        for k in state.log_sums}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                extra={"queue_s": queue_s, "probs_u": probs_u,
                       "queue_w": queue_w, "probs_xu": probs_xu,
                       "ptr_s": ptr_s, "ptr_w": ptr_w,
                       "hist_prob": hist, "hist_len": hist_len,
                       "hist_ptr": hist_ptr},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step if m_micro == 1 else step_micro,
                       donate_argnums=(0,))
