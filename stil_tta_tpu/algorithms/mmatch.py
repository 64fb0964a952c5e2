"""MMatch (multimodal pseudo-labeling with a memory bank, no EMA).

Parity target: ``/root/reference/models/SemiMultimodal/MMatch.py``:
three-head concat backbone (no teacher); DA (``:135-148``); memory bank
``embed_queue (proj_dim, 640)`` + ``probs_queue`` ring (``:57-62,
101-117``); memory-smoothed pseudo-label ``0.9·DA + 0.1·A@probs_bank``
after epoch 0 (``:215-223``); hard-label masked CE on the imaging and
tabular heads only (``:225-230``); loss = ``α·CE_l +
mmatch_λ·(L_i + L_t)`` after ``start_epoch`` (``:236-239``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.algorithms.base import DAState, distribution_alignment
from stil_tta_tpu.algorithms.match_common import MatchBase, MatchState
from stil_tta_tpu.ops.metrics import accuracy_update
from stil_tta_tpu.data.augment import contrastive_pipeline
from stil_tta_tpu.data.corrupt import corrupt_tabular
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.losses import cross_entropy, soft_cross_entropy
from stil_tta_tpu.models.backbones import SemiMultimodalBackbone

MMATCH_K = 640  # MMatch.py:52 (`self.K = 640`)


class SemiMultimodalNet(nn.Module):
    encoder: str
    field_lengths: Tuple[int, ...]
    num_classes: int
    projection_dim: int = 128
    tabular_embedding_dim: int = 512
    multimodal_embedding_dim: int = 512
    tabular_num_layers: int = 4
    tabular_encoder: str = "transformer"
    saint_ff_dropout: float = 0.8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, tabular, train: bool = False):
        return SemiMultimodalBackbone(
            model=self.encoder, field_lengths=self.field_lengths,
            num_classes=self.num_classes,
            projection_dim=self.projection_dim,
            tabular_embedding_dim=self.tabular_embedding_dim,
            multimodal_embedding_dim=self.multimodal_embedding_dim,
            tabular_num_layers=self.tabular_num_layers,
            tabular_encoder=self.tabular_encoder,
            saint_ff_dropout=self.saint_ff_dropout,
            dtype=self.dtype, name="backbone")(image, tabular, train=train)


class MMatch(MatchBase):
    name = "MMatch"
    LOG_KEYS = ("loss", "CEloss", "CEloss_unlabelled_i",
                "CEloss_unlabelled_t", "threshold1_ratio")
    tabular_encoder = "transformer"

    def __init__(self, cfg, field_lengths, dtype=jnp.bfloat16):
        super().__init__(cfg, field_lengths, dtype=dtype)
        # MMatch/CoTraining always ride the 3-head concat backbone and
        # the contrastive view recipe (``ContrastiveImagingAndTabular
        # Dataset`` via strategy semisl — ``evaluate.py:72-80``)
        self.net = SemiMultimodalNet(
            encoder=cfg.model,
            field_lengths=tuple(int(x) for x in field_lengths),
            num_classes=self.num_classes,
            projection_dim=int(cfg.projection_dim),
            tabular_embedding_dim=int(cfg.tabular_embedding_dim),
            multimodal_embedding_dim=int(cfg.multimodal_embedding_dim),
            tabular_num_layers=int(cfg.tabular_transformer_num_layers),
            tabular_encoder=self.tabular_encoder,
            saint_ff_dropout=(0.8 if cfg.saint_ff_dropout is None
                              else float(cfg.saint_ff_dropout)),
            dtype=dtype)
        self.multimodal = True
        self.aug_train = contrastive_pipeline(
            int(cfg.img_size), cfg.target,
            float(cfg.crop_scale_lower or 0.08))

    def extra_state(self, rng) -> Dict[str, jax.Array]:
        dim = int(self.cfg.projection_dim)
        c = self.num_classes
        q = jax.random.normal(jax.random.key(17), (dim, MMATCH_K),
                              jnp.float32)
        q = q / jnp.linalg.norm(q, axis=0, keepdims=True)
        return {"embed_queue": q,
                "probs_queue": jnp.zeros((c, MMATCH_K), jnp.float32),
                "ptr": jnp.zeros((), jnp.int32)}

    def contrastive_views(self, key, images, tabular, marginal):
        k1, k2 = jax.random.split(key)
        imgs = self.aug_train(k1, images,
                              apply_rate=float(self.cfg.augmentation_rate))
        tabs = corrupt_tabular(k2, tabular, marginal,
                               float(self.cfg.corruption_rate))
        return imgs, tabs

    def _apply_3head(self, params, batch_stats, images, tabular, rng):
        (om, oi, ot, xm), mut = self.net.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            tabular, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        return om, oi, ot, xm, mut["batch_stats"]

    def make_eval_step(self):
        net, aug = self.net, self.aug_eval

        def step(params, batch_stats, cache, idx, pad_w=None):
            del pad_w  # pad rows are dropped host-side (no batch losses)
            batch = gather_batch(cache, idx)
            imgs = aug(jax.random.key(0), batch["images"])
            om, oi, ot, _ = net.apply(
                {"params": params, "batch_stats": batch_stats}, imgs,
                batch["tabular"], train=False)
            return {"prob_m": jax.nn.softmax(om, axis=1),
                    "prob_i": jax.nn.softmax(oi, axis=1),
                    "prob_t": jax.nn.softmax(ot, axis=1),
                    "labels": batch["labels"]}

        return jax.jit(step)

    def make_train_step(self):
        cfg = self.cfg
        c = self.num_classes
        alpha = float(cfg.alpha)
        lam = float(cfg.mmatch_lambda or 1.0)
        th1 = float(cfg.th1)
        temp = float(cfg.temperature)
        start_epoch = int(cfg.start_epoch)
        binary = c == 2
        from stil_tta_tpu.algorithms.comatch import CoMatch
        enqueue = CoMatch._enqueue

        def step(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            rng, kl, ku, kd = jax.random.split(state.rng, 4)
            bl = gather_batch(cache_l, idx_l)
            bu = gather_batch(cache_u, idx_u)
            y_l, y_u = bl["labels"], bu["labels"]
            b_l, b_u = y_l.shape[0], y_u.shape[0]
            ex = state.extra

            img_l, tab_l = self.contrastive_views(kl, bl["images"],
                                                  bl["tabular"],
                                                  marginal_table(cache_l))
            img_u, tab_u = self.contrastive_views(ku, bu["images"],
                                                  bu["tabular"],
                                                  marginal_table(cache_u))
            images = jnp.concatenate([img_l, img_u])
            tabs = jnp.concatenate([tab_l, tab_u])

            def loss_fn(params):
                """Single forward: the pseudo labels come from the same
                student pass (the reference has no EMA here,
                ``MMatch.py:215-230``) under stop_gradient."""
                om, oi, ot, xm, new_stats = self._apply_3head(
                    params, state.batch_stats, images, tabs, kd)
                feat_m = jax.lax.stop_gradient(xm)
                feat_m = feat_m / jnp.clip(
                    jnp.linalg.norm(feat_m, axis=1, keepdims=True), 1e-12)
                da, pseudo = distribution_alignment(
                    state.da, jax.nn.softmax(
                        jax.lax.stop_gradient(om[b_l:]), axis=1))
                a = jnp.exp((feat_m[b_l:] @ ex["embed_queue"]) / temp)
                a = a / jnp.clip(jnp.sum(a, axis=1, keepdims=True), 1e-12)
                smoothed = 0.9 * pseudo + 0.1 * (a @ ex["probs_queue"].T)
                pseudo = jnp.where(epoch > 0, smoothed, pseudo)
                mask1 = (jnp.max(pseudo, axis=1) >= th1) \
                    .astype(jnp.float32)
                hard = jax.nn.one_hot(jnp.argmax(pseudo, axis=1), c,
                                      dtype=jnp.float32)
                loss_ce = (cross_entropy(om[:b_l], y_l)
                           + cross_entropy(oi[:b_l], y_l)
                           + cross_entropy(ot[:b_l], y_l))
                loss_i_u = jnp.mean(soft_cross_entropy(oi[b_l:], hard,
                                                       "none") * mask1)
                loss_t_u = jnp.mean(soft_cross_entropy(ot[b_l:], hard,
                                                       "none") * mask1)
                gate = (epoch > start_epoch).astype(jnp.float32)
                total = alpha * loss_ce + gate * lam * (loss_i_u
                                                        + loss_t_u)
                logs = {"loss": total, "CEloss": loss_ce,
                        "CEloss_unlabelled_i": loss_i_u,
                        "CEloss_unlabelled_t": loss_t_u,
                        "threshold1_ratio": jnp.mean(mask1)}
                return total, (new_stats, om, feat_m, pseudo, da, logs)

            grads, (new_stats, om, feat_m, pseudo, da, logs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            pseudo_all = jnp.concatenate(
                [jax.nn.one_hot(y_l, c, dtype=jnp.float32), pseudo])
            queue, probs_q, ptr = enqueue(ex["embed_queue"],
                                          ex["probs_queue"], ex["ptr"],
                                          feat_m, pseudo_all)

            prob_m = jax.nn.softmax(om, axis=1)
            acc, acc_u, new_logs = self.update_logs(
                state, logs, prob_m[:b_l], y_l, prob_m[b_l:], y_u, binary)
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, rng=rng, step=state.step + 1, da=da,
                extra={"embed_queue": queue, "probs_queue": probs_q,
                       "ptr": ptr},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        m_micro = int(cfg.micro_batches or 1)

        def step_micro(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                       epoch: jax.Array):
            """Micro-batched MMatch step (``micro_batches: m > 1``; OFF
            by default pending its convergence gate). No EMA here —
            divergences are ghost BN and per-chunk DA alignment only;
            the memory bank is frozen within the step (reference
            enqueues after the backward) and the end-of-step enqueue
            writes the identical full-batch rows in the monolithic
            [labeled..., unlabeled...] order."""
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

            def body(carry, xs):
                bstats, gacc, da_acc, acc, acc_u, lacc = carry
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
                    om, oi, ot, xm, new_stats = self._apply_3head(
                        p, bstats, images, tabs, kd_c)
                    feat_m = jax.lax.stop_gradient(xm)
                    feat_m = feat_m / jnp.clip(
                        jnp.linalg.norm(feat_m, axis=1, keepdims=True),
                        1e-12)
                    da_c, pseudo = distribution_alignment(
                        state.da, jax.nn.softmax(
                            jax.lax.stop_gradient(om[blc:]), axis=1))
                    chunk_mean = da_c.queue[state.da.ptr]
                    a = jnp.exp((feat_m[blc:] @ ex["embed_queue"])
                                / temp)
                    a = a / jnp.clip(
                        jnp.sum(a, axis=1, keepdims=True), 1e-12)
                    smoothed = (0.9 * pseudo
                                + 0.1 * (a @ ex["probs_queue"].T))
                    pseudo = jnp.where(epoch > 0, smoothed, pseudo)
                    mask1 = (jnp.max(pseudo, axis=1) >= th1) \
                        .astype(jnp.float32)
                    hard = jax.nn.one_hot(jnp.argmax(pseudo, axis=1), c,
                                          dtype=jnp.float32)
                    loss_ce = (cross_entropy(om[:blc], y_l)
                               + cross_entropy(oi[:blc], y_l)
                               + cross_entropy(ot[:blc], y_l))
                    loss_i_u = jnp.mean(soft_cross_entropy(
                        oi[blc:], hard, "none") * mask1)
                    loss_t_u = jnp.mean(soft_cross_entropy(
                        ot[blc:], hard, "none") * mask1)
                    gate = (epoch > start_epoch).astype(jnp.float32)
                    total = alpha * loss_ce + gate * lam * (
                        loss_i_u + loss_t_u)
                    logs = {"loss": total, "CEloss": loss_ce,
                            "CEloss_unlabelled_i": loss_i_u,
                            "CEloss_unlabelled_t": loss_t_u,
                            "threshold1_ratio": jnp.mean(mask1)}
                    return total, (new_stats, om, feat_m, pseudo,
                                   chunk_mean, logs)

                grads, (new_bstats, om, feat_m, pseudo, chunk_mean,
                        logs) = jax.grad(loss_fn, has_aux=True)(params)
                gacc = jax.tree_util.tree_map(
                    lambda a_, g: a_ + g.astype(a_.dtype), gacc, grads)
                da_acc = da_acc + chunk_mean
                prob_m = jax.nn.softmax(om, axis=1)
                px = prob_m[:blc, 1] if binary else prob_m[:blc]
                pu = prob_m[blc:, 1] if binary else prob_m[blc:]
                acc = accuracy_update(acc, px, y_l)
                acc_u = accuracy_update(acc_u, pu, y_u)
                lacc = {k: lacc[k] + logs[k] for k in lacc}
                return (new_bstats, gacc, da_acc, acc, acc_u, lacc), \
                    (feat_m, pseudo)

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            carry0 = (state.batch_stats, zero_g,
                      jnp.zeros((c,), jnp.float32),
                      state.acc_train, state.acc_train_u,
                      {k: jnp.zeros((), jnp.float32)
                       for k in self.LOG_KEYS})
            ((new_stats, gacc, da_acc, acc, acc_u, lacc),
             (feat_all, pseudo_all_u)) = jax.lax.scan(
                body, carry0, (il, iu, kls, kus, kds))

            grads = jax.tree_util.tree_map(lambda g: g / m_micro, gacc)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)
            queue = state.da.queue.at[state.da.ptr].set(da_acc / m_micro)
            da = DAState(queue,
                         (state.da.ptr + 1) % state.da.queue.shape[0])

            dim = feat_all.shape[-1]
            f_l = feat_all[:, :blc].reshape(b_l, dim)
            f_u = feat_all[:, blc:].reshape(b_u, dim)
            feat_m_all = jnp.concatenate([f_l, f_u], axis=0)
            pseudo_u = pseudo_all_u.reshape(b_u, c)
            y_l_all = gather_batch(cache_l, idx_l)["labels"]
            pseudo_all = jnp.concatenate(
                [jax.nn.one_hot(y_l_all, c, dtype=jnp.float32),
                 pseudo_u])
            q2, probs_q, ptr = enqueue(ex["embed_queue"],
                                       ex["probs_queue"], ex["ptr"],
                                       feat_m_all, pseudo_all)

            new_logs = {k: state.log_sums[k] + lacc[k] / m_micro
                        for k in state.log_sums}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, rng=rng, step=state.step + 1, da=da,
                extra={"embed_queue": q2, "probs_queue": probs_q,
                       "ptr": ptr},
                acc_train=acc, acc_train_u=acc_u, log_sums=new_logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step if m_micro == 1 else step_micro,
                       donate_argnums=(0,))
