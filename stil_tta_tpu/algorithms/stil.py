"""STiL: Semi-supervised Tabular-Image Learning (DCC + CGPL + PGLS).

Parity target: ``/root/reference/models/Disentangle/STiLModel.py`` — the
flagship algorithm. One fused jitted train step computes, on device:

1. batch gather from the HBM dataset cache + on-device augmentation
   (contrastive view w.p. ``augmentation_rate``, tabular corruption),
2. EMAN teacher update + teacher forward (``:154-168, 249-258``),
3. CGPL consensus cases over the three teacher heads (``:262-274``),
4. PGLS prototype blending + confidence masks (``:291-303``),
5. student forward + the full loss graph: labeled CE on 3 heads, masked
   unlabeled CE with case routing, ITC (CLIP), CLUB MI + estimator
   likelihood, prototype loss (``:284-345``),
6. Adam update, prototype sum/count accumulation (``:374-381``) and
   streaming train metrics.

The reference needs ~3 backbone passes per step (student l+u, teacher
l+u) plus a CPU augmentation farm; here everything is one XLA program
with the augmentation riding the MXU/VPU ahead of the encoders.

Cross-replica notes (SURVEY.md §2.7): prototype sums, DA means, and BN
batch stats are plain jnp reductions over the (data-sharded) batch axis,
so GSPMD compiles them to ICI all-reduces — the reference's
``dist.all_reduce`` calls with no explicit collectives in algorithm code.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct
import numpy as np

from stil_tta_tpu.algorithms.base import (DAState, TrainState,
                                          distribution_alignment,
                                          ema_update, sharpen)
from stil_tta_tpu.data.augment import (AugmentPipeline, contrastive_pipeline,
                                       default_pipeline)
from stil_tta_tpu.data.corrupt import corrupt_tabular
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.losses import (club_losses, clip_loss, cross_entropy,
                                 prototype_loss, soft_cross_entropy)
from stil_tta_tpu.losses.club import CLUBMean
from stil_tta_tpu.losses.common import at_least_f32
from stil_tta_tpu.models.backbones import DisCoBackbone
from stil_tta_tpu.models.layers import SimCLRProjectionHead
from stil_tta_tpu.ops.metrics import (AccuracyState, AUROCState,
                                      accuracy_init, accuracy_update,
                                      auroc_compute, auroc_init,
                                      auroc_update)
from stil_tta_tpu.train.optim import build_optimizer


def _l2norm(x):
    x = at_least_f32(x)
    return x / jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)


class STiLNet(nn.Module):
    """Backbone + ITC projectors + CLUB estimators in one param tree
    (mirrors the reference's module graph: backbone ``STiLModel.py:34``,
    projectors ``:56-64``, CLUB heads ``:67-68``)."""

    encoder: str
    field_lengths: Tuple[int, ...]
    num_classes: int
    target: str = "dvm"
    projection_dim: int = 128
    tabular_embedding_dim: int = 512
    multimodal_embedding_dim: int = 512
    tabular_num_layers: int = 4
    multimodal_num_layers: int = 1
    embedding_dropout: float = 0.0
    drop_rate: float = 0.0
    tabular_encoder: str = "transformer"
    saint_ff_dropout: float = 0.8  # reference hard-codes 0.8
    # int8-quantized image-tower convs in the TEACHER forward only
    # (``teacher_int8`` config key): the EMA teacher is pure inference,
    # so its convs can ride the v5e MXU's ~2x int8 rate. Documented
    # fast-profile numerics change inside the ±0.3% accuracy gate
    # (tools/convergence_micro.py); eval/val/test forwards are
    # untouched.
    teacher_int8: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        hid = self.multimodal_embedding_dim
        self.backbone = DisCoBackbone(
            model=self.encoder, field_lengths=self.field_lengths,
            num_classes=self.num_classes,
            tabular_embedding_dim=self.tabular_embedding_dim,
            multimodal_embedding_dim=hid,
            tabular_num_layers=self.tabular_num_layers,
            multimodal_num_layers=self.multimodal_num_layers,
            embedding_dropout=self.embedding_dropout,
            drop_rate=self.drop_rate,
            tabular_encoder=self.tabular_encoder,
            saint_ff_dropout=self.saint_ff_dropout, dtype=self.dtype)
        self.projector_multimodal = SimCLRProjectionHead(
            hid * 3, self.projection_dim, dtype=self.dtype)
        if self.target == "dvm":
            # DVM uses linear ITC heads (``STiLModel.py:57-60``)
            self.projector_imaging = nn.Dense(self.projection_dim,
                                              param_dtype=jnp.float32)
            self.projector_tabular = nn.Dense(self.projection_dim,
                                              param_dtype=jnp.float32)
        else:
            self.projector_imaging = SimCLRProjectionHead(
                hid, self.projection_dim, dtype=self.dtype)
            self.projector_tabular = SimCLRProjectionHead(
                hid, self.projection_dim, dtype=self.dtype)
        self.club_imaging = CLUBMean(hid)
        self.club_tabular = CLUBMean(hid)

    def __call__(self, image, tabular, train: bool = False,
                 missing_mask=None,
                 int8_image: bool = False) -> Dict[str, jax.Array]:
        """``int8_image``: quantized image-tower convs (serving fast
        path — stil_tta_tpu/serve.py ``int8``); never used by the
        training/eval drivers."""
        out = self.backbone(image, tabular, train=train,
                            missing_mask=missing_mask,
                            int8_image=int8_image and not train)
        feat_m_raw = jnp.concatenate(
            [out["x_si_enhance"], out["x_c"], out["x_st_enhance"]], axis=1)
        out["feat_m"] = _l2norm(self.projector_multimodal(feat_m_raw))
        out["feat_i"] = _l2norm(self.projector_imaging(out["x_ai"]))
        out["feat_t"] = _l2norm(self.projector_tabular(out["x_at"]))
        out["mu_i"] = self.club_imaging(out["x_si"])
        out["mu_t"] = self.club_tabular(out["x_st"])
        return out

    def teacher(self, image, tabular,
                missing_mask=None) -> Dict[str, jax.Array]:
        """EMA forward: backbone (EMA weights) + multimodal projector
        (student weights — the reference EMA copies only the backbone,
        ``STiLModel.py:88, 252-254``)."""
        out = self.backbone(image, tabular, train=False,
                            missing_mask=missing_mask,
                            int8_image=self.teacher_int8)
        feat_m_raw = jnp.concatenate(
            [out["x_si_enhance"], out["x_c"], out["x_st_enhance"]], axis=1)
        return {
            "out_m": out["out_m"], "out_i": out["out_i"],
            "out_t": out["out_t"],
            "feat_m": _l2norm(self.projector_multimodal(feat_m_raw)),
        }


@flax.struct.dataclass
class STiLState(TrainState):
    prototypes: jax.Array = None       # (C, P)
    prototypes_sum: jax.Array = None
    prototypes_count: jax.Array = None  # (C, 1)
    da: Optional[DAState] = None
    acc_train: AccuracyState = None
    acc_train_u: AccuracyState = None
    auc_train: AUROCState = None      # binary tasks only
    auc_train_u: AUROCState = None
    log_sums: Dict[str, jax.Array] = None
    log_count: jax.Array = None


LOG_KEYS = (
    "CEloss", "CEloss_unlabelled_m", "CEloss_unlabelled_i",
    "CEloss_unlabelled_t", "threshold1_ratio", "case1_ratio",
    "case2_i_ratio", "case2_t_ratio", "case3_ratio", "ITCloss",
    "CLUBloss_imaging", "CLUBloss_imaging_est", "CLUBloss_tabular",
    "CLUBloss_tabular_est", "PTloss", "loss",
)


class STiL:
    """Host-side orchestrator building the jitted steps.

    cfg keys consumed (names mirror ``config_dvm_STiL.yaml``): alpha,
    beta, gamma, rate_pt, rate_uce, th1, temperature, lambda_0,
    rate_pseudo, start_epoch, repeat_ratio, use_ema, eman, ema_momentum,
    DA, augmentation_rate, corruption_rate, crop_scale_lower, img_size,
    projection_dim, num_classes, target, model/models, lr_eval,
    weight_decay_eval.
    """

    name = "STiL"
    tabular_encoder = "transformer"

    def __init__(self, cfg, field_lengths, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.num_classes = int(cfg.num_classes)
        if bool(getattr(cfg, "teacher_int8", False)) \
                and str(cfg.model).startswith("vit"):
            # the int8 eval conv path is ResNet-only; refuse rather
            # than silently run the bf16 teacher under an int8 label
            raise ValueError("teacher_int8 requires a ResNet image "
                             "encoder (ViT unsupported)")
        self.net = STiLNet(
            encoder=cfg.model,
            field_lengths=tuple(int(x) for x in field_lengths),
            num_classes=self.num_classes,
            target=cfg.target,
            projection_dim=int(cfg.projection_dim),
            tabular_embedding_dim=int(cfg.tabular_embedding_dim),
            multimodal_embedding_dim=int(cfg.multimodal_embedding_dim),
            tabular_num_layers=int(cfg.tabular_transformer_num_layers),
            multimodal_num_layers=int(cfg.multimodal_transformer_num_layers),
            embedding_dropout=float(cfg.embedding_dropout or 0.0),
            drop_rate=float(cfg.drop_rate or 0.0),
            tabular_encoder=self.tabular_encoder,
            saint_ff_dropout=(0.8 if cfg.saint_ff_dropout is None
                              else float(cfg.saint_ff_dropout)),
            teacher_int8=bool(getattr(cfg, "teacher_int8", False)),
            dtype=dtype)
        from stil_tta_tpu.train.optim import encoder_freeze_fn
        freeze = encoder_freeze_fn if (
            cfg.finetune_strategy == "frozen" and cfg.checkpoint) else None
        self.tx = build_optimizer(float(cfg.lr_eval),
                                  float(cfg.weight_decay_eval or 0.0),
                                  freeze_fn=freeze,
                                  mu_dtype=cfg.adam_mu_dtype)
        target = cfg.target
        img_size = int(cfg.img_size)
        self.aug_train = contrastive_pipeline(
            img_size, target, float(cfg.crop_scale_lower or 0.08))
        self.aug_eval = default_pipeline(img_size, target)
        self.use_ema = bool(cfg.use_ema)
        self.eman = bool(cfg.eman)

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_image, sample_tabular) -> STiLState:
        pdim = int(self.cfg.projection_dim)
        c = self.num_classes
        use_da = bool(self.cfg.DA)
        use_ema = self.use_ema

        # one jitted program: init + EMA copies + every buffer — a single
        # device dispatch instead of hundreds (the axon tunnel has high
        # per-call latency, so un-jitted init costs minutes)
        def make(rng):
            variables = self.net.init(
                {"params": rng, "dropout": rng}, sample_image,
                sample_tabular, train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
            ema_p = copy(params["backbone"]) if use_ema else None
            ema_bs = copy(batch_stats.get("backbone", {})) \
                if use_ema else None
            da = DAState.create(c) if use_da else None
            return STiLState(
                params=params, batch_stats=batch_stats,
                opt_state=self.tx.init(params),
                ema_params=ema_p, ema_batch_stats=ema_bs,
                rng=rng, step=jnp.zeros((), jnp.int32),
                prototypes=jnp.zeros((c, pdim), jnp.float32),
                prototypes_sum=jnp.zeros((c, pdim), jnp.float32),
                prototypes_count=jnp.zeros((c, 1), jnp.float32),
                da=da,
                acc_train=accuracy_init(), acc_train_u=accuracy_init(),
                auc_train=auroc_init(2) if c == 2 else None,
                auc_train_u=auroc_init(2) if c == 2 else None,
                log_sums={k: jnp.zeros((), jnp.float32)
                          for k in LOG_KEYS},
                log_count=jnp.zeros((), jnp.float32),
            )

        return jax.jit(make)(rng)

    # ------------------------------------------------------------------
    def _views(self, rng, imgs_l, tabs_l, imgs_u, tabs_u, marg_l, marg_u):
        """Augmented image view + corrupted tabular view per stream
        (``ContrastiveImagingAndTabularDataset.__getitem__``: view[1] is
        transformed w.p. augmentation_rate; tabular view[1] corrupted at
        corruption_rate)."""
        cfg = self.cfg
        k = jax.random.split(rng, 4)
        rate = float(cfg.augmentation_rate)
        crate = float(cfg.corruption_rate)
        img_l = self.aug_train(k[0], imgs_l, apply_rate=rate)
        img_u = self.aug_train(k[1], imgs_u, apply_rate=rate)
        tab_l = corrupt_tabular(k[2], tabs_l, marg_l, crate)
        tab_u = corrupt_tabular(k[3], tabs_u, marg_u, crate)
        return img_l, tab_l, img_u, tab_u

    # ------------------------------------------------------------------
    def make_train_step(self):
        cfg = self.cfg
        net = self.net
        tx = self.tx
        c = self.num_classes
        alpha, beta, gamma = float(cfg.alpha), float(cfg.beta), float(cfg.gamma)
        rate_pt, rate_uce = float(cfg.rate_pt), float(cfg.rate_uce)
        th1, temp = float(cfg.th1), float(cfg.temperature)
        lam0 = float(cfg.lambda_0)
        rate_pseudo = float(cfg.rate_pseudo)
        start_epoch = int(cfg.start_epoch)
        repeat_ratio = float(cfg.repeat_ratio or 1.0)
        momentum = float(cfg.ema_momentum)
        use_ema, eman, use_da = self.use_ema, self.eman, bool(cfg.DA)
        binary = c == 2
        m_micro = int(cfg.micro_batches or 1)
        m_unroll = max(1, min(int(cfg.micro_unroll or 1), m_micro))

        def cal_prototypes(label, feat):
            """``STiLModel.py:199-226``; labeled sums scaled 1/repeat."""
            max_prob = jnp.max(label, axis=1)
            conf = (max_prob >= th1).astype(jnp.float32)[:, None]
            hard = jax.nn.one_hot(jnp.argmax(label, axis=1), c) * conf
            return hard.T @ feat, jnp.sum(hard, axis=0)[:, None]

        def derive_targets(tout, da_state, prototypes, k_case3, b_l, y_l,
                           epoch):
            """CGPL cases + PGLS blending from (stop-gradient) teacher
            outputs (``STiLModel.py:262-321``). With use_ema=False the
            'teacher' outputs are the student's own train-mode forward
            (``STiLModel.py:256-257``), so this runs inside loss_fn."""
            f = lambda m: m.astype(jnp.float32)
            feat_m_le = tout["feat_m"][:b_l]
            feat_m_ue = tout["feat_m"][b_l:]
            yh_m_ue = tout["out_m"][b_l:]
            yh_i_ue = tout["out_i"][b_l:]
            yh_t_ue = tout["out_t"][b_l:]
            b_u = yh_m_ue.shape[0]

            # ---- CGPL case identification (:262-274)
            top_m = jnp.argmax(yh_m_ue, axis=1)
            top_i = jnp.argmax(yh_i_ue, axis=1)
            top_t = jnp.argmax(yh_t_ue, axis=1)
            case1 = (top_m == top_i) & (top_m == top_t)
            case2_i = (top_m == top_i) & (top_m != top_t)
            case2_t = (top_m == top_t) & (top_m != top_i)
            case3 = ~(case1 | case2_i | case2_t)
            pl1 = sharpen((yh_m_ue + yh_i_ue + yh_t_ue) / 3.0, 1.0)
            pl2i = sharpen((yh_m_ue + yh_i_ue) / 2.0, 1.0)
            pl2t = sharpen((yh_m_ue + yh_t_ue) / 2.0, 1.0)
            pl3 = sharpen(yh_m_ue, 1.0)
            pseudo_orig = (f(case1)[:, None] * pl1
                           + f(case2_i)[:, None] * pl2i
                           + f(case2_t)[:, None] * pl2t
                           + f(case3)[:, None] * pl3)
            if use_da:
                da, prediction = distribution_alignment(
                    da_state, jax.nn.softmax(yh_m_ue, axis=1))
            else:
                da, prediction = da_state, sharpen(yh_m_ue, 1.0)

            # ---- PGLS blending (:291-303)
            teacher_probs = jax.nn.softmax(
                (feat_m_ue @ prototypes.T) / temp, axis=1)
            pseudo_label = (rate_pseudo * pseudo_orig
                            + (1 - rate_pseudo) * teacher_probs)
            prediction = (rate_pseudo * prediction
                          + (1 - rate_pseudo) * teacher_probs)
            mask1 = f(jnp.max(prediction, axis=1) >= th1)
            mask_rand = f(jax.random.uniform(k_case3, (b_u,)) >= 0.5)

            # prediction participates in prototype/PT targets only after
            # start_epoch (:317-321)
            use_pseudo = f(epoch > start_epoch)
            prediction_gated = prediction * use_pseudo
            pseudo_label_all = jnp.concatenate(
                [jax.nn.one_hot(y_l, c, dtype=jnp.float32),
                 prediction_gated], axis=0)
            return {
                "feat_m_le": feat_m_le, "feat_m_ue": feat_m_ue,
                "case1": case1, "case2_i": case2_i,
                "case2_t": case2_t, "case3": case3,
                "pseudo_label": pseudo_label, "mask1": mask1,
                "mask_rand": mask_rand, "use_pseudo": use_pseudo,
                "pseudo_label_all": pseudo_label_all, "da": da,
            }

        def assemble_losses(outs, tg, y_l, b_l, prototypes):
            """The STiL loss graph (``STiLModel.py:284-345``) given the
            student outputs and the derived CGPL/PGLS targets. Shared by
            the single-batch and micro-batched steps — all reductions
            are means over the rows passed in, so a mean of equal-sized
            chunk losses equals the full-batch loss for every
            per-sample-decomposable term."""
            f = lambda m: m.astype(jnp.float32)
            case1, case2_i = tg["case1"], tg["case2_i"]
            case2_t, case3 = tg["case2_t"], tg["case3"]
            mask1, mask_rand = tg["mask1"], tg["mask_rand"]
            pseudo_label = tg["pseudo_label"]
            use_pseudo = tg["use_pseudo"]
            yh_m, yh_i, yh_t = outs["out_m"], outs["out_i"], outs["out_t"]
            loss_ce = (cross_entropy(yh_m[:b_l], y_l)
                       + cross_entropy(yh_i[:b_l], y_l)
                       + cross_entropy(yh_t[:b_l], y_l))
            loss_m_u = jnp.mean(
                soft_cross_entropy(yh_m[b_l:], pseudo_label, "none")
                * mask1 * f(case1))
            loss_i_u = jnp.mean(
                soft_cross_entropy(yh_i[b_l:], pseudo_label, "none")
                * mask1 * (f(case1) + f(case2_t) + f(case3) * mask_rand))
            loss_t_u = jnp.mean(
                soft_cross_entropy(yh_t[b_l:], pseudo_label, "none")
                * mask1 * (f(case1) + f(case2_i)
                           + f(case3) * (1 - mask_rand)))
            loss_itc, _, _ = clip_loss(outs["feat_i"], outs["feat_t"],
                                       temp, lam0)
            club_i, club_i_est = club_losses(outs["mu_i"], outs["x_ai"])
            club_t, club_t_est = club_losses(outs["mu_t"], outs["x_at"])
            loss_pt = prototype_loss(tg["pseudo_label_all"], prototypes,
                                     outs["feat_m"], temp, th1)
            base = (alpha * loss_ce + beta * loss_itc
                    + gamma * (club_i + club_i_est
                               + club_t + club_t_est))
            extra = (rate_pt * loss_pt
                     + rate_uce * (loss_m_u + loss_i_u + loss_t_u))
            total = base + use_pseudo * extra
            logs = {
                "CEloss": loss_ce, "CEloss_unlabelled_m": loss_m_u,
                "CEloss_unlabelled_i": loss_i_u,
                "CEloss_unlabelled_t": loss_t_u,
                "threshold1_ratio": jnp.mean(mask1),
                "case1_ratio": jnp.mean(f(case1)),
                "case2_i_ratio": jnp.mean(f(case2_i)),
                "case2_t_ratio": jnp.mean(f(case2_t)),
                "case3_ratio": jnp.mean(f(case3)),
                "ITCloss": loss_itc,
                "CLUBloss_imaging": club_i,
                "CLUBloss_imaging_est": club_i_est,
                "CLUBloss_tabular": club_t,
                "CLUBloss_tabular_est": club_t_est,
                "PTloss": loss_pt, "loss": total,
            }
            return total, logs

        def step(state: STiLState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            rng, k_views, k_drop, k_case3 = jax.random.split(state.rng, 4)
            bl = gather_batch(cache_l, idx_l)
            bu = gather_batch(cache_u, idx_u)
            y_l, y_u = bl["labels"], bu["labels"]
            b_l, b_u = y_l.shape[0], y_u.shape[0]

            img_l, tab_l, img_u, tab_u = self._views(
                k_views, bl["images"], bl["tabular"], bu["images"],
                bu["tabular"], marginal_table(cache_l), marginal_table(cache_u))
            images = jnp.concatenate([img_l, img_u], axis=0)
            tabs = jnp.concatenate([tab_l, tab_u], axis=0)
            # missing-feature masks (attention masking in the tabular
            # encoder; the reference's missing_tabular mode)
            missing = None
            if "missing" in bl and "missing" in bu:
                missing = jnp.concatenate([bl["missing"], bu["missing"]],
                                          axis=0)

            prototypes = state.prototypes

            # ---- student forward, then EMAN update + teacher forward.
            # Order matches the reference exactly (:240 student fwd,
            # :252 momentum_update_ema, :253 ema.forward_all): the EMAN
            # lerp consumes the student's POST-forward BN running stats.
            # The teacher block lives inside loss_fn under stop_gradient
            # so XLA computes it once and prunes it from the backward —
            # same cost as hoisting it out, but reference-exact ordering.
            def loss_fn(params):
                f = lambda m: m.astype(jnp.float32)
                outs, mut = net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, tabs, train=True, missing_mask=missing,
                    mutable=["batch_stats"], rngs={"dropout": k_drop})
                if use_ema:
                    ema_p, ema_bs = ema_update(
                        state.ema_params, params["backbone"], momentum,
                        eman, state.ema_batch_stats,
                        mut["batch_stats"].get("backbone", {}))
                    ema_p = jax.lax.stop_gradient(ema_p)
                    ema_bs = jax.lax.stop_gradient(ema_bs)
                    t_params = dict(params)
                    t_params["backbone"] = ema_p
                    t_stats = dict(mut["batch_stats"])
                    t_stats["backbone"] = ema_bs
                    tout = net.apply({"params": t_params,
                                      "batch_stats": t_stats},
                                     images, tabs, missing,
                                     method=STiLNet.teacher)
                    tout = jax.lax.stop_gradient(tout)
                else:
                    # no EMA: the reference reuses the student's
                    # train-mode outputs as the teacher
                    # (``STiLModel.py:256-257``)
                    ema_p, ema_bs = state.ema_params, state.ema_batch_stats
                    tout = jax.lax.stop_gradient({
                        "out_m": outs["out_m"], "out_i": outs["out_i"],
                        "out_t": outs["out_t"], "feat_m": outs["feat_m"]})
                tg = derive_targets(tout, state.da, prototypes,
                                    k_case3, b_l, y_l, epoch)
                total, logs = assemble_losses(outs, tg, y_l, b_l,
                                              prototypes)
                return total, (mut["batch_stats"], ema_p, ema_bs,
                               outs["out_m"], logs, tg)

            grads, (new_stats, ema_p, ema_bs, yh_m, logs, tg) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            da = tg["da"]
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            # ---- prototype accumulation (:374-381): teacher features,
            # labeled terms scaled by 1/repeat_ratio
            pseudo_label_all = tg["pseudo_label_all"]
            sum_l, cnt_l = cal_prototypes(pseudo_label_all[:b_l],
                                          tg["feat_m_le"])
            sum_u, cnt_u = cal_prototypes(pseudo_label_all[b_l:],
                                          tg["feat_m_ue"])
            proto_sum = state.prototypes_sum + sum_l / repeat_ratio + sum_u
            proto_cnt = state.prototypes_count + cnt_l / repeat_ratio + cnt_u

            # ---- streaming metrics (:359-362)
            prob_m = jax.nn.softmax(yh_m, axis=1)
            pm_l, pm_u = prob_m[:b_l], prob_m[b_l:]
            if binary:
                pm_l, pm_u = pm_l[:, 1], pm_u[:, 1]
            acc = accuracy_update(state.acc_train, pm_l, y_l)
            acc_u = accuracy_update(state.acc_train_u, pm_u, y_u)
            auc = auroc_update(state.auc_train, pm_l, y_l) \
                if binary else None
            auc_u = auroc_update(state.auc_train_u, pm_u, y_u) \
                if binary else None

            new_logs = {k: state.log_sums[k] + logs[k] for k in LOG_KEYS}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                prototypes_sum=proto_sum, prototypes_count=proto_cnt,
                da=da, acc_train=acc, acc_train_u=acc_u,
                auc_train=auc, auc_train_u=auc_u,
                log_sums=new_logs, log_count=state.log_count + 1.0)

        def step_micro(state: STiLState, cache_l, cache_u, idx_l, idx_u,
                       epoch: jax.Array):
            """Micro-batched train step (``micro_batches: m > 1``): the
            batch is processed as ``m`` sequential chunks of B/m with
            gradients accumulated and ONE Adam + EMAN update per step.

            Why: per-sample FLOPs and HBM bytes are batch-invariant, but
            the v5e runs the identical step ~7% faster per sample at
            B=128 than at B=512 (docs/BENCHMARKS.md batch curve) — the
            4x-smaller saved-activation working set schedules better.
            Chunking recovers that efficiency at the reference's
            effective batch size.

            Documented divergences from the reference's single-batch
            semantics (all bounded by the ±0.3% accuracy gate,
            docs/BENCHMARKS.md round-4 'fast numerics profile'):
            - BN batch statistics per chunk ("ghost batch norm", B/m
              effective stat batch; running stats lerped m times/step),
            - ITC (CLIP) + CLUB in-batch negatives drawn from the chunk,
            - the EMAN lerp of BN *running stats* consumes the pre-step
              values (the reference lerps post-forward ones; the param
              lerp is identical — the optimizer hasn't stepped yet),
            - DA: each chunk aligns against the queue with its own chunk
              mean in the new slot; the committed slot is the full-batch
              mean (mean of chunk means), so the cross-step DA state
              matches the reference's form exactly.
            Everything else — CGPL case routing, PGLS blending,
            prototype sums, labeled CE, metrics, the Adam update — is
            per-sample-decomposable and therefore exact.
            """
            rng, k_views, k_drop, k_case3 = jax.random.split(state.rng, 4)
            prototypes = state.prototypes
            params = state.params

            if use_ema:
                ema_p, ema_bs = ema_update(
                    state.ema_params, params["backbone"], momentum, eman,
                    state.ema_batch_stats,
                    state.batch_stats.get("backbone", {}))
                ema_p = jax.lax.stop_gradient(ema_p)
                ema_bs = jax.lax.stop_gradient(ema_bs)
            else:
                ema_p, ema_bs = state.ema_params, state.ema_batch_stats

            b_l, b_u = idx_l.shape[0], idx_u.shape[0]
            assert b_l % m_micro == 0 and b_u % m_micro == 0, (
                f"micro_batches={m_micro} must divide labeled ({b_l}) and "
                f"unlabeled ({b_u}) batch sizes")
            il = idx_l.reshape(m_micro, b_l // m_micro)
            iu = idx_u.reshape(m_micro, b_u // m_micro)
            blc = b_l // m_micro
            kv = jax.random.split(k_views, m_micro)
            kd = jax.random.split(k_drop, m_micro)
            kc = jax.random.split(k_case3, m_micro)
            marg_l = marginal_table(cache_l)
            marg_u = marginal_table(cache_u)

            def body(carry, xs):
                (bstats, gacc, da_acc, psum, pcnt, acc, acc_u, auc,
                 auc_u, lacc) = carry
                il_c, iu_c, kv_c, kd_c, kc_c = xs
                bl = gather_batch(cache_l, il_c)
                bu = gather_batch(cache_u, iu_c)
                y_l, y_u = bl["labels"], bu["labels"]
                img_l, tab_l, img_u, tab_u = self._views(
                    kv_c, bl["images"], bl["tabular"], bu["images"],
                    bu["tabular"], marg_l, marg_u)
                images = jnp.concatenate([img_l, img_u], axis=0)
                tabs = jnp.concatenate([tab_l, tab_u], axis=0)
                missing = None
                if "missing" in bl and "missing" in bu:
                    missing = jnp.concatenate(
                        [bl["missing"], bu["missing"]], axis=0)

                def loss_fn(p):
                    outs, mut = net.apply(
                        {"params": p, "batch_stats": bstats},
                        images, tabs, train=True, missing_mask=missing,
                        mutable=["batch_stats"], rngs={"dropout": kd_c})
                    if use_ema:
                        t_params = dict(p)
                        t_params["backbone"] = ema_p
                        t_stats = dict(bstats)
                        t_stats["backbone"] = ema_bs
                        tout = net.apply({"params": t_params,
                                          "batch_stats": t_stats},
                                         images, tabs, missing,
                                         method=STiLNet.teacher)
                        tout = jax.lax.stop_gradient(tout)
                    else:
                        tout = jax.lax.stop_gradient({
                            "out_m": outs["out_m"], "out_i": outs["out_i"],
                            "out_t": outs["out_t"],
                            "feat_m": outs["feat_m"]})
                    tg = derive_targets(tout, state.da, prototypes,
                                        kc_c, blc, y_l, epoch)
                    total, logs = assemble_losses(outs, tg, y_l, blc,
                                                  prototypes)
                    return total, (mut["batch_stats"], outs["out_m"],
                                   logs, tg)

                grads, (new_bstats, yh_m, logs, tg) = jax.grad(
                    loss_fn, has_aux=True)(params)
                gacc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), gacc, grads)
                if use_da:
                    # the chunk's batch-mean sits in the slot the chunk's
                    # alignment wrote (state.da.ptr is fixed this step)
                    da_acc = da_acc + tg["da"].queue[state.da.ptr]
                pseudo_label_all = tg["pseudo_label_all"]
                sum_l, cnt_l = cal_prototypes(pseudo_label_all[:blc],
                                              tg["feat_m_le"])
                sum_u, cnt_u = cal_prototypes(pseudo_label_all[blc:],
                                              tg["feat_m_ue"])
                psum = psum + sum_l / repeat_ratio + sum_u
                pcnt = pcnt + cnt_l / repeat_ratio + cnt_u
                prob_m = jax.nn.softmax(yh_m, axis=1)
                pm_l, pm_u = prob_m[:blc], prob_m[blc:]
                if binary:
                    pm_l, pm_u = pm_l[:, 1], pm_u[:, 1]
                acc = accuracy_update(acc, pm_l, y_l)
                acc_u = accuracy_update(acc_u, pm_u, y_u)
                if binary:
                    auc = auroc_update(auc, pm_l, y_l)
                    auc_u = auroc_update(auc_u, pm_u, y_u)
                lacc = {k: lacc[k] + logs[k] for k in LOG_KEYS}
                return (new_bstats, gacc, da_acc, psum, pcnt, acc,
                        acc_u, auc, auc_u, lacc), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            pdim = prototypes.shape[1]
            carry0 = (
                state.batch_stats, zero_g,
                jnp.zeros((c,), jnp.float32),
                jnp.zeros((c, pdim), jnp.float32),
                jnp.zeros((c, 1), jnp.float32),
                state.acc_train, state.acc_train_u,
                state.auc_train, state.auc_train_u,
                {k: jnp.zeros((), jnp.float32) for k in LOG_KEYS})
            (new_stats, gacc, da_acc, psum, pcnt, acc, acc_u, auc,
             auc_u, lacc), _ = jax.lax.scan(
                body, carry0, (il, iu, kv, kd, kc), unroll=m_unroll)

            grads = jax.tree_util.tree_map(lambda g: g / m_micro, gacc)
            updates, new_opt = tx.update(grads, state.opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)
            if use_da:
                queue = state.da.queue.at[state.da.ptr].set(
                    da_acc / m_micro)
                da = DAState(queue,
                             (state.da.ptr + 1) % state.da.queue.shape[0])
            else:
                da = state.da
            new_logs = {k: state.log_sums[k] + lacc[k] / m_micro
                        for k in LOG_KEYS}
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema_p,
                ema_batch_stats=ema_bs, rng=rng, step=state.step + 1,
                prototypes_sum=state.prototypes_sum + psum,
                prototypes_count=state.prototypes_count + pcnt,
                da=da, acc_train=acc, acc_train_u=acc_u,
                auc_train=auc, auc_train_u=auc_u,
                log_sums=new_logs, log_count=state.log_count + 1.0)

        return jax.jit(step if m_micro == 1 else step_micro,
                       donate_argnums=(0,))

    # ------------------------------------------------------------------
    def epoch_end(self, state: STiLState):
        """Prototype normalisation (``STiLModel.py:408-415``); the
        reference asserts every class received at least one confident
        sample per epoch. ``strict_prototypes: false`` relaxes this to
        keep the previous prototype for empty classes (useful for small
        epochs; the assert semantics stay the default)."""
        count = np.asarray(state.prototypes_count)
        strict = self.cfg.strict_prototypes
        if strict is None or strict:
            assert (count >= 1).all(), (
                f"classes with no prototype mass this epoch: "
                f"{np.where(count[:, 0] < 1)[0].tolist()}")
            protos = jnp.asarray(state.prototypes_sum) / jnp.asarray(count)
        else:
            seen = count >= 1
            protos = jnp.where(
                jnp.asarray(seen),
                jnp.asarray(state.prototypes_sum)
                / jnp.clip(jnp.asarray(count), 1.0),
                state.prototypes)
        logs = {k: float(v) / max(float(state.log_count), 1.0)
                for k, v in state.log_sums.items()}
        logs["eval.train.acc"] = float(state.acc_train.correct
                                       / np.maximum(state.acc_train.total, 1))
        logs["eval.train_unlabelled.acc"] = float(
            state.acc_train_u.correct / np.maximum(state.acc_train_u.total, 1))
        if state.auc_train is not None:
            logs["eval.train.auc"] = float(auroc_compute(state.auc_train))
            logs["eval.train_unlabelled.auc"] = float(
                auroc_compute(state.auc_train_u))
        c = state.prototypes.shape[0]
        pdim = state.prototypes.shape[1]
        state = dataclasses.replace(
            state, prototypes=protos,
            prototypes_sum=jnp.zeros((c, pdim), jnp.float32),
            prototypes_count=jnp.zeros((c, 1), jnp.float32),
            acc_train=accuracy_init(), acc_train_u=accuracy_init(),
            auc_train=auroc_init(2) if state.auc_train is not None
            else None,
            auc_train_u=auroc_init(2) if state.auc_train is not None
            else None,
            log_sums={k: jnp.zeros((), jnp.float32) for k in LOG_KEYS},
            log_count=jnp.zeros((), jnp.float32))
        return state, logs

    # ------------------------------------------------------------------
    def make_eval_step(self):
        """Validation forward (``STiLModel.py:424-474``): resize-only
        images, clean tabular, multimodal/imaging/tabular heads."""
        net = self.net
        aug = self.aug_eval

        temp = float(self.cfg.temperature)
        lam0 = float(self.cfg.lambda_0)

        def step(params, batch_stats, cache, idx, pad_w=None):
            batch = gather_batch(cache, idx)
            imgs = aug(jax.random.key(0), batch["images"])  # resize only
            outs = net.apply({"params": params, "batch_stats": batch_stats},
                             imgs, batch["tabular"], train=False,
                             missing_mask=batch.get("missing"))
            # pad weights: the final val batch is padded to static shape;
            # the reference's loader isn't, so every reduction below
            # excludes pad rows to compute what the smaller batch would
            w = (jnp.ones((idx.shape[0],), jnp.float32) if pad_w is None
                 else pad_w.astype(jnp.float32))
            denom = jnp.clip(jnp.sum(w), 1.0)
            # val losses (``STiLModel.py:434-455``)
            loss_itc, itc_logits, itc_labels = clip_loss(
                outs["feat_i"], outs["feat_t"], temp, lam0, row_weights=w)
            # embedding retrieval accuracy (``STiLModel.py:551-555``:
            # multimodal.val.top1/top5 on the ITC similarity matrix;
            # pad columns are -1e9 in itc_logits so never retrieved)
            ranks = jnp.argsort(-itc_logits, axis=1)
            top1 = jnp.sum((ranks[:, 0] == itc_labels)
                           .astype(jnp.float32) * w) / denom
            top5 = jnp.sum(jnp.any(
                ranks[:, :5] == itc_labels[:, None], axis=1)
                .astype(jnp.float32) * w) / denom
            loss_ce = jnp.sum(cross_entropy(outs["out_m"], batch["labels"],
                                            "none") * w) / denom
            club_i, club_i_est = club_losses(outs["mu_i"], outs["x_ai"],
                                             weights=w)
            club_t, club_t_est = club_losses(outs["mu_t"], outs["x_at"],
                                             weights=w)
            return {
                "prob_m": jax.nn.softmax(outs["out_m"], axis=1),
                "prob_i": jax.nn.softmax(outs["out_i"], axis=1),
                "prob_t": jax.nn.softmax(outs["out_t"], axis=1),
                "labels": batch["labels"],
                "losses": {"ITCloss": loss_itc, "CEloss": loss_ce,
                           "CLUBloss_imaging": club_i,
                           "CLUBloss_imaging_est": club_i_est,
                           "CLUBloss_tabular": club_t,
                           "CLUBloss_tabular_est": club_t_est,
                           "top1": top1, "top5": top5},
            }

        return jax.jit(step)


class STiL_SAINT(STiL):
    """STiL with the SAINT tabular encoder
    (``/root/reference/models/Disentangle/STiLModel_SAINT.py`` — logic
    identical to STiL per SURVEY.md §2.5; backbone swap only)."""

    name = "STiL_SAINT"
    tabular_encoder = "saint"
