"""Shared machinery for the FixMatch-family comparison algorithms
(SimMatch / CoMatch / FreeMatch) and the SemiMultimodal pair
(MMatch / Co-Training).

The reference re-implements this scaffolding per algorithm (SURVEY.md
§7.6); here it lives once:

- :class:`ImagingNet` — ResNet + projection head + classifier returning
  (logits, normalized embedding)
  (``/root/reference/models/MatchModel/simmatch_model.py:20-37``; the
  same wrapper is vendored into comatch_model.py and
  freematch_model.py).
- weak/strong view generation: labeled hard-eval augment at
  ``eval_train_augment_rate``; unlabeled weak view = weak aug (+ 10%
  tabular corruption, ``StrongWeakImagingAndTabularDataset.py:79``),
  strong view = strong aug (+ ``corruption_rate`` corruption).
- the common state/metrics/log plumbing and the generic eval step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct
import numpy as np

from stil_tta_tpu.algorithms.base import DAState, TrainState
from stil_tta_tpu.data.augment import (default_pipeline, hard_eval_pipeline,
                                       strong_pipeline, weak_pipeline)
from stil_tta_tpu.data.corrupt import corrupt_tabular
from stil_tta_tpu.losses.common import at_least_f32
from stil_tta_tpu.models.backbones import MatchBackbone
from stil_tta_tpu.models.layers import MLPHead
from stil_tta_tpu.models.resnet import EMBEDDING_DIM, image_encoder
from stil_tta_tpu.ops.metrics import AccuracyState, accuracy_init, \
    accuracy_update
from stil_tta_tpu.train.optim import build_optimizer

WEAK_TAB_CORRUPTION = 0.1


class ImagingNet(nn.Module):
    """ResNet encoder + SimCLR-style head + linear classifier."""

    encoder: str
    num_classes: int
    projection_dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, tabular=None, train: bool = False):
        del tabular
        pooled = image_encoder(self.encoder, dtype=self.dtype)(
            image, train=train)[0]
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                          name="classifier")(at_least_f32(pooled))
        emb = MLPHead(pooled.shape[-1], self.projection_dim,
                      dtype=self.dtype, name="head")(pooled)
        emb = at_least_f32(emb)
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=1, keepdims=True),
                             1e-12)
        return logits, emb


class MatchMultimodalNet(nn.Module):
    """MatchBackbone with the (logits, embedding) contract."""

    encoder: str
    field_lengths: Tuple[int, ...]
    num_classes: int
    projection_dim: int = 128
    tabular_embedding_dim: int = 512
    multimodal_embedding_dim: int = 512
    tabular_num_layers: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, tabular, train: bool = False):
        return MatchBackbone(
            model=self.encoder, field_lengths=self.field_lengths,
            num_classes=self.num_classes,
            projection_dim=self.projection_dim,
            tabular_embedding_dim=self.tabular_embedding_dim,
            multimodal_embedding_dim=self.multimodal_embedding_dim,
            tabular_num_layers=self.tabular_num_layers,
            dtype=self.dtype, name="backbone")(image, tabular, train=train)


@flax.struct.dataclass
class MatchState(TrainState):
    da: Optional[DAState] = None
    extra: Dict[str, jax.Array] = None      # algorithm-specific buffers
    acc_train: AccuracyState = None
    acc_train_u: AccuracyState = None
    log_sums: Dict[str, jax.Array] = None
    log_count: jax.Array = None


class MatchBase:
    """Common construction + eval/epoch plumbing; subclasses provide
    ``LOG_KEYS``, ``extra_state()`` and ``make_train_step()``."""

    LOG_KEYS: Tuple[str, ...] = ("loss",)
    name = "MatchBase"

    def __init__(self, cfg, field_lengths, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.num_classes = int(cfg.num_classes)
        self.multimodal = cfg.eval_datatype in ("imaging_and_tabular",
                                                "multimodal")
        if self.multimodal:
            self.net = MatchMultimodalNet(
                encoder=cfg.model,
                field_lengths=tuple(int(x) for x in field_lengths),
                num_classes=self.num_classes,
                projection_dim=int(cfg.projection_dim),
                tabular_embedding_dim=int(cfg.tabular_embedding_dim),
                multimodal_embedding_dim=int(cfg.multimodal_embedding_dim),
                tabular_num_layers=int(cfg.tabular_transformer_num_layers),
                dtype=dtype)
        else:
            self.net = ImagingNet(
                encoder=cfg.model, num_classes=self.num_classes,
                projection_dim=int(cfg.projection_dim), dtype=dtype)
        from stil_tta_tpu.train.optim import encoder_freeze_fn
        freeze = encoder_freeze_fn if (
            cfg.finetune_strategy == "frozen" and cfg.checkpoint) else None
        self.tx = build_optimizer(float(cfg.lr_eval),
                                  float(cfg.weight_decay_eval or 0.0),
                                  freeze_fn=freeze)
        img_size, target = int(cfg.img_size), cfg.target
        self.aug_labeled = hard_eval_pipeline(img_size, target)
        self.aug_weak = weak_pipeline(img_size, target)
        self.aug_strong = strong_pipeline(img_size, target)
        self.aug_eval = default_pipeline(img_size, target)

    # -- subclass hooks -------------------------------------------------
    def extra_state(self, rng) -> Dict[str, jax.Array]:
        return {}

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_image, sample_tabular) -> MatchState:
        use_da = bool(self.cfg.DA)

        # single jitted program (see STiL.init_state: the axon tunnel
        # has high per-dispatch latency)
        def make(rng):
            variables = self.net.init({"params": rng, "dropout": rng},
                                      sample_image, sample_tabular,
                                      train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
            da = DAState.create(self.num_classes) if use_da else None
            return MatchState(
                params=params, batch_stats=batch_stats,
                opt_state=self.tx.init(params),
                ema_params=copy(params),
                ema_batch_stats=copy(batch_stats),
                rng=rng, step=jnp.zeros((), jnp.int32),
                da=da, extra=self.extra_state(rng),
                acc_train=accuracy_init(), acc_train_u=accuracy_init(),
                log_sums={k: jnp.zeros((), jnp.float32)
                          for k in self.LOG_KEYS},
                log_count=jnp.zeros((), jnp.float32))

        return jax.jit(make)(rng)

    # ------------------------------------------------------------------
    def labeled_views(self, key, images, tabular, marginal):
        """Hard-eval augment at eval_train_augment_rate; tabular
        corruption at corruption_rate (``ImagingAndTabularDataset``)."""
        k1, k2 = jax.random.split(key)
        rate = float(self.cfg.eval_train_augment_rate
                     if not self.multimodal
                     else self.cfg.augmentation_rate)
        imgs = self.aug_labeled(k1, images, apply_rate=rate)
        if self.multimodal:
            tabs = corrupt_tabular(k2, tabular, marginal,
                                   float(self.cfg.corruption_rate))
        else:
            tabs = tabular
        return imgs, tabs

    def weak_strong_views(self, key, images, tabular, marginal,
                          two_strong: bool = False):
        ks = jax.random.split(key, 6)
        img_w = self.aug_weak(ks[0], images)
        img_s = self.aug_strong(ks[1], images)
        img_s2 = self.aug_strong(ks[2], images) if two_strong else None
        if self.multimodal:
            tab_w = corrupt_tabular(ks[3], tabular, marginal,
                                    WEAK_TAB_CORRUPTION)
            tab_s = corrupt_tabular(ks[4], tabular, marginal,
                                    float(self.cfg.corruption_rate))
            tab_s2 = corrupt_tabular(ks[5], tabular, marginal,
                                     float(self.cfg.corruption_rate)) \
                if two_strong else None
        else:
            tab_w = tab_s = tab_s2 = tabular
        return (img_w, tab_w), (img_s, tab_s), (img_s2, tab_s2)

    # ------------------------------------------------------------------
    def apply_student(self, params, batch_stats, images, tabular, rng):
        (logits, emb), mut = self.net.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            tabular, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        return logits, emb, mut["batch_stats"]

    def apply_teacher(self, state: MatchState, images, tabular):
        logits, emb = self.net.apply(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats},
            images, tabular, train=False)
        return jax.lax.stop_gradient(logits), jax.lax.stop_gradient(emb)

    # ------------------------------------------------------------------
    def epoch_end(self, state: MatchState):
        logs = {k: float(v) / max(float(state.log_count), 1.0)
                for k, v in state.log_sums.items()}
        logs["eval.train.acc"] = float(
            state.acc_train.correct / np.maximum(state.acc_train.total, 1))
        logs["eval.train_unlabelled.acc"] = float(
            state.acc_train_u.correct
            / np.maximum(state.acc_train_u.total, 1))
        state = dataclasses.replace(
            state, acc_train=accuracy_init(), acc_train_u=accuracy_init(),
            log_sums={k: jnp.zeros((), jnp.float32)
                      for k in self.LOG_KEYS},
            log_count=jnp.zeros((), jnp.float32))
        return state, logs

    # ------------------------------------------------------------------
    def make_eval_step(self):
        net, aug = self.net, self.aug_eval
        from stil_tta_tpu.data.loader import gather_batch

        def step(params, batch_stats, cache, idx, pad_w=None):
            del pad_w  # pad rows are dropped host-side (no batch losses)
            batch = gather_batch(cache, idx)
            imgs = aug(jax.random.key(0), batch["images"])
            out = net.apply({"params": params, "batch_stats": batch_stats},
                            imgs, batch["tabular"], train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return {"prob_m": jax.nn.softmax(logits, axis=1),
                    "labels": batch["labels"]}

        return jax.jit(step)

    # -- shared metric/log update inside train steps --------------------
    @staticmethod
    def update_logs(state: MatchState, logs: Dict[str, jax.Array],
                    prob_l, y_l, prob_u, y_u, binary: bool):
        if binary:
            prob_l, prob_u = prob_l[:, 1], prob_u[:, 1]
        acc = accuracy_update(state.acc_train, prob_l, y_l)
        acc_u = accuracy_update(state.acc_train_u, prob_u, y_u)
        new_logs = {k: state.log_sums[k] + logs[k] for k in state.log_sums}
        return acc, acc_u, new_logs
