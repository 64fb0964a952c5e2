"""Tabular-only supervised evaluation.

The reference ships ``eval_datatype: tabular`` plumbing
(``TabularDataset``: marginal-distribution corruption augment, one-hot
option — ``datasets/TabularDataset.py:11-107``; loader branch
``trainers/evaluate.py:29-36``) but the path is unusable: the test
driver has a stray ``raise`` (``trainers/test.py:42``) and every
algorithm's forward expects an image. This implements the working
equivalent: the TIP tabular transformer + CLS linear head, trained
supervised with corruption augmentation at ``eval_train_augment_rate``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.algorithms.match_common import MatchBase, MatchState
from stil_tta_tpu.data.corrupt import corrupt_tabular
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.losses import cross_entropy


class TabularNet(nn.Module):
    field_lengths: Tuple[int, ...]
    num_classes: int
    tabular_embedding_dim: int = 512
    num_layers: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, tabular, train: bool = False):
        del image
        from stil_tta_tpu.models.tabular_transformer import (
            TabularTransformerEncoder, split_field_lengths)
        cat, con = split_field_lengths(self.field_lengths)
        tokens = TabularTransformerEncoder(
            cat_lengths=cat, con_lengths=con,
            embedding_dim=self.tabular_embedding_dim,
            num_layers=self.num_layers, dtype=self.dtype,
            name="encoder_tabular")(tabular, deterministic=not train)
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                          name="classifier")(
            tokens[:, 0, :].astype(jnp.float32))
        return logits


class TabularEval(MatchBase):
    name = "TabularEval"
    LOG_KEYS = ("loss",)

    def __init__(self, cfg, field_lengths, dtype=jnp.bfloat16):
        super().__init__(cfg, field_lengths, dtype=dtype)
        self.net = TabularNet(
            field_lengths=tuple(int(x) for x in field_lengths),
            num_classes=self.num_classes,
            tabular_embedding_dim=int(cfg.tabular_embedding_dim),
            num_layers=int(cfg.tabular_transformer_num_layers),
            dtype=dtype)

    def make_train_step(self):
        cfg = self.cfg
        rate = float(cfg.eval_train_augment_rate)
        crate = float(cfg.corruption_rate)
        binary = self.num_classes == 2

        def step(state: MatchState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            del cache_u, idx_u
            rng, kc, kg, kd = jax.random.split(state.rng, 4)
            bl = gather_batch(cache_l, idx_l)
            y = bl["labels"]
            # corrupt each row with prob eval_train_augment_rate
            # (``TabularDataset.py:63-78``: train-time marginal corruption)
            corrupted = corrupt_tabular(kc, bl["tabular"],
                                        marginal_table(cache_l), crate)
            gate = jax.random.uniform(kg, (y.shape[0], 1)) < rate
            tabs = jnp.where(gate, corrupted, bl["tabular"])

            def loss_fn(params):
                logits = self.net.apply(
                    {"params": params}, None, tabs, train=True,
                    rngs={"dropout": kd})
                return cross_entropy(logits, y), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)
            prob = jax.nn.softmax(logits, axis=1)
            from stil_tta_tpu.ops.metrics import accuracy_update
            acc = accuracy_update(state.acc_train,
                                  prob[:, 1] if binary else prob, y)
            logs = {"loss": state.log_sums["loss"] + loss}
            return dataclasses.replace(
                state, params=new_params, opt_state=new_opt, rng=rng,
                step=state.step + 1, acc_train=acc, log_sums=logs,
                log_count=state.log_count + 1.0)

        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self):
        net = self.net

        def step(params, batch_stats, cache, idx, pad_w=None):
            del batch_stats, pad_w
            batch = gather_batch(cache, idx)
            logits = net.apply({"params": params}, None, batch["tabular"],
                               train=False)
            return {"prob_m": jax.nn.softmax(logits, axis=1),
                    "labels": batch["labels"]}

        return jax.jit(step)
