"""Supervised multimodal baseline (the 'comparison' strategy /
minimum end-to-end slice).

The reference's ``strategy: comparison`` path builds a single labeled
loader (``trainers/evaluate.py:116-127``) over
``ImagingAndTabularDataset`` and trains with plain supervision — the
SURVEY.md §7.4 "minimum end-to-end slice": DisCo backbone + CE on the
three heads + Adam/warmup-cosine + eval loop. Here it doubles as the
supervised finetune baseline and the simplest training path for
debugging the stack. The unlabeled stream is ignored.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from stil_tta_tpu.algorithms.stil import STiL, STiLState
from stil_tta_tpu.data.loader import gather_batch, marginal_table
from stil_tta_tpu.losses import cross_entropy


class Supervised(STiL):
    name = "Supervised"

    def make_train_step(self):
        cfg = self.cfg
        binary = self.num_classes == 2

        def step(state: STiLState, cache_l, cache_u, idx_l, idx_u,
                 epoch: jax.Array):
            del cache_u, idx_u
            rng, k_views, k_drop = jax.random.split(state.rng, 3)
            bl = gather_batch(cache_l, idx_l)
            y_l = bl["labels"]
            k1, k2 = jax.random.split(k_views)
            imgs = self.aug_train(k1, bl["images"],
                                  apply_rate=float(cfg.augmentation_rate))
            from stil_tta_tpu.data.corrupt import corrupt_tabular
            tabs = corrupt_tabular(k2, bl["tabular"], marginal_table(cache_l),
                                   float(cfg.corruption_rate))

            def loss_fn(params):
                outs, mut = self.net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs, tabs, train=True, mutable=["batch_stats"],
                    rngs={"dropout": k_drop})
                loss = (cross_entropy(outs["out_m"], y_l)
                        + cross_entropy(outs["out_i"], y_l)
                        + cross_entropy(outs["out_t"], y_l))
                return loss, (mut["batch_stats"], outs["out_m"])

            (loss, (new_stats, out_m)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)

            prob = jax.nn.softmax(out_m, axis=1)
            if binary:
                prob_acc = prob[:, 1]
            else:
                prob_acc = prob
            from stil_tta_tpu.ops.metrics import accuracy_update
            acc = accuracy_update(state.acc_train, prob_acc, y_l)
            logs = dict(state.log_sums)
            logs["CEloss"] = state.log_sums["CEloss"] + loss
            logs["loss"] = state.log_sums["loss"] + loss
            # keep prototype mass trivially satisfied (unused here)
            proto_cnt = state.prototypes_count + 1.0
            return dataclasses.replace(
                state, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, rng=rng, step=state.step + 1,
                prototypes_count=proto_cnt, acc_train=acc,
                log_sums=logs, log_count=state.log_count + 1.0)

        return jax.jit(step, donate_argnums=(0,))
