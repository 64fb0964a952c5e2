"""Inference / test driver (with the TTA hook the reference left TODO).

Parity target: ``/root/reference/trainers/test.py:15-91`` — build the
test split, restore the checkpoint, score the multimodal head
(``STiLModel.py:517-533``), dump ``test_results.csv``. The reference's
``tta: True`` flag is wired to an *unimplemented* hook
(``STiLModel.py:523-524``); here it dispatches to
:mod:`stil_tta_tpu.tta` (Tent-style entropy minimisation + BN
adaptation) before scoring — the fork's missing capability, implemented.

Note: the reference's tabular branch contains a stray unconditional
``raise`` (``test.py:42``, SURVEY.md §6 'bugs to not replicate') — fixed
here by simply working.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.data.datasets import (apply_sweep_truncation,
                                         attach_missing_masks,
                                         load_sources)
from stil_tta_tpu.data.loader import DeviceCache
from stil_tta_tpu.train.checkpoint import restore_checkpoint
from stil_tta_tpu.train.evaluate import run_validation
from stil_tta_tpu.utils.logging import MetricLogger


def test(cfg, logdir: Optional[Path] = None) -> Dict[str, float]:
    logdir = Path(logdir or cfg.logdir or "runs/test")
    logdir.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(logdir, echo=bool(cfg.enable_progress_bar))

    sources = attach_missing_masks(
        apply_sweep_truncation(load_sources(cfg), cfg), cfg)
    src = sources["test"]
    num_classes = int(cfg.num_classes or src.num_classes)
    cfg.num_classes = num_classes
    cfg.repeat_ratio = cfg.repeat_ratio or 1

    algo = get_algorithm(cfg.algorithm_name)(cfg, src.field_lengths)
    rng = jax.random.key(int(cfg.seed or 0))
    sample_img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    sample_tab = jnp.asarray(src.tabular[:2])
    state = algo.init_state(rng, sample_img, sample_tab)
    if cfg.checkpoint:
        ckpt = Path(cfg.checkpoint)
        state = restore_checkpoint(ckpt.parent, state, name=ckpt.name)

    cache = DeviceCache(src).as_dict()

    if cfg.tta:
        from stil_tta_tpu.tta import adapt
        state = adapt(cfg, algo, state, cache)

    eval_step = algo.make_eval_step()
    metrics = run_validation(eval_step, state.params, state.batch_stats,
                             cache, int(cfg.batch_size), num_classes,
                             prefix="test",
                             limit_batches=cfg.limit_test_batches)
    logger.log(metrics, step=0)
    logger.dump_csv("test_results.csv", metrics)
    return metrics
