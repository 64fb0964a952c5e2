#!/usr/bin/env python
"""CLI entry point.

Parity target: ``/root/reference/run.py`` —
``python run.py --config-name <cfg> dataset=<ds> evaluate=True ...``:
seeds, resume-from-checkpoint hparam restore (``run.py:48-63``), logdir
creation, dispatch to evaluate/test. W&B is replaced by the offline
JSONL/CSV logger (the reference forces W&B offline anyway,
``run.py:2-3``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from stil_tta_tpu.utils import jax_setup

jax_setup.setup()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default=None, required=False,
                        help="top-level config (reference requires this "
                             "too: its default config file doesn't exist)")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args(argv)
    if args.config_name is None:
        parser.error("--config-name is required")

    from stil_tta_tpu.config import load_config
    cfg = load_config(args.config_name, overrides=args.overrides,
                      config_dir=args.config_dir)

    if cfg.resume_training and cfg.checkpoint:
        # restore the snapshot hparams from the checkpoint's config
        # (``run.py:48-63``), then re-apply the CLI overrides on top
        from stil_tta_tpu.config import Config, parse_overrides
        from stil_tta_tpu.train.checkpoint import load_checkpoint_config
        ckpt = Path(cfg.checkpoint)
        saved_cfg = Config._wrap(
            load_checkpoint_config(ckpt.parent, name=ckpt.name))
        for key, value in parse_overrides(args.overrides):
            saved_cfg.set_dotted(key, value)
        saved_cfg["resume_training"] = True
        saved_cfg["checkpoint"] = cfg.checkpoint
        cfg = saved_cfg

    np.random.seed(int(cfg.seed or 0))

    run_name = f"{cfg.algorithm_name}_{cfg.dataset_name}_{cfg.seed}"
    logdir = cfg.logdir or str(Path("runs") / run_name)
    cfg.logdir = logdir

    if cfg.test:
        from stil_tta_tpu.train.test import test
        results = test(cfg)
    elif cfg.evaluate:
        from stil_tta_tpu.train.evaluate import evaluate
        results = evaluate(cfg)
    else:
        raise SystemExit("Set evaluate=True or test=True")
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
