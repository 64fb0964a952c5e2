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

    # multi-seed sweep: the reference configs carry a `seeds` list
    # (``config_dvm_STiL.yaml:11-16``; the paper reports means over
    # seeds). With run_all_seeds=True each seed gets its own logdir and
    # a summary CSV aggregates mean/std.
    seeds = [int(cfg.seed or 0)]
    if cfg.run_all_seeds and cfg.seeds:
        seeds = [int(s) for s in cfg.seeds]

    all_results = []
    base_logdir = cfg.logdir
    for seed in seeds:
        run_cfg = cfg.copy()
        run_cfg.seed = seed
        run_name = f"{cfg.algorithm_name}_{cfg.dataset_name}_{seed}"
        run_cfg.logdir = (f"{base_logdir}_{seed}" if base_logdir
                          and len(seeds) > 1
                          else base_logdir
                          or str(Path("runs") / run_name))
        if run_cfg.test:
            from stil_tta_tpu.train.test import test
            results = test(run_cfg)
        elif run_cfg.evaluate:
            from stil_tta_tpu.train.evaluate import evaluate
            results = evaluate(run_cfg)
        else:
            raise SystemExit("Set evaluate=True or test=True")
        print({"seed": seed, **results})
        all_results.append(results)

    if len(all_results) > 1:
        import csv
        keys = sorted({k for r in all_results for k in r
                       if isinstance(r.get(k), (int, float))})
        summary = Path(base_logdir or "runs") \
            .with_name((Path(base_logdir or "runs").name)
                       + "_seed_summary.csv")
        with open(summary, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["metric", "mean", "std"] +
                       [f"seed_{s}" for s in seeds])
            for k in keys:
                vals = [float(r[k]) for r in all_results if k in r]
                w.writerow([k, np.mean(vals), np.std(vals)] + vals)
        print(f"seed summary -> {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
