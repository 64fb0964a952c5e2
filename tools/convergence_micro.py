#!/usr/bin/env python
"""Convergence-parity gate for the micro-batched train step.

The micro_batches=m fast profile changes train-step numerics within the
north star's ±0.3% accuracy framing (ghost BN, chunked ITC/CLUB
negatives — algorithms/stil.py step_micro). This tool is the gate: it
trains the SAME synthetic STiL recipe with micro_batches=1 (exact
reference semantics) and micro_batches=m over several seeds, on the
same hardware, and reports final + best validation accuracy per run.

Pass criterion (docs/BENCHMARKS.md round-4): the seed-mean best-val
accuracies of the two modes overlap within one pooled seed-std, i.e.
the micro profile is indistinguishable from exact semantics at this
problem's noise floor (and must not sit below -0.3pt of the exact
mean).

Usage:
    python tools/convergence_micro.py [--micro 4] [--epochs 30]
        [--seeds 2022 2023 2024] [--out /tmp/convergence_micro.json]

Each run is a full train/evaluate loop through the production driver
(train/evaluate.py), not a bench harness.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(micro: int, seed: int, epochs: int,
            fast_overrides=(), config="config_dvm_STiL") -> dict:
    """One driver run. ``fast_overrides`` (e.g.
    ``["teacher_int8=true", "adam_mu_dtype=bfloat16"]``) are applied to
    the FAST arm only (micro > 1), so the gate compares the full fast
    profile against exact reference semantics. ``config`` selects the
    recipe (any top-level config; the driver wires family-specific
    state like the SimMatch bank itself)."""
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.train.evaluate import evaluate

    extra = list(fast_overrides) if micro > 1 else []
    cfg = load_config(config, overrides=extra + [
        "dataset=synthetic_dvm", "models=resnet50",
        # reference DVM training shape: batch 512 = 64 l + 448 u,
        # 128x128; synthetic data scaled to 8 steps/epoch
        "batch_size=512", "unlabelled_ratio=7", "img_size=128",
        "synthetic_image_size=128",
        "synthetic_labelled=512", "synthetic_unlabelled=3584",
        "synthetic_val=512", "synthetic_test=512",
        f"max_epochs={epochs}", "start_epoch=2", "num_classes=8",
        f"seed={seed}", f"micro_batches={micro}",
        "tta=false", "strict_prototypes=false", "test_and_eval=false",
        "save_checkpoints=false", "enable_progress_bar=false",
        f"logdir=/tmp/conv_micro_{config}_{micro}_{seed}",
    ])
    res = evaluate(cfg)
    return {"micro": micro, "seed": seed, "config": config,
            "fast_overrides": extra, **{
                k: float(v) for k, v in res.items()
                if isinstance(v, (int, float))}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[2022, 2023, 2024])
    ap.add_argument("--fast-overrides", nargs="*", default=[],
                    help="extra config overrides applied to the fast "
                         "arm only, e.g. teacher_int8=true "
                         "adam_mu_dtype=bfloat16")
    ap.add_argument("--config", default="config_dvm_STiL",
                    help="recipe to gate (e.g. config_dvm_MultiSimMatch)")
    ap.add_argument("--out", default="/tmp/convergence_micro.json")
    args = ap.parse_args()
    if args.fast_overrides and args.micro <= 1:
        # run_one applies fast overrides to the micro>1 arm only; with
        # --micro 1 both arms would be identical and the gate would
        # trivially PASS without testing anything
        ap.error("--fast-overrides requires --micro > 1 (the overrides "
                 "apply to the fast arm only)")

    import numpy as np

    runs = []
    for seed in args.seeds:
        for m in (1, args.micro):
            r = run_one(m, seed, args.epochs, args.fast_overrides,
                        args.config)
            print(json.dumps(r), flush=True)
            runs.append(r)

    def stats(m):
        vals = [r["best_val"] for r in runs if r["micro"] == m]
        return float(np.mean(vals)), float(np.std(vals)), vals

    m1, s1, v1 = stats(1)
    mm, sm, vm = stats(args.micro)
    pooled = max(float(np.sqrt((s1 ** 2 + sm ** 2) / 2)), 1e-9)
    verdict = {
        "exact_mean": m1, "exact_std": s1, "exact_vals": v1,
        "micro_mean": mm, "micro_std": sm, "micro_vals": vm,
        "micro": args.micro, "epochs": args.epochs,
        "config": args.config,
        "fast_overrides": args.fast_overrides,
        "delta": mm - m1, "pooled_std": pooled,
        "pass": bool((mm - m1) >= -max(pooled, 0.003)),
    }
    print(json.dumps(verdict, indent=2))
    with open(args.out, "w") as f:
        json.dump({"runs": runs, "verdict": verdict}, f, indent=2)


if __name__ == "__main__":
    main()
