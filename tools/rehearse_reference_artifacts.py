#!/usr/bin/env python
"""End-to-end rehearsal of the REFERENCE artifact surface.

Proves the full reference-format path — not just the native one:

1. writes a reference-format DVM artifact set from synthetic
   class-conditional data: per-image ``.npy`` files, image-path list
   ``*.pt``s, label ``*.pt``s, tabular ``*.csv`` (categorical columns
   first, label-encoded), ``field_lengths_tabular.pt`` and
   ``labelled_identification_*.pt`` masks — the exact contract of
   ``configs/dataset/dvm_all_server_reordered_SemiPseudo_0.01.yaml:23-60``;
2. converts every split with ``tools/convert_torch_artifacts.py``
   (the path a real DVM download takes);
3. trains ``config_dvm_STiL`` on the converted artifacts through the
   real CLI (``run.py ... evaluate=True`` equivalent);
4. scores the test split through the test driver.

Usage (smoke, CPU):
  python tools/rehearse_reference_artifacts.py --root /tmp/rehearsal \
      --n-train 160 --n-eval 32 --img-size 32 --classes 4 --epochs 2

Usage (DVM-scale, TPU — ~70k train images at 128x128):
  python tools/rehearse_reference_artifacts.py --root /data/rehearsal \
      --n-train 70000 --n-eval 5000 --img-size 128 --classes 286 \
      --epochs 3
"""

from __future__ import annotations

import argparse
import csv
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

FIELD_LENGTHS = [20, 10, 5, 3] + [1] * 13   # DVM: 4 categorical + 13 cont.


def write_reference_artifacts(root: Path, n_train: int, n_eval: int,
                              img_size: int, classes: int,
                              label_fraction: float, seed: int = 0):
    """Reference-format artifact tree under ``root/reference``."""
    import torch

    rng = np.random.RandomState(seed)
    ref = root / "reference"
    imgdir = ref / "images"
    imgdir.mkdir(parents=True, exist_ok=True)

    def gen_split(name, n, labelled_frac):
        labels = rng.randint(0, classes, n)
        paths = []
        for i, y in enumerate(labels):
            # class-conditional image: class-colored quadrant + noise
            img = rng.randint(0, 60, (img_size, img_size, 3))
            q = img_size // 2
            img[:q, :q, y % 3] += 40 + (int(y) * 151) % 160
            img[q:, q:, (y // 3) % 3] += 30 + (int(y) * 89) % 120
            p = imgdir / f"{name}_{i}.npy"
            np.save(p, np.clip(img, 0, 255).astype(np.uint8))
            paths.append(str(p))
        # tabular: categorical codes + class-shifted continuous
        cats = np.stack([rng.randint(0, c, n) for c in FIELD_LENGTHS[:4]], 1)
        cons = rng.randn(n, 13) * 0.5 + (labels[:, None] % 7) * 0.35
        tab = np.concatenate([cats, cons], 1).astype(np.float32)

        torch.save(paths, ref / f"image_paths_{name}.pt")
        torch.save([int(v) for v in labels], ref / f"labels_{name}.pt")
        with open(ref / f"dvm_features_{name}.csv", "w", newline="") as f:
            csv.writer(f).writerows(tab.tolist())
        flag = rng.rand(n) < labelled_frac
        torch.save(flag.tolist(),
                   ref / f"labelled_identification_{name}.pt")
        return n

    n_lab = max(int(round(n_train * label_fraction)), classes)
    gen_split(f"train_{label_fraction}", n_lab, 1.0)
    gen_split(f"train_{round(1 - label_fraction, 4)}",
              n_train - n_lab, 0.0)
    gen_split("val", n_eval, 1.0)
    gen_split("test", n_eval, 1.0)
    torch.save([int(x) for x in FIELD_LENGTHS],
               ref / "field_lengths_tabular.pt")
    return ref, n_lab


def convert_all(ref: Path, root: Path, img_size: int, classes: int,
                label_fraction: float):
    native = root / "native"
    lf = label_fraction
    specs = [
        (f"train_{lf}", "train_labelled", "--labelled-all"),
        (f"train_{round(1 - lf, 4)}", "train_unlabelled",
         "--unlabelled-all"),
        ("val", "val", "--labelled-all"),
        ("test", "test", "--labelled-all"),
    ]
    for name, split, flag in specs:
        cmd = [sys.executable, str(REPO / "tools/convert_torch_artifacts.py"),
               "--images", str(ref / f"image_paths_{name}.pt"),
               "--labels", str(ref / f"labels_{name}.pt"),
               "--tabular", str(ref / f"dvm_features_{name}.csv"),
               "--field-lengths", str(ref / "field_lengths_tabular.pt"),
               flag, "--size", str(img_size), "--target", "dvm",
               "--num-classes", str(classes),
               "--out", str(native / split)]
        subprocess.run(cmd, check=True)
    return native


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=160)
    ap.add_argument("--n-eval", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=32)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--label-fraction", type=float, default=0.1)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    root = Path(args.root)
    ref, n_lab = write_reference_artifacts(
        root, args.n_train, args.n_eval, args.img_size, args.classes,
        args.label_fraction)
    print(f"reference artifacts: {ref} ({n_lab} labelled)")
    native = convert_all(ref, root, args.img_size, args.classes,
                         args.label_fraction)
    print(f"native artifacts:    {native}")
    if args.skip_train:
        return 0

    logdir = root / "run"
    overrides = [
        "--config-name", "config_dvm_STiL",
        "dataset=dvm_all_server_reordered",
        f"data_base={native}", "models=resnet18",
        f"num_classes={args.classes}", f"img_size={args.img_size}",
        f"batch_size={args.batch_size}", "unlabelled_ratio=3",
        f"max_epochs={args.epochs}", "start_epoch=0",
        "tabular_embedding_dim=64", "multimodal_embedding_dim=64",
        "tabular_transformer_num_layers=1", "projection_dim=16",
        "tta=false", "strict_prototypes=false", "test_and_eval=true",
        "enable_progress_bar=false", f"logdir={logdir}",
    ]
    sys.path.insert(0, str(REPO))
    import run as run_mod
    rc = run_mod.main(overrides)
    print(f"training rc={rc}; artifacts in {logdir}")

    # test driver over the converted test split with the best ckpt
    rc2 = run_mod.main([
        "--config-name", "config_dvm_STiL",
        "dataset=dvm_all_server_reordered", "test=true", "evaluate=false",
        f"data_base={native}", "models=resnet18",
        f"num_classes={args.classes}", f"img_size={args.img_size}",
        f"batch_size={args.batch_size}",
        "tabular_embedding_dim=64", "multimodal_embedding_dim=64",
        "tabular_transformer_num_layers=1", "projection_dim=16",
        "tta=false", "enable_progress_bar=false",
        f"checkpoint={logdir / 'checkpoint_best_acc'}",
        f"logdir={logdir / 'test'}",
    ])
    print(f"test rc={rc2}")
    results = logdir / "test" / "test_results.csv"
    if results.exists():
        print(results.read_text())
    return rc or rc2


if __name__ == "__main__":
    raise SystemExit(main())
