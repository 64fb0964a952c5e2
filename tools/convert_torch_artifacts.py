#!/usr/bin/env python
"""Convert reference-format dataset artifacts to the native format.

The reference's artifact contract (SURVEY.md §2.2,
``configs/dataset/dvm_all_server_reordered_SemiPseudo_0.01.yaml:23-60``):
image-path lists ``*.pt`` (each entry points at a per-image ``.npy`` /
jpg), labels ``*.pt``, tabular ``*.csv`` (categorical columns first,
label-encoded), ``field_lengths_tabular.pt``, and boolean
``labelled_identification_*.pt`` masks.

This packs one split into a single directory (images.npy / tabular.npy /
labels.npy / labelled.npy / spec.json) that
``stil_tta_tpu.data.source.ArraySource.load`` memmaps — the layout the
HBM DeviceCache stages in one DMA.

Usage:
  python tools/convert_torch_artifacts.py \
      --images train_paths.pt --labels labels_train.pt \
      --tabular features_train.csv --field-lengths field_lengths.pt \
      [--labelled labelled_identification_train.pt | --labelled-all |
       --unlabelled-all] \
      [--size 128] [--target dvm] --out /data/native/train_labelled
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import csv
import json
from pathlib import Path

import numpy as np


def load_pt(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "numpy"):
        return obj.numpy()
    return obj


def load_image(entry, size):
    p = str(entry)
    if p.endswith(".pt") or p.endswith(".npy"):
        arr = np.load(p[:-3] + ".npy" if p.endswith(".pt") else p,
                      allow_pickle=True)
    else:
        from PIL import Image
        arr = np.asarray(Image.open(p).convert("RGB"))
    if size and arr.shape[0] != size:
        from PIL import Image
        arr = np.asarray(Image.fromarray(arr.astype(np.uint8))
                         .resize((size, size), Image.BILINEAR))
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--labels", required=True)
    ap.add_argument("--tabular", required=True)
    ap.add_argument("--field-lengths", required=True)
    ap.add_argument("--labelled", default=None)
    ap.add_argument("--labelled-all", action="store_true")
    ap.add_argument("--unlabelled-all", action="store_true")
    ap.add_argument("--size", type=int, default=None,
                    help="resize stored images (default: keep native)")
    ap.add_argument("--target", default="dvm")
    ap.add_argument("--num-classes", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    paths = load_pt(args.images)
    labels = np.asarray(load_pt(args.labels)).astype(np.int64)
    field_lengths = [int(x) for x in np.asarray(
        load_pt(args.field_lengths)).tolist()]
    with open(args.tabular) as f:
        tab = np.asarray([[float(v) for v in row]
                          for row in csv.reader(f)], np.float32)
    n = len(labels)
    assert len(paths) == n == len(tab), (len(paths), n, len(tab))

    if args.labelled:
        labelled = np.asarray(load_pt(args.labelled)).astype(bool)
    elif args.unlabelled_all:
        labelled = np.zeros(n, bool)
    else:
        labelled = np.ones(n, bool)

    first = load_image(paths[0], args.size)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    images = np.lib.format.open_memmap(
        out / "images.npy", mode="w+", dtype=first.dtype,
        shape=(n,) + first.shape)
    images[0] = first
    for i in range(1, n):
        images[i] = load_image(paths[i], args.size)
        if i % 5000 == 0:
            print(f"{i}/{n} images", flush=True)
    images.flush()

    np.save(out / "tabular.npy", tab)
    np.save(out / "labels.npy", labels)
    np.save(out / "labelled.npy", labelled)
    with open(out / "spec.json", "w") as f:
        json.dump({
            "field_lengths": field_lengths,
            "num_classes": int(args.num_classes
                               or (int(labels.max()) + 1)),
            "target": args.target,
            "image_shape": list(first.shape),
            "image_dtype": str(first.dtype),
        }, f, indent=2)
    print(f"wrote {n} samples -> {out}")


if __name__ == "__main__":
    main()
