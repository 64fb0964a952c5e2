#!/usr/bin/env python
"""Measure the reference input pipeline's per-worker throughput
(VERDICT r3 #4: replace the 1,200 samples/s "midpoint of an estimate"
A100 comparator with a measurement).

The reference feeds its single GPU from ``num_workers: 10`` CPU
dataloader workers (``configs/config_dvm_STiL.yaml``), each running the
DVM train recipe per sample (``/root/reference/utils/utils.py:46-91``):

    ColorJitter(0.8, 0.8, 0.8) @ p=0.8
    RandomGrayscale(p=0.2)
    GaussianBlur(kernel=29, sigma=(0.1, 2.0)) @ p=0.5
    RandomResizedCrop(128, scale=(0.08, 1.0), ratio=(3/4, 4/3))
    RandomHorizontalFlip(p=0.5)

plus, per ``__getitem__`` (``datasets/
ContrastiveImagingAndTabularDataset.py:177-213``), a second
``default_transform`` pass (Resize to img_size) for the unaugmented
image.

torchvision is not installed in this container, so this tool times a
raw-torch reimplementation of exactly those transforms. That is a fair
proxy: torchvision's tensor-mode transforms ARE compositions of the
same torch ops (lerp/clamp for jitter, a separable 29-tap conv2d for
blur, ``F.interpolate(bilinear, antialias=True)`` for crop-resize) —
the arithmetic per sample is identical, only Python dispatch overhead
differs, and that overhead FAVORS the reference in this comparison.
Single-threaded (one dataloader worker = one core), in-memory uint8
inputs (generous to the reference: no .npy disk read, no tabular
``corrupt()`` dataframe sampling, no collate), scaled by 10 workers
assuming perfect scaling (also generous).

The reference's ``augmentation_speedup: True`` branch swaps torchvision
for albumentations (cv2) — typically 1.5-3x faster per op; the emitted
bracket applies that factor to the measured number rather than
guessing from scratch.

Usage: python tools/measure_baseline_input.py [--n 512] [--img 128]
Prints one JSON line.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import math
import time

import numpy as np
import torch
import torch.nn.functional as F


ALBUMENTATIONS_SPEEDUP = (1.5, 3.0)  # cv2-vs-torchvision bracket
NUM_WORKERS = 10                     # configs/config_dvm_STiL.yaml


def _rgb_to_gray(im):
    # torchvision.transforms.functional.rgb_to_grayscale weights
    w = torch.tensor([0.299, 0.587, 0.114], dtype=im.dtype)
    g = (im * w[:, None, None]).sum(0, keepdim=True)
    return g.expand_as(im).contiguous()


def _blend(a, b, ratio):
    return (a * ratio + b * (1.0 - ratio)).clamp(0.0, 1.0)


def _color_jitter(im, gen):
    # torchvision ColorJitter(brightness=.8, contrast=.8, saturation=.8):
    # factors U(max(0,1-s), 1+s), applied in a shuffled order. The order
    # shuffle does not change the op cost — apply b, c, s.
    for kind in ("b", "c", "s"):
        f = float(torch.empty(1).uniform_(0.2, 1.8, generator=gen))
        if kind == "b":
            im = (im * f).clamp(0.0, 1.0)
        elif kind == "c":
            mean = _rgb_to_gray(im)[:1].mean()
            im = _blend(im, mean.expand_as(im), f)
        else:
            im = _blend(im, _rgb_to_gray(im), f)
    return im


_GAUSS_CACHE = {}


def _gaussian_blur29(im, gen):
    # GaussianBlur(kernel_size=29, sigma=U(0.1, 2.0)) — separable conv,
    # reflect padding, exactly torchvision's tensor path.
    sigma = float(torch.empty(1).uniform_(0.1, 2.0, generator=gen))
    key = round(sigma, 3)
    k = _GAUSS_CACHE.get(key)
    if k is None:
        x = torch.arange(29, dtype=torch.float32) - 14
        k = torch.exp(-(x / sigma) ** 2 / 2)
        k = k / k.sum()
        _GAUSS_CACHE[key] = k
    c = im.shape[0]
    pad = 14
    x = im[None]
    x = F.pad(x, (pad, pad, pad, pad), mode="reflect")
    x = F.conv2d(x, k.view(1, 1, 1, 29).expand(c, 1, 1, 29), groups=c)
    x = F.conv2d(x, k.view(1, 1, 29, 1).expand(c, 1, 29, 1), groups=c)
    return x[0]


def _random_resized_crop(im, size, gen):
    # RandomResizedCrop(scale=(0.08, 1.0), ratio=(3/4, 4/3)): sample a
    # crop box (same rejection loop as torchvision), then bilinear
    # resize with antialias (the PIL-parity default).
    _, h, w = im.shape
    area = h * w
    log_ratio = (math.log(3 / 4), math.log(4 / 3))
    for _ in range(10):
        target_area = area * float(
            torch.empty(1).uniform_(0.08, 1.0, generator=gen))
        ar = math.exp(float(
            torch.empty(1).uniform_(*log_ratio, generator=gen)))
        cw = int(round(math.sqrt(target_area * ar)))
        ch = int(round(math.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            i = int(torch.randint(0, h - ch + 1, (1,), generator=gen))
            j = int(torch.randint(0, w - cw + 1, (1,), generator=gen))
            break
    else:
        i, j, ch, cw = 0, 0, h, w
    crop = im[:, i:i + ch, j:j + cw]
    return F.interpolate(crop[None], size=(size, size), mode="bilinear",
                         align_corners=False, antialias=True)[0]


def train_tf(im, size, gen):
    if float(torch.rand(1, generator=gen)) < 0.8:
        im = _color_jitter(im, gen)
    if float(torch.rand(1, generator=gen)) < 0.2:
        im = _rgb_to_gray(im)
    if float(torch.rand(1, generator=gen)) < 0.5:
        im = _gaussian_blur29(im, gen)
    im = _random_resized_crop(im, size, gen)
    if float(torch.rand(1, generator=gen)) < 0.5:
        im = torch.flip(im, dims=(2,))
    return im


def default_tf(im, size):
    if im.shape[1] == size and im.shape[2] == size:
        # torchvision Resize still interpolates when size matches only
        # if antialias forces it — it short-circuits on equal size
        return im
    return F.interpolate(im[None], size=(size, size), mode="bilinear",
                         align_corners=False, antialias=True)[0]


def corrupt(subject, marginal, c=0.3):
    # verbatim shape of ContrastiveImagingAndTabularDataset.corrupt
    # (``:146-158``): deepcopy, random.sample of indices, np.random
    # column picks, fancy-indexed replacement
    import copy
    import random
    subject = copy.deepcopy(subject)
    subject = np.array(subject)
    indices = random.sample(list(range(len(subject))),
                            int(len(subject) * c))
    picks = np.random.choice(marginal.shape[1], size=len(indices))
    subject[indices] = marginal[indices, picks]
    return subject


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--cols", type=int, default=17,
                    help="DVM tabular column count")
    args = ap.parse_args()

    torch.set_num_threads(1)  # one dataloader worker = one core
    rng = np.random.RandomState(0)
    # the packed DVM tensors are img_size uint8; the recipe runs at
    # that stored resolution (RandomResizedCrop keeps 128 -> 128)
    imgs = [torch.from_numpy(
        rng.randint(0, 256, (3, args.img, args.img), dtype=np.uint8))
        .float() / 255 for _ in range(args.n)]

    gen = torch.Generator().manual_seed(0)
    # warmup (first-call dispatch/alloc + kernel cache)
    for im in imgs[:16]:
        train_tf(im, args.img, gen)
        default_tf(im, args.img)

    # -- transform-only timing (the dominant term) ---------------------
    gen = torch.Generator().manual_seed(0)
    t0 = time.perf_counter()
    for im in imgs:
        train_tf(im, args.img, gen)   # the augmented view
        default_tf(im, args.img)      # the unaugmented view
    dt_tf = time.perf_counter() - t0

    # -- the rest of __getitem__ (``:201-213``): .npy read (page-cache,
    # generous — no cold disk), tabular row + corrupt() + tensor
    # creation. DataLoader worker->main IPC (~600KB/item pickled through
    # shm) is NOT timed — also generous to the reference.
    import os
    import tempfile
    rows = [list(map(float, rng.rand(args.cols))) for _ in range(args.n)]
    marginal = np.asarray(rows).T.copy()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "im.npy")
        np.save(path, rng.randint(
            0, 256, (args.img, args.img, 3)).astype(np.uint8))
        np.load(path, allow_pickle=True)  # warm the page cache
        t0 = time.perf_counter()
        for i in range(args.n):
            arr = np.load(path, allow_pickle=True)
            torch.from_numpy(np.ascontiguousarray(arr))
            torch.tensor(rows[i % args.n], dtype=torch.float)
            torch.tensor(corrupt(rows[i % args.n], marginal),
                         dtype=torch.float)
        dt_item = time.perf_counter() - t0

    per_worker = args.n / (dt_tf + dt_item)
    per_worker_tf_only = args.n / dt_tf
    ten_workers = per_worker * NUM_WORKERS
    bracket = [round(ten_workers * f, 1) for f in ALBUMENTATIONS_SPEEDUP]
    print(json.dumps({
        "metric": "reference_input_pipeline_samples_per_sec",
        "images_per_sec_per_worker_torch": round(per_worker, 1),
        "images_per_sec_per_worker_transforms_only": round(
            per_worker_tf_only, 1),
        "samples_per_sec_10_workers_torch": round(ten_workers, 1),
        "samples_per_sec_10_workers_albumentations_bracket": bracket,
        "recipe": ("ColorJitter+Gray+Blur29+RRC+Flip + Resize(orig_im) "
                   "+ npy_read + corrupt()"),
        "img": args.img, "n": args.n,
        "note": ("raw-torch reimpl of the torchvision recipe "
                 "(torchvision absent here); npy reads are page-cached; "
                 "excludes DataLoader IPC and collate, assumes perfect "
                 "10-worker scaling — all generous to the reference"),
    }))


if __name__ == "__main__":
    main()
