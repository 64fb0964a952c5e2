#!/usr/bin/env python
"""Analytic combined compute+HBM roofline for the STiL bench step.

Models, layer by layer at the reference DVM bench shape
(batch 512 = 64 labeled + 448 unlabeled, 128x128 images, ResNet-50 +
4-layer tabular transformer + 1 MI fusion layer, 286 classes —
BASELINE.md / ``configs/config_dvm_STiL.yaml:74,127`` in the
reference), the two hardware resources a v5e step can bound on:

1. MXU FLOPs (197 TFLOP/s bf16 peak; 144 TFLOP/s realizable on this
   chip per ``tools/bench_mxu_peak.py``),
2. HBM activation traffic (819 GB/s peak), counting the unavoidable
   materializations under XLA's fusion model: each conv output is
   written once (convs cannot be fused through), read by BN statistics
   (train-mode passes only), and read again by the next conv; the
   backward reads each saved activation, and every dgrad reads one
   grad tensor and writes another; wgrad activation reads ride the
   dgrad fusion's read where XLA co-schedules them (counted once).

This is a *model*, not a measurement — its purpose is to make the
"the step is near its floor" claim falsifiable from first principles
and to locate which resource each pass bounds on. Pure numpy-free
arithmetic; runs anywhere. Prints a per-pass table and the combined
floor under (a) zero overlap and (b) perfect compute/DMA overlap.
"""

from __future__ import annotations

BF16 = 2  # bytes

# v5e numbers (cloud.google.com/tpu/docs/v5e + tools/bench_mxu_peak.py)
PEAK_FLOPS = 197e12
REAL_FLOPS = 144e12     # measured chained-matmul ceiling (73% of peak)
HBM_BW = 819e9          # bytes/s


def resnet50_layers(batch: int, size: int):
    """(name, out_elems, flops) per conv of a ResNet-50 fwd at
    ``size``x``size`` NHWC input. Mirrors stil_tta_tpu/models/resnet.py
    (space-to-depth stem, bottleneck widths) — shapes only, no code
    shared."""
    layers = []

    def conv(name, h, w, cout, cin, k):
        out = batch * h * w * cout
        fl = 2 * out * cin * k * k
        layers.append((name, out, fl))

    s = size // 2                       # stem stride 2
    conv("stem7x7", s, s, 64, 3, 7)
    s = s // 2                          # maxpool
    # (stage, blocks, mid, cout, stride)
    spec = [(1, 3, 64, 256, 1), (2, 4, 128, 512, 2),
            (3, 6, 256, 1024, 2), (4, 3, 512, 2048, 2)]
    cin = 64
    for st, nb, mid, cout, stride in spec:
        for b in range(nb):
            sb = stride if b == 0 else 1
            so = s // sb
            conv(f"s{st}b{b}.c1", s, s, mid, cin, 1)
            conv(f"s{st}b{b}.c2", so, so, mid, mid, 3)
            conv(f"s{st}b{b}.c3", so, so, cout, mid, 1)
            if b == 0:
                conv(f"s{st}b{b}.ds", so, so, cout, cin, 1)
            cin = cout
            s = so
    return layers


def transformer_flops(batch: int, tokens: int, dim: int, layers: int,
                      mlp_ratio: int = 4):
    per_tok = 2 * (4 * dim * dim + 2 * mlp_ratio * dim * dim)
    attn = 2 * 2 * tokens * tokens * dim * batch * layers
    return batch * tokens * per_tok * layers + attn


def pass_costs(batch: int, size: int, train: bool):
    """(flops, hbm_bytes) of one ResNet-50 image pass."""
    layers = resnet50_layers(batch, size)
    flops = sum(f for _, _, f in layers)
    act = sum(o for _, o, _ in layers) * BF16
    # write each conv out once + next conv reads it once
    traffic = 2 * act
    if train:
        traffic += act          # BN statistics re-read
    return flops, traffic


def backward_costs(batch: int, size: int):
    layers = resnet50_layers(batch, size)
    flops = 2 * sum(f for _, _, f in layers)          # dgrad + wgrad
    act = sum(o for _, o, _ in layers) * BF16
    # read saved act (wgrad + BN/relu recompute, co-scheduled: 1x),
    # each grad tensor written once and read once
    traffic = act + 2 * act
    return flops, traffic


def main():
    B, S = 512, 128
    rows = []

    f, t = pass_costs(B, S, train=True)
    rows.append(("student fwd (l+u, train BN)", f, t))
    f, t = pass_costs(B, S, train=False)
    rows.append(("teacher fwd (eval BN)", f, t))
    f, t = backward_costs(B, S)
    rows.append(("student bwd", f, t))

    # tabular encoder: 18 tokens x 512 dim x 4 layers; fusion layer ~1
    # MI layer over 16+18+1 tokens; student fwd+bwd (3x fwd cost) +
    # teacher fwd.
    tf = transformer_flops(B, 18, 512, 4) + transformer_flops(B, 35, 512, 1)
    rows.append(("transformers fwd+bwd+teacher", 4 * tf,
                 4 * (B * 18 * 512 * 14) * BF16))

    # augmentation: crop/resize as banded matmuls (128x128 x 2 axes),
    # jitter/blur elementwise; image read uint8 + write bf16.
    aug_f = 2 * B * (128 * 128 * 128 * 3) * 2 * 2   # two matmuls, 2 views
    aug_t = B * S * S * 3 * (1 + 2 * BF16) * 2
    rows.append(("augmentation (2 views)", aug_f, aug_t))

    # optimizer: Adam over ~40M params f32: read p,m,v,g write p,m,v
    P = 40e6
    rows.append(("Adam update", 0, P * 4 * 7))

    print(f"{'pass':36s} {'TFLOP':>7s} {'GB':>6s} "
          f"{'t_mxu(ms)':>10s} {'t_hbm(ms)':>10s}")
    tot_f = tot_t = 0.0
    for name, f, t in rows:
        tot_f += f
        tot_t += t
        print(f"{name:36s} {f/1e12:7.2f} {t/1e9:6.2f} "
              f"{f/REAL_FLOPS*1e3:10.2f} {t/HBM_BW*1e3:10.2f}")
    t_mxu = tot_f / REAL_FLOPS * 1e3
    t_hbm = tot_t / HBM_BW * 1e3
    print(f"{'TOTAL':36s} {tot_f/1e12:7.2f} {tot_t/1e9:6.2f} "
          f"{t_mxu:10.2f} {t_hbm:10.2f}")
    print(f"\nfloor, zero overlap   : {t_mxu + t_hbm:6.1f} ms "
          f"({B / (t_mxu + t_hbm) * 1e3:7.0f} samples/s)")
    print(f"floor, perfect overlap: {max(t_mxu, t_hbm):6.1f} ms "
          f"({B / max(t_mxu, t_hbm) * 1e3:7.0f} samples/s)")
    print("measured (round 3)    :   94.0 ms (   5447 samples/s)")


if __name__ == "__main__":
    main()
