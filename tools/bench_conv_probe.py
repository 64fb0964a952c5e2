#!/usr/bin/env python
"""Microbenchmark: the ResNet bottleneck 1x1-conv + fused-BN pattern.

The round-1 trace attribution (docs/BENCHMARKS.md) shows ~50 ms/step of
the 97.5 ms STiL train step inside XLA "conv + BN-stat" fusions for the
1x1 convolutions of the bottleneck blocks (the convert_reduce_fusion
kernels fuse the conv, the f32 stat reductions, and the normalize/relu
of the *previous* layer's raw output). These kernels run ~2x off the
HBM roofline, so this probe measures, at the hottest shape
(layer1 conv1: M=512*32*32, K=256, N=64):

  gemm          plain a@w (lower bound for the conv itself)
  conv1x1       lax.conv 1x1 NHWC (what the network traces to)
  xla_chain     normalize+relu(prev_raw) -> 1x1 conv -> y, sum, sumsq
                (the full fused in-network pattern, XLA-compiled)
  pallas_chain  the same pattern as ONE pallas kernel: bf16 affine
                prologue (A*x+B, max 0), MXU dot, bf16 store, f32
                stat epilogue accumulated across the grid

Timing over the axon tunnel: each variant runs ITERS times inside one
jitted fori_loop with a tiny feedback through w (serializes iterations
without re-reading host data); per-iter time is the slope between two
iteration counts, which cancels dispatch overhead.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IMG, H, W = 512, 32, 32
M = N_IMG * H * W            # 524288
K, N = 256, 64               # layer1 conv1 shape (hottest scope)


def make_inputs(seed: int = 0):
    rs = np.random.RandomState(seed)
    raw = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rs.randn(K, N) * 0.05, jnp.bfloat16)
    a_scale = jnp.asarray(rs.rand(K) + 0.5, jnp.float32)
    b_shift = jnp.asarray(rs.randn(K) * 0.1, jnp.float32)
    return raw, w, a_scale, b_shift


# ------------------------------ variants ------------------------------

def gemm(raw, w, A, B):
    y = jnp.dot(raw, w, preferred_element_type=jnp.float32)
    return (y.astype(jnp.bfloat16),)


def conv1x1(raw, w, A, B):
    x = raw.reshape(N_IMG, H, W, K)
    y = jax.lax.conv_general_dilated(
        x, w.reshape(1, 1, K, N), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y.astype(jnp.bfloat16).reshape(M, N),)


def xla_chain(raw, w, A, B):
    h = jnp.maximum(raw.astype(jnp.float32) * A + B, 0.0).astype(jnp.bfloat16)
    y = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def _chain_kernel(raw_ref, w_ref, ab_ref, y_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    A = ab_ref[0, :].astype(jnp.bfloat16)
    B = ab_ref[1, :].astype(jnp.bfloat16)
    h = jnp.maximum(raw_ref[:] * A[None, :] + B[None, :],
                    jnp.bfloat16(0))
    y = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
    yb = y.astype(jnp.bfloat16)
    y_ref[:] = yb
    yf = yb.astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(yf * yf, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tm",))
def pallas_chain_call(raw, w, A, B, tm=2048):
    ab = jnp.stack([A, B])  # (2, K) f32
    grid = (M // tm,)
    y, s1, s2 = pl.pallas_call(
        _chain_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
    )(raw, w, ab)
    return y, s1[0], s2[0]


def pallas_chain(raw, w, A, B):
    return pallas_chain_call(raw, w, A, B)


def pallas_chain_8k(raw, w, A, B):
    return pallas_chain_call(raw, w, A, B, tm=8192)


def _chain_scratch_kernel(raw_ref, w_ref, ab_ref, y_ref, s1_ref, s2_ref,
                          acc1, acc2):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    A = ab_ref[0, :].astype(jnp.bfloat16)
    B = ab_ref[1, :].astype(jnp.bfloat16)
    h = jnp.maximum(raw_ref[:] * A[None, :] + B[None, :], jnp.bfloat16(0))
    y = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
    yb = y.astype(jnp.bfloat16)
    y_ref[:] = yb

    @pl.when(i == 0)
    def _():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    acc1[:] += jnp.sum(y, axis=0, keepdims=True)
    acc2[:] += jnp.sum(y * y, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _():
        s1_ref[:] = acc1[:]
        s2_ref[:] = acc2[:]


@functools.partial(jax.jit, static_argnames=("tm",))
def pallas_chain_scratch_call(raw, w, A, B, tm=4096):
    ab = jnp.stack([A, B])
    grid = (M // tm,)
    y, s1, s2 = pl.pallas_call(
        _chain_scratch_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32),
                        pltpu.VMEM((1, N), jnp.float32)],
    )(raw, w, ab)
    return y, s1[0], s2[0]


def pallas_chain_scratch(raw, w, A, B):
    return pallas_chain_scratch_call(raw, w, A, B)


VARIANTS = {
    "gemm": gemm,
    "conv1x1": conv1x1,
    "xla_chain": xla_chain,
    "pallas_chain": pallas_chain,
    "pallas_chain_8k": pallas_chain_8k,
    "pallas_chain_scratch": pallas_chain_scratch,
}


# -------------------- backward residual-join probe --------------------
# The round-2 trace's costliest backward kernels join, per bottleneck:
#   dx = dy_up @ w1^T          (1x1 dgrad, 64 -> 256)
#   dy = dx + dy_res            (residual add)
#   dy = where(x_raw_norm > 0, dy, 0)   (relu mask)
#   sum(dy), sum(dy * (x_raw - mu)), dgamma-style reduces
# at ~360 GB/s effective. This probe measures the same pattern in
# isolation (one BN's three reductions) as XLA vs one pallas kernel —
# the go/no-go signal for a round-3 custom-vjp join kernel.

NJ = 256  # join channels (layer1 block output)


def make_join_inputs(seed: int = 1):
    rs = np.random.RandomState(seed)
    dy_up = jnp.asarray(rs.randn(M, N), jnp.bfloat16)        # (M, 64)
    w1 = jnp.asarray(rs.randn(NJ, N) * 0.05, jnp.bfloat16)   # (256, 64)
    dy_res = jnp.asarray(rs.randn(M, NJ), jnp.bfloat16)
    x_raw = jnp.asarray(rs.randn(M, NJ), jnp.bfloat16)
    mu = jnp.asarray(rs.randn(NJ) * 0.1, jnp.float32)
    return dy_up, w1, dy_res, x_raw, mu


def xla_bwd_join(dy_up, w1, dy_res, x_raw, mu):
    dx = jnp.dot(dy_up, w1.T, preferred_element_type=jnp.float32)
    dy = dx.astype(jnp.bfloat16) + dy_res
    mask = (x_raw.astype(jnp.float32) - mu) > 0
    dy = jnp.where(mask, dy, jnp.bfloat16(0))
    dyf = dy.astype(jnp.float32)
    s1 = jnp.sum(dyf, axis=0)
    s2 = jnp.sum(dyf * (x_raw.astype(jnp.float32) - mu), axis=0)
    s3 = jnp.sum(dyf * dyf, axis=0)
    return dy, s1, s2, s3


def _join_kernel(dyu_ref, w1_ref, dyr_ref, x_ref, mu_ref,
                 dy_ref, s1_ref, s2_ref, s3_ref, acc1, acc2, acc3):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    dx = jnp.dot(dyu_ref[:], w1_ref[:].T,
                 preferred_element_type=jnp.float32)
    dy = dx.astype(jnp.bfloat16) + dyr_ref[:]
    xc = x_ref[:].astype(jnp.float32) - mu_ref[0, :]
    dy = jnp.where(xc > 0, dy, jnp.bfloat16(0))
    dy_ref[:] = dy
    dyf = dy.astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)
        acc3[:] = jnp.zeros_like(acc3)

    acc1[:] += jnp.sum(dyf, axis=0, keepdims=True)
    acc2[:] += jnp.sum(dyf * xc, axis=0, keepdims=True)
    acc3[:] += jnp.sum(dyf * dyf, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _():
        s1_ref[:] = acc1[:]
        s2_ref[:] = acc2[:]
        s3_ref[:] = acc3[:]


@functools.partial(jax.jit, static_argnames=("tm",))
def pallas_bwd_join_call(dy_up, w1, dy_res, x_raw, mu, tm=2048):
    grid = (M // tm,)
    outs = pl.pallas_call(
        _join_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NJ, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, NJ), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, NJ), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NJ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, NJ), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NJ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NJ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NJ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, NJ), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, NJ), jnp.float32),
            jax.ShapeDtypeStruct((1, NJ), jnp.float32),
            jax.ShapeDtypeStruct((1, NJ), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, NJ), jnp.float32),
                        pltpu.VMEM((1, NJ), jnp.float32),
                        pltpu.VMEM((1, NJ), jnp.float32)],
    )(dy_up, w1, dy_res, x_raw, mu[None, :])
    dy, s1, s2, s3 = outs
    return dy, s1[0], s2[0], s3[0]


def pallas_bwd_join(dy_up, w1, dy_res, x_raw, mu):
    return pallas_bwd_join_call(dy_up, w1, dy_res, x_raw, mu)


def timed_join_loop(fn, dy_up, w1, dy_res, x_raw, mu, iters):
    """Same dead-code-proofing as timed_loop: full-dy scalar feedback
    into w1, stats feedback into mu (keeps the mask/reduces live and
    loop-variant)."""

    def body(_, carry):
        w1c, muc = carry
        dy, s1, s2, s3 = fn(dy_up, w1c, dy_res, x_raw, muc)
        sy = jnp.sum(dy.astype(jnp.float32)) * 1e-20
        tweak = (jnp.sum(s1) + jnp.sum(s2) + jnp.sum(s3)) * 1e-30 + sy
        return w1c + sy.astype(jnp.bfloat16), muc + tweak

    w1f, muf = jax.lax.fori_loop(0, iters, body, (w1, mu))
    return jnp.sum(w1f.astype(jnp.float32)) + jnp.sum(muf)


def measure_join(fn, inputs, k1=6, k2=30, reps=3):
    f = jax.jit(timed_join_loop, static_argnames=("fn", "iters"))
    outs = {}
    for k in (k1, k2):
        r = f(fn=fn, dy_up=inputs[0], w1=inputs[1], dy_res=inputs[2],
              x_raw=inputs[3], mu=inputs[4], iters=k)
        float(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f(fn=fn, dy_up=inputs[0], w1=inputs[1], dy_res=inputs[2],
                  x_raw=inputs[3], mu=inputs[4], iters=k)
            float(r)
            best = min(best, time.perf_counter() - t0)
        outs[k] = best
    return (outs[k2] - outs[k1]) / (k2 - k1)


# ------------------------------ timing --------------------------------

def timed_loop(fn, raw, w, A, B, iters):
    """Run ``fn`` iters times, serialized, with EVERY output live.

    Harness rules learned the hard way (first version measured an
    xla_chain *below* its own HBM roofline):
    - feed a scalar ``sum(y)`` back into w so the full y must be
      computed (a sliced feedback lets XLA slice through the dot);
    - carry A/B and perturb them from the stat outputs so the affine
      prologue is loop-variant (else XLA hoists it out of the loop)
      and the stats are not dead code.
    """

    def body(_, carry):
        wcur, Acur, Bcur = carry
        outs = fn(raw, wcur, Acur, Bcur)
        y = outs[0]
        sy = jnp.sum(y.astype(jnp.float32)) * 1e-20
        wnew = wcur + sy.astype(jnp.bfloat16)
        if len(outs) == 3:
            s1, s2 = outs[1], outs[2]
            tweak = (jnp.sum(s1) + jnp.sum(s2)) * 1e-30 + sy
            Anew = Acur + tweak
            Bnew = Bcur + tweak
        else:
            Anew, Bnew = Acur + sy, Bcur + sy
        return wnew, Anew, Bnew

    wf, Af, Bf = jax.lax.fori_loop(0, iters, body, (w, A, B))
    return (jnp.sum(wf.astype(jnp.float32)) + jnp.sum(Af)
            + jnp.sum(Bf))


def measure(name, fn, inputs, k1=6, k2=30, reps=3):
    f = jax.jit(timed_loop, static_argnames=("fn", "iters"))
    outs = {}
    for k in (k1, k2):
        r = f(fn=fn, raw=inputs[0], w=inputs[1], A=inputs[2], B=inputs[3],
              iters=k)
        float(r)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f(fn=fn, raw=inputs[0], w=inputs[1], A=inputs[2],
                  B=inputs[3], iters=k)
            float(r)
            best = min(best, time.perf_counter() - t0)
        outs[k] = best
    per_iter = (outs[k2] - outs[k1]) / (k2 - k1)
    return per_iter


def main():
    from stil_tta_tpu.utils import jax_setup
    jax_setup.setup()
    inputs = make_inputs()
    bytes_roof = (M * K * 2 + M * N * 2) / 819e9 * 1e3  # ms, read+write
    print(f"# shape M={M} K={K} N={N}; HBM roofline ~{bytes_roof:.3f} ms "
          f"(read a + write y at 819 GB/s)")
    results = {}
    for name, fn in VARIANTS.items():
        try:
            ms = measure(name, fn, inputs) * 1e3
            results[name] = round(ms, 4)
            print(f"{name:14s} {ms:8.3f} ms/iter")
        except Exception as e:  # pragma: no cover
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")

    jb = (M * N * 2 + 3 * M * NJ * 2) / 819e9 * 1e3
    print(f"# bwd-join shape M={M} dy_up={N} join={NJ}; roofline "
          f"~{jb:.3f} ms (read dy_up/dy_res/x + write dy)")
    ji = make_join_inputs()
    # correctness gate: a wrong kernel must not win the timing
    ra, rb = xla_bwd_join(*ji), pallas_bwd_join(*ji)
    import numpy as _np
    for a, b in zip(ra, rb):
        _np.testing.assert_allclose(_np.asarray(a, _np.float32),
                                    _np.asarray(b, _np.float32),
                                    rtol=2e-2, atol=2.0)
    print("# bwd-join pallas == xla (checked)")
    for name, fn in (("xla_bwd_join", xla_bwd_join),
                     ("pallas_bwd_join", pallas_bwd_join)):
        try:
            ms = measure_join(fn, ji) * 1e3
            results[name] = round(ms, 4)
            print(f"{name:16s} {ms:8.3f} ms/iter")
        except Exception as e:  # pragma: no cover
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
