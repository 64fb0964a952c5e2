#!/usr/bin/env python
"""MXU peak calibration: what FLOP rate does this chip actually sustain
on a clean, dead-code-proof matmul chain?

Motivation (round 3): bench.py's MFU accounting used 394 TFLOP/s as the
v5e peak — that is the chip's *int8* TOPS; the bf16 peak is 197 TFLOP/s
(cloud.google.com/tpu/docs/v5e). This tool measures the realizable bf16
ceiling so MFU claims are grounded in a measurement, not a spec sheet.

Harness rules (docs/DESIGN.md measurement note): every output live
(host-read of a scalar derived from the chain), every input loop-variant
(the chain feeds x through each matmul — XLA cannot hoist or slice
through it), and the scale factor keeps bf16 magnitudes in range.

Measured on the round-3 chip (TPU v5 lite, one core):

  M=8192 K=N=8192:  7.62 ms/matmul -> 144 TFLOP/s  (73% of 197)
  M=9216 K=N=2048:  2.09 ms/matmul ->  37 TFLOP/s
  M=9216 K=N=512:   1.82 ms/matmul -> 2.7 TFLOP/s (sequential small
      matmuls are latency-bound through the chain; the same shape inside
      the real network, where independent work overlaps, runs ~64 TFLOP/s
      — use in-network traces, not this chain, for small-shape reads)

So the realizable clean-matmul ceiling is ~144 TFLOP/s; the 94 ms train
step's 7.36 modeled TFLOP => ~78 TFLOP/s sustained = 40% of bf16 peak,
~54% of the realizable matmul ceiling — with a large BN/reduction and
augmentation share that never touches the MXU.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.utils import jax_setup
    jax_setup.setup()

    key = jax.random.key(0)
    reps = 16
    for m, k in [(8192, 8192), (9216, 2048), (9216, 512)]:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, k), jnp.bfloat16) * (1.0 / k ** 0.5)

        @jax.jit
        def chain(a, b):
            x = a
            for _ in range(reps):
                x = x @ b
            return x.astype(jnp.float32).sum()

        float(chain(a, b))  # compile + warm
        t0 = time.perf_counter()
        float(chain(a, b))  # host-read: airtight sync on the tunnel
        dt = time.perf_counter() - t0
        flops = reps * 2 * m * k * k
        print(f"M={m} K=N={k}: {dt * 1e3 / reps:.3f} ms/matmul  "
              f"{flops / dt / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
