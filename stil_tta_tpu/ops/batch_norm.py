"""TPU BatchNorm with pallas-fused statistic reductions.

Profiling attribution (docs/DESIGN.md): XLA's BN forward/backward stat
fusions over the big early ResNet activations run ~6x off HBM bandwidth
(five f32[C] reductions re-reading a bf16[512,32,32,256] block). This
module replaces them with single-pass pallas kernels:

- forward: one pass computing per-channel sum and sum-of-squares
  (mean/var via E[x], E[x^2]);
- backward: one pass computing sum(dy) and sum(dy * x_hat) with x_hat
  recomputed on the fly from the saved bf16 activation.

The elementwise normalize/apply and the dx formula stay in jnp so XLA
fuses them into neighbouring ops. Running statistics follow torch
semantics (momentum on the new value; unbiased variance tracked), and
the variable collections mirror flax's BatchNorm ('batch_stats' with
'mean'/'var'), so checkpoints and the torch converter are unchanged.

On non-TPU backends the kernels run in interpret mode (tests) — the
flax implementation remains available via ``ResNet(bn_impl='flax')``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(m: int, c: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest power-of-two row tile that divides m and fits VMEM."""
    tile = 1
    while (tile * 2 <= m and m % (tile * 2) == 0
           and tile * 2 * c * 2 <= budget_bytes and tile * 2 <= 8192):
        tile *= 2
    return tile


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    xb = x_ref[:].astype(jnp.float32)
    sum_ref[:] += jnp.sum(xb, axis=0, keepdims=True)
    sq_ref[:] += jnp.sum(xb * xb, axis=0, keepdims=True)


def bn_stats(x2d: jax.Array):
    """(M, C) -> (sum, sumsq) each (1, C) f32, single pass."""
    m, c = x2d.shape
    tm = _pick_tile(m, c)
    grid = (m // tm,)
    out_shape = (jax.ShapeDtypeStruct((1, c), jnp.float32),
                 jax.ShapeDtypeStruct((1, c), jnp.float32))
    return pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shape,
        interpret=_interpret(),
    )(x2d)


def _bwd_kernel(x_ref, dy_ref, mean_ref, inv_ref, sdy_ref, sdyxh_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sdy_ref[:] = jnp.zeros_like(sdy_ref)
        sdyxh_ref[:] = jnp.zeros_like(sdyxh_ref)

    xb = x_ref[:].astype(jnp.float32)
    dyb = dy_ref[:].astype(jnp.float32)
    xhat = (xb - mean_ref[:]) * inv_ref[:]
    sdy_ref[:] += jnp.sum(dyb, axis=0, keepdims=True)
    sdyxh_ref[:] += jnp.sum(dyb * xhat, axis=0, keepdims=True)


def bn_bwd_reduce(x2d: jax.Array, dy2d: jax.Array, mean: jax.Array,
                  inv: jax.Array):
    """Single pass over (x, dy): returns (sum_dy, sum_dy_xhat), (1,C) f32."""
    m, c = x2d.shape
    tm = _pick_tile(m, c, budget_bytes=3 * 1024 * 1024)
    grid = (m // tm,)
    out_shape = (jax.ShapeDtypeStruct((1, c), jnp.float32),
                 jax.ShapeDtypeStruct((1, c), jnp.float32))
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shape,
        interpret=_interpret(),
    )(x2d, dy2d, mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x2d, scale, bias, eps):
    (y, mean, var), _ = _bn_train_fwd(x2d, scale, bias, eps)
    return y, mean, var


def _bn_train_fwd(x2d, scale, bias, eps):
    m = x2d.shape[0]
    s, ss = bn_stats(x2d)
    mean = (s / m)[0]
    var = (ss / m)[0] - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = ((x2d.astype(jnp.float32) - mean) * (inv * scale)
         + bias).astype(x2d.dtype)
    return (y, mean, var), (x2d, mean, inv, scale)


def _bn_train_bwd(eps, res, cts):
    dy, _, _ = cts  # mean/var feed stop-gradient running stats only
    x2d, mean, inv, scale = res
    m = x2d.shape[0]
    sdy2, sdyxh2 = bn_bwd_reduce(x2d, dy, mean[None, :], inv[None, :])
    sdy, sdyxh = sdy2[0], sdyxh2[0]
    xhat = (x2d.astype(jnp.float32) - mean) * inv
    dx = ((scale * inv)
          * (dy.astype(jnp.float32) - sdy / m - xhat * (sdyxh / m)))
    return dx.astype(x2d.dtype), sdyxh, sdy


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class TPUBatchNorm(nn.Module):
    """Drop-in BatchNorm with pallas-fused reductions (train mode).

    Matches torch/flax semantics: eps 1e-5, torch momentum 0.1 on the
    new value (`momentum` below is the flax-style decay on the old
    value), unbiased variance tracked in running stats (torch
    convention), f32 statistics.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        orig_shape = x.shape
        if self.use_running_average or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon)
            y = ((x.astype(jnp.float32) - mean) * (inv * scale) + bias)
            return y.astype(self.dtype)
        x2d = x.reshape(-1, c)
        y2d, mean, var = bn_train(x2d, scale, bias, self.epsilon)
        m = x2d.shape[0]
        unbiased = var * (m / max(m - 1, 1))
        ra_mean.value = (self.momentum * ra_mean.value
                         + (1 - self.momentum) * mean)
        ra_var.value = (self.momentum * ra_var.value
                        + (1 - self.momentum) * unbiased)
        return y2d.reshape(orig_shape).astype(self.dtype)
