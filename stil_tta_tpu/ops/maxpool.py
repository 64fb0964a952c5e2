"""MaxPool 3x3/stride-2/pad-1 with a fast hand-written backward.

The reference's ResNet stem pools with ``nn.MaxPool2d(3, 2, 1)``
(``/root/reference/models/resnets.py:181``). XLA differentiates
``reduce_window(max)`` into a ``select-and-scatter`` op that runs far
off the HBM roofline on TPU (measured 1.18 ms/step of the round-5
bench trace vs ~0.45 ms of unavoidable traffic — docs/BENCHMARKS.md
round-5).

This implementation keeps the forward as the 9-shifted-slice max (same
values, same fusion shape XLA builds for ``reduce_window``) and
replaces the backward with a parity-decomposed scatter:

- forward (under differentiation) also derives ``tstar``, the
  window-winner tap index in ``(dh, dw)`` row-major order — the FIRST
  maximal element per window, matching both torch's MaxPool2d argmax
  routing and XLA's select-and-scatter semantics, so gradients are
  bit-routed identically to both;
- backward writes each input position by summing the 1 (even,even),
  2 (odd,even / even,odd) or 4 (odd,odd) windows that can route
  gradient to it — ~2.25 reads of the quarter-resolution
  ``(g, tstar)`` pair per input element instead of select-and-scatter's
  serialized window walk.

Dtype-generic (bf16 production, f32/f64 parity suites — the routing is
exact, not approximate, so every parity/trajectory test sees identical
numerics). Only the 3x3/s2/p1 configuration is implemented; even input
H/W required (all ResNet shapes here: stem 2x-downsampled inputs).

MEASURED NEGATIVE at the bench shape (round 5, v5e, micro=4): 5,832
vs 6,460 samples/s — the backward's stack/reshape interleaves relayout
the batch-minor 64-channel stem tensors worse than select-and-scatter
walks them. Kept available behind ``STIL_RESNET_MAXPOOL=custom``
(models/resnet.py) for shapes where select-and-scatter dominates, with
the exactness tests (tests/test_maxpool.py) pinning the routing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tap_slices(x):
    """The nine stride-2 window slices of ``x`` padded with -inf."""
    b, h, w, c = x.shape
    hp, wp = h // 2, w // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    return [xp[:, dh:dh + 2 * hp - 1:2, dw:dw + 2 * wp - 1:2, :]
            for dh in range(3) for dw in range(3)]


def _forward_value(x):
    taps = _tap_slices(x)
    y = taps[0]
    for t in taps[1:]:
        y = jnp.maximum(y, t)
    return y


@jax.custom_vjp
def max_pool_3x3_s2(x):
    """max_pool(x, (3,3), strides=(2,2), padding=((1,1),(1,1))) for
    NHWC ``x`` with even H, W."""
    return _forward_value(x)


def _fwd(x):
    taps = _tap_slices(x)
    y = taps[0]
    for t in taps[1:]:
        y = jnp.maximum(y, t)
    # first-match winner tap (row-major (dh, dw) order): iterate taps
    # backwards so the lowest matching index wins — identical routing
    # to torch MaxPool2d indices and XLA select-and-scatter
    tstar = jnp.full(y.shape, 8, jnp.int8)
    for k in range(8, -1, -1):
        tstar = jnp.where(taps[k] == y, jnp.int8(k), tstar)
    return y, tstar


def _shift_h(c):
    """c'[a] = c[a+1] (zero past the end)."""
    z = jnp.zeros_like(c[:, :1])
    return jnp.concatenate([c[:, 1:], z], axis=1)


def _shift_w(c):
    z = jnp.zeros_like(c[:, :, :1])
    return jnp.concatenate([c[:, :, 1:], z], axis=2)


def _bwd(tstar, g):
    b, hp, wp, ch = g.shape

    def c(dh, dw):
        return jnp.where(tstar == 3 * dh + dw, g, jnp.zeros_like(g))

    # input row i = 2*i' + dh - 1; even rows (i=2a) come only from
    # dh=1 windows i'=a, odd rows (i=2a+1) from dh=0 @ i'=a+1 and
    # dh=2 @ i'=a (same per column)
    a_ee = c(1, 1)
    a_eo = _shift_w(c(1, 0)) + c(1, 2)
    a_oe = _shift_h(c(0, 1)) + c(2, 1)
    a_oo = (_shift_h(_shift_w(c(0, 0))) + _shift_h(c(0, 2))
            + _shift_w(c(2, 0)) + c(2, 2))

    r_even = jnp.stack([a_ee, a_eo], axis=3).reshape(b, hp, 2 * wp, ch)
    r_odd = jnp.stack([a_oe, a_oo], axis=3).reshape(b, hp, 2 * wp, ch)
    gx = jnp.stack([r_even, r_odd], axis=2).reshape(b, 2 * hp, 2 * wp, ch)
    return (gx,)


max_pool_3x3_s2.defvjp(_fwd, _bwd)
