"""ops/maxpool.py: value- and gradient-routing equality vs XLA's
reduce_window / select-and-scatter pair (which the parity suites
previously used and torch's MaxPool2d matches).

Uses integer-valued inputs with many exact ties (relu-style zeros) so
the first-match tie routing is actually exercised: any deviation from
select-and-scatter's window-order first-match shows up as a hard
mismatch, not fp noise.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stil_tta_tpu.ops.maxpool import max_pool_3x3_s2


def _ref_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def _tied_input(shape, dtype, seed=0):
    # small integers, clamped at 0 like relu outputs -> dense exact ties
    rs = np.random.RandomState(seed)
    v = rs.randint(-3, 6, size=shape).astype(np.float64)
    return jnp.asarray(np.maximum(v, 0.0), dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (3, 16, 12, 5),
                                   (1, 2, 2, 1), (2, 6, 16, 64)])
def test_value_and_grad_routing_equal(dtype, shape):
    x64_before = jax.config.jax_enable_x64
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    try:
        x = _tied_input(shape, dtype)
        y0 = _ref_pool(x)
        y1 = max_pool_3x3_s2(x)
        np.testing.assert_array_equal(np.asarray(y0, np.float64),
                                      np.asarray(y1, np.float64))

        # weight each output position differently so any routing
        # difference changes the input gradient
        w = jnp.asarray(
            np.random.RandomState(1).randint(1, 7, size=y0.shape), dtype)

        g0 = jax.grad(lambda t: jnp.sum(
            _ref_pool(t).astype(jnp.float32) * w.astype(jnp.float32)))(x)
        g1 = jax.grad(lambda t: jnp.sum(
            max_pool_3x3_s2(t).astype(jnp.float32)
            * w.astype(jnp.float32)))(x)
        np.testing.assert_array_equal(np.asarray(g0, np.float64),
                                      np.asarray(g1, np.float64))
    finally:
        jax.config.update("jax_enable_x64", x64_before)


def test_matches_under_jit_and_vmap():
    x = _tied_input((2, 2, 8, 8, 4), jnp.float32)

    def loss(fn, t):
        return jnp.sum(jax.vmap(fn)(t) * 3.0)

    g0 = jax.jit(jax.grad(lambda t: loss(_ref_pool, t)))(x)
    g1 = jax.jit(jax.grad(lambda t: loss(max_pool_3x3_s2, t)))(x)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
