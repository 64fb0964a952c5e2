"""Exactness of the alternative 1x1-conv formulations.

``Dot1x1`` (matmul fwd+bwd) and ``ConvDotBwd1x1`` (conv fwd +
custom-VJP matmul bwd) are measurement infrastructure kept off-default
(both measured slower end-to-end than XLA's conv path at the bench
shape — docs/BENCHMARKS.md round-3). They must stay mathematically
interchangeable with the conv path: same param tree, same outputs,
grads equal up to f32 reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stil_tta_tpu.models.resnet import resnet50


def _nets(monkeypatch, mode):
    net_ref = resnet50(dtype=jnp.float32)
    monkeypatch.setenv("STIL_RESNET_DOT1X1", mode)
    net_alt = resnet50(dtype=jnp.float32)
    return net_ref, net_alt


def _loss(net, params, x):
    out, _ = net.apply(params, x, train=True, mutable=["batch_stats"])
    return sum(t.sum() for t in jax.tree_util.tree_leaves(out))


@pytest.mark.parametrize("mode", ["1", "bwd"])
def test_dot1x1_variants_match_conv(monkeypatch, mode):
    monkeypatch.delenv("STIL_RESNET_DOT1X1", raising=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    net_ref, net_alt = _nets(monkeypatch, mode)
    params = net_ref.init(jax.random.key(0), x, train=False)

    # same param tree (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                net_alt.init(jax.random.key(0), x, train=False)))

    y0 = net_ref.apply(params, x, train=False)
    y1 = net_alt.apply(params, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(y0),
                    jax.tree_util.tree_leaves(y1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)

    g0 = jax.grad(lambda p: _loss(net_ref, p, x))(params)
    g1 = jax.grad(lambda p: _loss(net_alt, p, x))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
