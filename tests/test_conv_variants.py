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


class TestFp8ActStore:
    """``STIL_RESNET_ACT_STORE=fp8`` (resnet._conv_out): per-channel-
    scaled float8 storage of the branch-remat saved residuals — a
    flag-gated perf-measurement lane (docs/BENCHMARKS.md round-4
    headroom). Contract: bf16 quant-dequant error stays within the fp8
    rounding bound, grads flow, and NON-bf16 dtypes (the f32/f64 parity
    suites) are bit-identical with the flag set."""

    def _net(self, dtype):
        from stil_tta_tpu.models.resnet import resnet18
        return resnet18(dtype=dtype)

    def test_bf16_error_bounded_and_grads_flow(self, monkeypatch):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3),
                        jnp.bfloat16)
        net = self._net(jnp.bfloat16)
        monkeypatch.delenv("STIL_RESNET_ACT_STORE", raising=False)
        params = net.init(jax.random.key(0), x, train=True)
        y_ref = net.apply(params, x, train=False)[0].astype(jnp.float32)
        monkeypatch.setenv("STIL_RESNET_ACT_STORE", "fp8")
        y_q = net.apply(params, x, train=False)[0].astype(jnp.float32)
        # e4m3 rounding is ~2^-3 relative per element, zero-mean; after
        # BN + pooling the pooled features stay within a few percent.
        scale = float(jnp.max(jnp.abs(y_ref))) + 1e-30
        assert float(jnp.max(jnp.abs(y_ref - y_q))) / scale < 0.08

    def test_bf16_grad_finite(self, monkeypatch):
        monkeypatch.setenv("STIL_RESNET_ACT_STORE", "fp8")
        monkeypatch.setenv("STIL_RESNET_REMAT", "branch")
        x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3),
                        jnp.bfloat16)
        net = self._net(jnp.bfloat16)
        vs = net.init(jax.random.key(0), x, train=True)

        def loss(p):
            out, _ = net.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(t.astype(jnp.float32).sum()
                       for t in jax.tree_util.tree_leaves(out))

        g = jax.jit(jax.grad(loss))(vs["params"])
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))

    def test_f32_bit_identical_with_flag_set(self, monkeypatch):
        x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3),
                        jnp.float32)
        net = self._net(jnp.float32)
        monkeypatch.delenv("STIL_RESNET_ACT_STORE", raising=False)
        params = net.init(jax.random.key(0), x, train=True)
        y_ref = net.apply(params, x, train=False)[0]
        monkeypatch.setenv("STIL_RESNET_ACT_STORE", "fp8")
        y_q = net.apply(params, x, train=False)[0]
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_q))
