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
    """``STIL_RESNET_ACT_STORE`` (resnet._conv_out / resolve_act_store):
    per-channel-scaled float8 storage of the branch-remat saved
    residuals — a flag-gated perf-measurement lane (docs/BENCHMARKS.md
    round-4 headroom). Contract (advisor r4): the mode is resolved at
    construction and active ONLY in branch-remat'd train forwards —
    eval forwards, non-remat configs, and non-bf16 dtypes (the f32/f64
    parity suites) are bit-identical with the flag set; in the active
    path the quant-dequant error stays within the float8 rounding bound
    and grads flow."""

    def _net(self, dtype, act_store="0", remat=False):
        from stil_tta_tpu.models.resnet import resnet18
        return resnet18(dtype=dtype, act_store=act_store, remat=remat)

    def _train_fwd(self, net, vs, x):
        out, _ = net.apply(vs, x, train=True, mutable=["batch_stats"])
        return out[0].astype(jnp.float32)

    # Per-element quant-dequant bound at the _conv_out unit level:
    # e4m3 has a 3-bit mantissa (round-to-nearest ~2^-4 relative),
    # e5m2 a 2-bit one (~2^-3); add bf16 headroom on top. End-to-end
    # train forwards COMPOUND this per-conv rounding through
    # batch-stat BN (the error is renormalised against the signal at
    # every layer), so no useful end-to-end value bound exists — the
    # lane is gated by the convergence study, not a forward-error
    # test (docs/BENCHMARKS.md).
    @pytest.mark.parametrize("mode,bound", [("fp8", 0.075), ("e5m2", 0.14)])
    def test_quant_dequant_unit_error_bounded(self, mode, bound):
        from stil_tta_tpu.models.resnet import _conv_out
        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 8, 8, 16) *
            np.logspace(-3, 2, 16)[None, None, None, :], jnp.bfloat16)
        y = _conv_out(x, mode)
        assert y.dtype == jnp.bfloat16
        xf = x.astype(jnp.float32)
        err = jnp.abs(y.astype(jnp.float32) - xf)
        rel = err / (jnp.abs(xf) + 1e-12)
        # elements near each channel's amax hold the relative bound;
        # small elements are bounded by the channel scale instead
        amax = jnp.max(jnp.abs(xf), axis=(0, 1, 2), keepdims=True)
        ok = (rel < bound) | (err < bound * amax * 2 ** -7)
        assert bool(jnp.all(ok))

    # KNOWN DEFECT of the fake-quant formulation (round-5): under
    # branch remat the saved residual q is float8-typed, so the
    # cotangent computed against it is float8-typed too; e4m3 has no
    # inf and saturates at 448, so cotangents beyond that become NaN
    # in the backward. e5m2 (max 57344) survives at these magnitudes.
    # Fix direction: exact-forward / fp8-stored-backward custom-VJP
    # (cotangents stay f32) — see docs/BENCHMARKS.md round-5.
    @pytest.mark.parametrize("mode", [
        pytest.param("fp8", marks=pytest.mark.xfail(
            reason="e4m3 cotangent saturation through the f8 graph edge",
            strict=False)),
        "e5m2"])
    def test_bf16_train_active_and_grads_flow(self, mode):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3),
                        jnp.bfloat16)
        net_ref = self._net(jnp.bfloat16, remat="branch")
        net_q = self._net(jnp.bfloat16, act_store=mode, remat="branch")
        vs = net_ref.init(jax.random.key(0), x, train=True)
        y_ref = self._train_fwd(net_ref, vs, x)
        y_q = self._train_fwd(net_q, vs, x)
        assert float(jnp.max(jnp.abs(y_ref - y_q))) > 0.0  # active

        def loss(p):
            out, _ = net_q.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(t.astype(jnp.float32).sum()
                       for t in jax.tree_util.tree_leaves(out))

        g = jax.jit(jax.grad(loss))(vs["params"])
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))

    def test_bf16_eval_and_nonremat_bit_identical(self):
        # the advisor-r4 medium finding: the flag must not perturb eval
        # forwards (parity suites) or non-remat train forwards
        x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3),
                        jnp.bfloat16)
        net_ref = self._net(jnp.bfloat16, remat="branch")
        net_q = self._net(jnp.bfloat16, act_store="fp8", remat="branch")
        vs = net_ref.init(jax.random.key(0), x, train=True)
        np.testing.assert_array_equal(
            np.asarray(net_ref.apply(vs, x, train=False)[0]),
            np.asarray(net_q.apply(vs, x, train=False)[0]))
        # act_store without branch remat: train forward also untouched
        net_plain = self._net(jnp.bfloat16)
        net_qplain = self._net(jnp.bfloat16, act_store="fp8")
        np.testing.assert_array_equal(
            np.asarray(self._train_fwd(net_plain, vs, x)),
            np.asarray(self._train_fwd(net_qplain, vs, x)))

    def test_f32_bit_identical_with_flag_set(self):
        x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3),
                        jnp.float32)
        net_ref = self._net(jnp.float32, remat="branch")
        net_q = self._net(jnp.float32, act_store="fp8", remat="branch")
        params = net_ref.init(jax.random.key(0), x, train=True)
        np.testing.assert_array_equal(
            np.asarray(self._train_fwd(net_ref, params, x)),
            np.asarray(self._train_fwd(net_q, params, x)))

    def test_env_resolved_at_construction(self, monkeypatch):
        from stil_tta_tpu.models.resnet import image_encoder, \
            resolve_act_store
        monkeypatch.setenv("STIL_RESNET_ACT_STORE", "e5m2")
        assert resolve_act_store() == "e5m2"
        net = image_encoder("resnet18", remat="branch")
        assert net.act_store == "e5m2"
        monkeypatch.setenv("STIL_RESNET_ACT_STORE", "bogus")
        assert resolve_act_store() == "0"
        monkeypatch.delenv("STIL_RESNET_ACT_STORE", raising=False)
        # env changes after construction don't touch the built model
        assert net.act_store == "e5m2"
