"""Layout-uniformity channel padding (``ResNet.min_channels``) is
mathematically invisible: parameters keep torch-compatible shapes at the
same tree paths, and outputs / gradients / BN running stats match the
unpadded model exactly (padding is weight-side zeros — PadConv +
TorchBatchNorm.real_feat). Also pins the groups/width_per_group
forwarding fixed in round 3 (wide/resnext variants previously collapsed
to plain resnet50)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stil_tta_tpu.models.resnet import (
    resnet18, resnet50, resnext50_32x4d, wide_resnet50_2)


def _tree_allclose(a, b, rtol=0.0, atol=0.0):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, x), y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            rtol=rtol, atol=atol, err_msg=str(path))


@pytest.mark.parametrize("ctor", [resnet18, resnet50])
def test_min_channels_exact_equivalence(ctor):
    """f64 end-to-end: padding must be *mathematically* invisible.

    In f32 the padded model's deeper (128-lane) contractions tile
    differently and the reassociation noise gets amplified through the
    per-layer BN rescalings (~4e-4 at the head of resnet18, ~1e-2 for
    resnet50 — measured); in f64 that noise floor collapses and any
    genuine asymmetry would stand out. The only remaining f32 path is
    TorchBatchNorm's internal statistics (by design), which bounds the
    tolerances below.
    """
    from contextlib import contextmanager

    @contextmanager
    def enable_x64():  # jax 0.9 removed jax.experimental.enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3),
                              jnp.float64)
        base = ctor(dtype=jnp.float64, min_channels=0)
        padded = ctor(dtype=jnp.float64, min_channels=128)

        vb = base.init(jax.random.key(0), x, True)
        vp = padded.init(jax.random.key(0), x, True)
        # identical param/stat trees (shapes AND values: same draws)
        assert (jax.tree_util.tree_structure(vb)
                == jax.tree_util.tree_structure(vp))
        _tree_allclose(vb, vp)
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, t)
        vb, vp = cast(vb), cast(vp)

        def run(model, variables, train):
            out, mut = model.apply(variables, x, train,
                                   mutable=["batch_stats"])
            return out[0], mut["batch_stats"]

        pooled_b, stats_b = run(base, vb, True)
        pooled_p, stats_p = run(padded, vp, True)
        assert pooled_b.shape == pooled_p.shape
        np.testing.assert_allclose(np.asarray(pooled_b),
                                   np.asarray(pooled_p),
                                   rtol=1e-7, atol=1e-9)
        _tree_allclose(stats_b, stats_p, rtol=1e-6, atol=1e-9)

        # eval mode (running stats path)
        eb, _ = run(base, vb, False)
        ep, _ = run(padded, vp, False)
        np.testing.assert_allclose(np.asarray(eb), np.asarray(ep),
                                   rtol=1e-7, atol=1e-9)

        # gradients of a scalar loss w.r.t. every parameter match
        def loss(params, model, variables):
            out, _ = model.apply({**variables, "params": params}, x, True,
                                 mutable=["batch_stats"])
            return jnp.sum(out[0] ** 2)

        gb = jax.grad(loss)(vb["params"], base, vb)
        gp = jax.grad(loss)(vp["params"], padded, vp)
        # normwise per-leaf (grads reach O(5e3); the BN-internal f32
        # stats keep the floor at ~1e-7 relative — f64 probe: 4e-8)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gb),
                                jax.tree_util.tree_leaves(gp)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
            assert rel < 1e-6, (jax.tree_util.keystr(path), rel)


def test_padded_channels_exactly_zero():
    """The structural invariant behind the equivalence: every padded
    activation channel is exactly 0.0 in train and eval modes (so the
    padding contributes exactly nothing to any downstream contraction,
    independent of float reassociation)."""
    from stil_tta_tpu.models.resnet import Bottleneck, PadConv, \
        TorchBatchNorm

    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 256), jnp.float32)

    blk = Bottleneck(planes=64, min_channels=128, dtype=jnp.float32,
                     parent=None)
    v = blk.init(jax.random.key(0), x, True)
    # params stay torch-shaped even though the activation is 128 wide
    assert v["params"]["conv1"]["kernel"].shape == (1, 1, 256, 64)
    assert v["params"]["conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert v["batch_stats"]["bn1"]["mean"].shape == (64,)

    # direct functional check on PadConv + padded BN
    pc = PadConv(features=64, kernel_size=(1, 1), pad_out=128,
                 dtype=jnp.float32)
    vpc = pc.init(jax.random.key(0), x)
    y = pc.apply(vpc, x)
    assert y.shape[-1] == 128
    assert np.all(np.asarray(y[..., 64:]) == 0.0)
    bn = TorchBatchNorm(use_running_average=False, real_feat=64,
                        dtype=jnp.float32)
    vbn = bn.init(jax.random.key(0), y)
    z, mut = bn.apply(vbn, y, mutable=["batch_stats"])
    assert np.all(np.asarray(z[..., 64:]) == 0.0)
    assert mut["batch_stats"]["mean"].shape == (64,)
    bn_e = TorchBatchNorm(use_running_average=True, real_feat=64,
                          dtype=jnp.float32)
    ze = bn_e.apply(vbn, y)
    assert np.all(np.asarray(ze[..., 64:]) == 0.0)


def test_min_channels_feature_map_contract():
    """return_all_feature_maps keeps the reference channel widths
    (``resnets.py:254-260``) — padding never leaks to callers."""
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    base = resnet50(dtype=jnp.float32, return_all_feature_maps=True)
    padded = resnet50(dtype=jnp.float32, return_all_feature_maps=True,
                      min_channels=128)
    vb = base.init(jax.random.key(0), x, False)
    fb = base.apply(vb, x, False)
    fp = padded.apply(vb, x, False)
    assert [f.shape for f in fb] == [f.shape for f in fp]
    assert fb[0].shape[-1] == 64


def test_wide_and_resnext_widths():
    """groups/width_per_group reach the blocks (round-3 fix: they were
    dropped, so wide_resnet50_2/resnext built plain resnet50 —
    ``resnets.py:344-371`` widths)."""
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    wide = wide_resnet50_2(dtype=jnp.float32).init(jax.random.key(0), x,
                                                   False)
    k = wide["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 128, 128)
    # expansion output stays 256 like resnet50
    assert wide["params"]["layer1_0"]["conv3"]["kernel"].shape[-1] == 256

    xt = resnext50_32x4d(dtype=jnp.float32).init(jax.random.key(0), x,
                                                 False)
    k = xt["params"]["layer1_0"]["conv2"]["kernel"]
    # grouped conv: (kh, kw, width/groups, width), width = 4 * 32
    assert k.shape == (3, 3, 4, 128)

    r50 = resnet50(dtype=jnp.float32).init(jax.random.key(0), x, False)
    n = lambda t: sum(int(np.prod(p.shape))
                      for p in jax.tree_util.tree_leaves(t))
    assert n(wide["params"]) > 2 * n(r50["params"])


def test_min_channels_batchblock_residual_shapes():
    """BasicBlock stage-0 joins (padded out + padded identity) and the
    stage-1 downsample transition compile and keep the pooled width."""
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    m = resnet18(dtype=jnp.float32, min_channels=128)
    v = m.init(jax.random.key(0), x, False)
    out = m.apply(v, x, False)
    assert out[0].shape == (2, 512)
