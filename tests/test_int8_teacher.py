"""int8 teacher fast path (``teacher_int8`` / models/resnet.py int8).

Contract: the dynamically-quantized eval convs stay within int8
rounding error per conv, the ResNet int8 eval forward tracks the bf16
forward closely end-to-end, the STiL train step runs with the flag on
(finite losses, same state tree), and with the flag OFF every forward
is bit-identical to before (the default path never touches the quant
code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stil_tta_tpu.models.resnet import (Conv, QuantConv, quant_conv_apply,
                                        resnet18)


class TestQuantConv:
    def test_per_conv_error_bound(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(4, 16, 16, 32), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, 32, 64) * 0.1, jnp.float32)
        y_ref = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y_q = quant_conv_apply(x, w, 1, 1, jnp.float32)
        # per-tensor act + per-channel weight quantization: error is a
        # sum of ~K zero-mean int8 rounding terms; relative L2 stays
        # well under 2% at these shapes
        rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 0.02, rel

    def test_param_tree_matches_conv(self):
        x = jnp.zeros((2, 8, 8, 16), jnp.bfloat16)
        p_ref = Conv(24, (3, 3), strides=1, padding=1).init(
            jax.random.key(0), x)
        p_q = QuantConv(features=24, kernel_size=(3, 3), strides=1,
                        padding=1).init(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(p_ref)
                == jax.tree_util.tree_structure(p_q))
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_q)):
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResNetInt8Eval:
    def test_eval_forward_tracks_bf16(self):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.bfloat16)
        net = resnet18(dtype=jnp.bfloat16)
        vs = net.init(jax.random.key(0), x, train=True)
        y_ref = net.apply(vs, x, train=False)[0].astype(jnp.float32)
        y_q = net.apply(vs, x, train=False, int8=True)[0].astype(
            jnp.float32)
        assert float(jnp.max(jnp.abs(y_ref - y_q))) > 0.0  # engaged
        cos = float(jnp.sum(y_ref * y_q)
                    / (jnp.linalg.norm(y_ref) * jnp.linalg.norm(y_q)))
        assert cos > 0.99, cos

    def test_flag_off_bit_identical(self):
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(2, 32, 32, 3), jnp.bfloat16)
        net = resnet18(dtype=jnp.bfloat16)
        vs = net.init(jax.random.key(0), x, train=True)
        np.testing.assert_array_equal(
            np.asarray(net.apply(vs, x, train=False)[0]),
            np.asarray(net.apply(vs, x, train=False, int8=False)[0]))
        # train mode ignores the flag entirely
        o1, _ = net.apply(vs, x, train=True, int8=True,
                          mutable=["batch_stats"])
        o2, _ = net.apply(vs, x, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))


@pytest.mark.slow
def test_stil_step_with_int8_teacher_runs():
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.data.loader import DeviceCache
    from stil_tta_tpu.data.source import synthetic_source

    field_lengths = [4, 3] + [1] * 3
    cfg = load_config("config_dvm_STiL", overrides=[
        "dataset=synthetic_dvm", "models=resnet18", "batch_size=8",
        "num_classes=4", "img_size=32", "start_epoch=0", "tta=false",
        "tabular_embedding_dim=32", "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "teacher_int8=true",
    ])
    cfg.field_lengths = field_lengths
    cfg.repeat_ratio = 1
    src_l = synthetic_source(16, num_classes=4,
                             field_lengths=field_lengths,
                             image_size=32, labelled_frac=1.0, seed=0)
    src_u = synthetic_source(32, num_classes=4,
                             field_lengths=field_lengths,
                             image_size=32, labelled_frac=0.0, seed=1)
    algo = get_algorithm(cfg.algorithm_name)(cfg, field_lengths)
    assert algo.net.teacher_int8 is True
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    state = algo.init_state(jax.random.key(0),
                            jnp.zeros((2, 32, 32, 3)),
                            jnp.asarray(src_l.tabular[:2]))
    step = algo.make_train_step()
    idx_l = jnp.arange(1, dtype=jnp.int32)
    idx_u = jnp.arange(7, dtype=jnp.int32)
    state = step(state, cache_l, cache_u, idx_l, idx_u,
                 jnp.asarray(1, jnp.int32))
    assert int(state.step) == 1
    for k, v in state.log_sums.items():
        assert bool(jnp.isfinite(v)), k
