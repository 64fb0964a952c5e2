"""Pallas-fused BatchNorm correctness (interpret mode on CPU): forward
values, gradients, and running statistics against flax/torch
references."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from stil_tta_tpu.ops.batch_norm import TPUBatchNorm, bn_stats, bn_train


def test_bn_stats_kernel():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 16).astype(np.float32)
    s, ss = bn_stats(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s)[0], x.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss)[0], (x * x).sum(0),
                               rtol=1e-5)


def test_bn_train_matches_torch_forward_and_grads():
    rng = np.random.RandomState(1)
    x = rng.randn(32, 8).astype(np.float32)
    scale = rng.rand(8).astype(np.float32) + 0.5
    bias = rng.randn(8).astype(np.float32)

    tx = torch.tensor(x, requires_grad=True)
    tbn = torch.nn.BatchNorm1d(8, eps=1e-5)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))
    ty = tbn(tx)
    # an asymmetric scalar so dx is nontrivial
    w = torch.tensor(rng.randn(32, 8).astype(np.float32))
    (ty * w).sum().backward()

    def f(x2d, s, b):
        y, mean, var = bn_train(x2d, s, b, 1e-5)
        return (y * jnp.asarray(w.numpy())).sum(), (y, mean, var)

    (loss, (y, mean, var)), grads = jax.value_and_grad(
        f, argnums=(0, 1, 2), has_aux=True)(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    dx, dscale, dbias = grads

    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), x.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x.var(0), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), tx.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dscale),
                               tbn.weight.grad.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dbias), tbn.bias.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_tpu_batchnorm_module_running_stats_torch_semantics():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 6, 8).astype(np.float32)
    m = TPUBatchNorm(use_running_average=False, dtype=jnp.float32)
    vs = m.init(jax.random.key(0), jnp.asarray(x))
    y, mut = m.apply(vs, jnp.asarray(x), mutable=["batch_stats"])
    flat = x.reshape(-1, 8)
    n = flat.shape[0]
    expected_mean = 0.1 * flat.mean(0)
    expected_var = 0.9 * 1.0 + 0.1 * flat.var(0) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               expected_mean, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               expected_var, rtol=1e-4)
    # eval mode uses running stats (shape-preserving, finite)
    m_eval = TPUBatchNorm(use_running_average=True, dtype=jnp.float32)
    y2 = m_eval.apply({"params": vs["params"],
                       "batch_stats": mut["batch_stats"]}, jnp.asarray(x))
    assert y2.shape == x.shape and np.isfinite(np.asarray(y2)).all()


def test_resnet_pallas_bn_matches_flax_bn():
    from stil_tta_tpu.models.resnet import resnet18
    # 64x64 keeps the deepest stage's reduction count at n=16 so the
    # pallas impl's torch-style unbiased running var stays within a few
    # percent of flax's biased convention
    x = jnp.asarray(np.random.RandomState(3).rand(4, 64, 64, 3),
                    jnp.float32)
    m_f = resnet18(dtype=jnp.float32, bn_impl="flax")
    m_p = resnet18(dtype=jnp.float32, bn_impl="pallas")
    v = m_f.init(jax.random.key(0), x, train=False)
    v2 = m_p.init(jax.random.key(0), x, train=False)
    # identical variable trees (same names/shapes) => interchangeable
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    (yf,), mf = m_f.apply(v, x, train=True, mutable=["batch_stats"])
    (yp,), mp = m_p.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), rtol=2e-3,
                               atol=2e-3)
    # running means agree; running var differs only by the unbiased
    # correction (torch semantics in the pallas impl)
    mfs = jax.tree_util.tree_leaves(mf["batch_stats"])
    mps = jax.tree_util.tree_leaves(mp["batch_stats"])
    for a, b in zip(mfs, mps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)
