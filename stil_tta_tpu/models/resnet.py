"""TPU-native ResNet family (Flax).

Functional parity target: the vendored torchvision-style ResNet of the
reference (``/root/reference/models/resnets.py:135-269``): conv1 7x7/2,
BN, ReLU, maxpool 3x3/2, four stages of BasicBlock/Bottleneck, and either
``return_all_feature_maps`` -> [x0..x4] (``resnets.py:254-260``) or a
single pooled feature [x0] (``resnets.py:261-269``).

TPU-first design choices (not a translation):
- NHWC layout throughout (XLA's native conv layout on TPU).
- bf16 activations / f32 params + f32 BN statistics: convs hit the MXU at
  full rate while keeping torchvision-compatible numerics for parity
  checks at eval.
- BatchNorm running stats follow torch semantics (momentum 0.1 on the
  *new* value, eps 1e-5), so converted torch checkpoints evaluate
  identically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

ModuleDef = Any


def _conv_out(x):
    """Remat annotation: raw conv outputs are the minimal save set for
    the backward pass (BN backward reads them anyway); post-BN/ReLU
    activations are recomputed from them on the fly under
    ``remat='branch'``. No-op outside a remat context."""
    return checkpoint_name(x, "conv_out")

# torch nn.BatchNorm2d: running = (1-0.1)*running + 0.1*batch  -> momentum=0.9
class TorchBatchNorm(nn.Module):
    """flax-equivalent BatchNorm with torch's running-stat update.

    Numerics match ``nn.BatchNorm`` (f32 fast-variance statistics,
    normalisation computed in ``dtype``) except the running_var update,
    which applies torch's Bessel correction: ``nn.BatchNorm2d`` stores
    the *unbiased* batch variance (var * n/(n-1)) in running_var while
    normalising by the biased one. flax lerps the biased variance, a
    per-step relative drift of 1/(n-1) on the update term — invisible in
    training but a train-step golden-parity mismatch.
    """

    use_running_average: bool
    momentum: float = 0.9      # decay of the old value (torch 1 - 0.1)
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (feat,),
                           self.param_dtype)
        bias = self.param('bias', nn.initializers.zeros, (feat,),
                          self.param_dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
            # tiny per-channel stats: saved under remat='branch' so the
            # backward recompute of normalize/relu is reduction-free
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                n = x.size // feat
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)
        dtype = self.dtype or x.dtype
        mul = (jax.lax.rsqrt(var.astype(dtype) + jnp.asarray(
            self.epsilon, dtype)) * scale.astype(dtype))
        return ((x.astype(dtype) - mean.astype(dtype)) * mul
                + bias.astype(dtype))


BN = partial(TorchBatchNorm, momentum=0.9, epsilon=1e-5,
             param_dtype=jnp.float32)


def make_bn(impl: str, use_running_average: bool, dtype, name: str):
    """BatchNorm factory: 'flax' (XLA reductions) or 'pallas'
    (single-pass stat kernels, ops/batch_norm.py). Measured on v5e the
    flax path is faster (XLA fuses the stat reductions WITH the
    normalise/grad elementwise work into single passes; splitting them
    out costs extra activation reads — docs/BENCHMARKS.md), so 'auto'
    resolves to 'flax'. The pallas implementation stays available and
    tested for shapes where XLA's schedule regresses."""
    if impl == "auto":
        impl = "flax"
    if impl == "pallas":
        from stil_tta_tpu.ops.batch_norm import TPUBatchNorm
        return TPUBatchNorm(use_running_average=use_running_average,
                            dtype=dtype, name=name)
    return BN(use_running_average=use_running_average, dtype=dtype,
              name=name)


def torch_kaiming_conv_init(key, shape, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out', nonlinearity='relu') as in
    ``resnets.py:195-197``. Flax conv kernels are (kh, kw, cin, cout); torch
    fan_out = cout * kh * kw."""
    fan_out = shape[-1] * shape[0] * shape[1]
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


Conv = partial(nn.Conv, use_bias=False, kernel_init=torch_kaiming_conv_init,
               param_dtype=jnp.float32)


class BasicBlock(nn.Module):
    """``resnets.py:50-88``."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    bn_impl: str = "auto"
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _conv_out(Conv(self.planes, (3, 3), strides=self.stride,
                             padding=1, dtype=self.dtype, name="conv1")(x))
        out = make_bn(self.bn_impl, not train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv_out(Conv(self.planes, (3, 3), padding=1,
                             dtype=self.dtype, name="conv2")(out))
        out = make_bn(self.bn_impl, not train, self.dtype, "bn2")(out)
        if self.downsample:
            identity = _conv_out(Conv(self.planes, (1, 1),
                                      strides=self.stride, dtype=self.dtype,
                                      name="downsample_conv")(x))
            identity = make_bn(self.bn_impl, not train, self.dtype,
                          "downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """``resnets.py:91-132`` (torchvision v1.5: stride on the 3x3 conv)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.bfloat16
    bn_impl: str = "auto"
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = _conv_out(Conv(width, (1, 1), dtype=self.dtype,
                             name="conv1")(x))
        out = make_bn(self.bn_impl, not train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv_out(Conv(width, (3, 3), strides=self.stride, padding=1,
                             feature_group_count=self.groups,
                             dtype=self.dtype, name="conv2")(out))
        out = make_bn(self.bn_impl, not train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = _conv_out(Conv(self.planes * self.expansion, (1, 1),
                             dtype=self.dtype, name="conv3")(out))
        out = make_bn(self.bn_impl, not train, self.dtype, "bn3")(out)
        if self.downsample:
            identity = _conv_out(Conv(self.planes * self.expansion, (1, 1),
                                      strides=self.stride, dtype=self.dtype,
                                      name="downsample_conv")(x))
            identity = make_bn(self.bn_impl, not train, self.dtype,
                          "downsample_bn")(identity)
        return nn.relu(out + identity)


def _space_to_depth_conv1(x, kernel, dtype):
    """conv 7x7/s2/p3 on 3 channels, computed as a 4x4/s1 conv on the
    2x2 space-to-depth input.

    The MXU wants deep contractions; a 3-channel conv runs at ~3/128
    efficiency. Re-laying the input as (H/2, W/2, 12) and scattering the
    (7,7,3,O) kernel into an equivalent (4,4,12,O) kernel is *exactly*
    the same sum (out[i,j] = sum W[2p+a+3, 2q+b+3, c] x[2(i+p)+a, ...])
    with a 16x deeper contraction. Parameters keep the torch-compatible
    (7,7,3,O) layout; the transform happens in-graph at trace time.
    """
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    # scatter W[di,dj,c,o] -> W'[p+2,q+2,(a*2+b)*c..,o], di=2p+a+3
    kp = jnp.zeros((4, 4, 2, 2, c, o), kernel.dtype)
    for di in range(7):
        p, a = divmod(di - 3 + 4, 2)  # di-3 = 2(p-2)+a
        for dj in range(7):
            q, bb = divmod(dj - 3 + 4, 2)
            kp = kp.at[p, q, a, bb].set(kernel[di, dj])
    kp = kp.reshape(4, 4, 4 * c, o)
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), kp.astype(dtype), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _StemKernel(nn.Module):
    """Owns the (7,7,C,64) conv1 kernel at the torch-compatible tree
    path ``conv1/kernel`` for the space-to-depth stem."""

    in_ch: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kaiming_conv_init,
                          (7, 7, self.in_ch, 64))


class ResNet(nn.Module):
    """NHWC ResNet with the reference's dual output contract.

    ``__call__`` returns a list: ``[x0..x4]`` feature maps when
    ``return_all_feature_maps`` (``resnets.py:254-260``) else ``[pooled]``
    (``resnets.py:261-269``). Inputs are (B, H, W, 3) float.
    """

    block: ModuleDef
    layers: Sequence[int]
    return_all_feature_maps: bool = False
    groups: int = 1
    width_per_group: int = 64
    first_conv: bool = True
    maxpool1: bool = True
    space_to_depth: bool = True  # MXU-efficient stem (exact math)
    # rematerialisation mode for residual blocks:
    #   False    — save everything autodiff wants (XLA default)
    #   'full'   — recompute the whole block in backward (r1: slower on
    #              v5e, the 3x3 conv recompute costs more than it saves)
    #   'branch' — save only raw conv outputs + BN stats; recompute the
    #              normalize/relu elementwise chains in backward. The
    #              backward needs the raw conv outputs for BN grads
    #              anyway, so this halves saved-activation HBM traffic
    #              at zero extra MXU work (numerics identical).
    remat: Any = False
    # restrict remat to these stage indices (0..3); None = all stages.
    # Motivation: stage 0 owns the narrow width-64 tensors whose
    # batch-minor layouts make its join fusions the slowest kernels.
    remat_stages: Any = None
    bn_impl: str = "auto"  # 'pallas' fused stats on TPU, 'flax' else
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        if self.first_conv:
            if self.space_to_depth and x.shape[1] % 2 == 0 \
                    and x.shape[2] % 2 == 0:
                kernel = _StemKernel(in_ch=x.shape[-1],
                                     name="conv1")()
                x = _space_to_depth_conv1(x, kernel, self.dtype)
            else:
                x = Conv(64, (7, 7), strides=2, padding=3,
                         dtype=self.dtype, name="conv1")(x)
        else:
            x = Conv(64, (3, 3), strides=1, padding=1, dtype=self.dtype,
                     name="conv1")(x)
        x = make_bn(self.bn_impl, not train, self.dtype, "bn1")(x)
        x0 = nn.relu(x)
        if self.maxpool1:
            x0 = nn.max_pool(x0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = [x0]
        x = x0
        in_planes = 64
        if self.remat == "branch":
            block_cls = nn.remat(
                self.block, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "bn_stats"))
        elif self.remat:
            block_cls = nn.remat(self.block, static_argnums=(2,))
        else:
            block_cls = self.block
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            cls = block_cls if (self.remat_stages is None
                                or stage in self.remat_stages) \
                else self.block
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = b == 0 and (
                    s != 1 or in_planes != planes * self.block.expansion)
                x = cls(planes=planes, stride=s, downsample=needs_ds,
                        dtype=self.dtype, bn_impl=self.bn_impl,
                        name=f"layer{stage + 1}_{b}")(x, train)
            in_planes = planes * self.block.expansion
            feats.append(x)

        if self.return_all_feature_maps:
            return feats
        pooled = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
        return [pooled]


def resnet18(**kw):
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def resnet152(**kw):
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), **kw)


def resnext50_32x4d(**kw):
    """``resnets.py:344-352``."""
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), groups=32,
                  width_per_group=4, **kw)


def resnext101_32x8d(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), groups=32,
                  width_per_group=8, **kw)


def wide_resnet50_2(**kw):
    """``resnets.py:356-371`` (width_per_group doubled)."""
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3),
                  width_per_group=128, **kw)


def wide_resnet101_2(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3),
                  width_per_group=128, **kw)


_ENCODERS: dict[str, Callable[..., ResNet]] = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnext50_32x4d": resnext50_32x4d,
    "resnext101_32x8d": resnext101_32x8d,
    "wide_resnet50_2": wide_resnet50_2,
    "wide_resnet101_2": wide_resnet101_2,
}

EMBEDDING_DIM = {  # pooled_dim per encoder (``STiLModel.py:37``)
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "resnext50_32x4d": 2048,
    "resnext101_32x8d": 2048,
    "wide_resnet50_2": 2048,
    "wide_resnet101_2": 2048,
    "vit_small": 384,
    "vit_base": 768,
}


def image_encoder(name: str, return_all_feature_maps: bool = False,
                  dtype: Any = jnp.bfloat16, remat: Any = None):
    """``torchvision_ssl_encoder`` equivalent
    (``models/self_supervised.py:8-15``): encoder with no fc head.
    Unlike the reference, vit_small/vit_base resolve to a real encoder
    (the reference ships those configs but no implementation —
    SURVEY.md §2.8).

    ``remat`` (ResNets only): None resolves from ``STIL_RESNET_REMAT``
    ('branch' | 'full' | '0', default off) — see :class:`ResNet`.
    """
    if name.startswith("vit"):
        from stil_tta_tpu.models import vit
        ctor = {"vit_small": vit.vit_small, "vit_base": vit.vit_base}
        if name not in ctor:
            raise ValueError(f"Unknown ViT variant '{name}'")
        return ctor[name](return_all_feature_maps=return_all_feature_maps,
                          dtype=dtype)
    if name not in _ENCODERS:
        raise ValueError(
            f"Unknown image encoder '{name}'. Available: "
            f"{sorted(_ENCODERS)}")
    stages = None
    if remat is None:
        import os
        env = os.environ.get("STIL_RESNET_REMAT", "0")
        # e.g. 'branch', 'full', 'branch:0', 'branch:0,1'
        if ":" in env:
            env, _, st = env.partition(":")
            stages = tuple(int(s) for s in st.split(",") if s)
        remat = env if env in ("branch", "full") else False
    return _ENCODERS[name](return_all_feature_maps=return_all_feature_maps,
                           dtype=dtype, remat=remat, remat_stages=stages)
