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

from stil_tta_tpu.losses.common import at_least_f32

ModuleDef = Any


def resolve_act_store(act_store: Any = None) -> str:
    """``STIL_RESNET_ACT_STORE``: '0' (default, bf16 saved residuals) |
    'fp8' / 'e4m3' | 'e5m2'. Resolved ONCE at model construction by
    :func:`image_encoder` (like ``remat`` / ``min_channels``) and
    threaded as a module field — changing the env var after a model is
    built (or a step is jitted) has no effect. Only meaningful under
    ``remat='branch'`` and ``train=True`` — see :func:`_conv_out`."""
    if act_store is not None:
        act_store = str(act_store)
        if act_store not in ("0", "fp8", "e4m3", "e5m2"):
            raise ValueError(
                f"act_store must be one of '0'/'fp8'/'e4m3'/'e5m2', "
                f"got {act_store!r}")
        return act_store
    import os
    env = os.environ.get("STIL_RESNET_ACT_STORE", "0")
    return env if env in ("fp8", "e4m3", "e5m2") else "0"


def _conv_out(x, mode: str = "0"):
    """Remat annotation: raw conv outputs are the minimal save set for
    the backward pass (BN backward reads them anyway); post-BN/ReLU
    activations are recomputed from them on the fly under
    ``remat='branch'``. No-op outside a remat context.

    ``mode`` in ('fp8'/'e4m3', 'e5m2') (experimental, perf-measurement
    lane — VERDICT r3 #1 / round-4 headroom notes): the residual
    carrying the ``conv_out`` name becomes a per-channel-scaled float8
    tensor (+ a tiny f32 scale under ``bn_stats``), halving the
    saved-activation HBM bytes vs bf16. The forward continues with the
    quantize-dequantize value, i.e. this IS a train-forward numerics
    change (~2^-3 relative rounding per element for e4m3, zero-mean)
    and must pass the ±0.3% convergence gate
    (tools/convergence_micro.py) before any headline adoption.
    :class:`ResNet` only passes a non-'0' mode to blocks that are
    actually branch-remat'd, and blocks drop it when ``train=False`` —
    eval forwards and non-remat configs are bit-identical with the
    flag set. Never active at f32/f64 (parity suites)."""
    if mode in ("fp8", "e4m3", "e5m2") and x.dtype == jnp.bfloat16:
        f8 = jnp.float8_e5m2 if mode == "e5m2" else jnp.float8_e4m3fn
        fmax = 57344.0 if mode == "e5m2" else 448.0
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / fmax
        q = checkpoint_name((xf / scale).astype(f8), "conv_out")
        scale = checkpoint_name(scale, "bn_stats")
        # dequantize in f32 (quantization divided by the f32 scale; a
        # bf16 multiply would add an asymmetric extra rounding)
        return (q.astype(jnp.float32) * scale).astype(x.dtype)
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

    ``real_feat``: when the input carries zero-padded lane-alignment
    channels (``min_channels`` on :class:`ResNet`), params and running
    stats keep the torch-compatible width ``real_feat`` and are padded
    in-graph (scale→1, bias→0, mean→0, var→1); padded channels
    normalise to exactly 0 in both train (batch mean=var=0) and eval
    modes, so the padding stays invisible to the math.
    """

    use_running_average: bool
    momentum: float = 0.9      # decay of the old value (torch 1 - 0.1)
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    real_feat: int = 0         # 0 = input width (no padding)

    @nn.compact
    def __call__(self, x):
        feat = self.real_feat or x.shape[-1]
        pad = x.shape[-1] - feat
        assert pad >= 0, (x.shape, feat)
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
            if pad:
                mean = jnp.pad(mean, (0, pad))
                var = jnp.pad(var, (0, pad), constant_values=1.0)
        else:
            # stats in at-least-f32 (f64 inputs keep f64 stats — the
            # f64 equivalence tests rely on it; bf16/f32 unchanged)
            xf = at_least_f32(x)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
            # tiny per-channel stats: saved under remat='branch' so the
            # backward recompute of normalize/relu is reduction-free
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                n = x.size // x.shape[-1]
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean[:feat]
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * (var[:feat] * bessel))
        dtype = self.dtype or x.dtype
        if pad:
            scale = jnp.pad(scale, (0, pad), constant_values=1.0)
            bias = jnp.pad(bias, (0, pad))
        mul = (jax.lax.rsqrt(var.astype(dtype) + jnp.asarray(
            self.epsilon, dtype)) * scale.astype(dtype))
        return ((x.astype(dtype) - mean.astype(dtype)) * mul
                + bias.astype(dtype))


BN = partial(TorchBatchNorm, momentum=0.9, epsilon=1e-5,
             param_dtype=jnp.float32)


def make_bn(impl: str, use_running_average: bool, dtype, name: str,
            real_feat: int = 0):
    """BatchNorm factory: 'flax' (XLA reductions) or 'pallas'
    (single-pass stat kernels, ops/batch_norm.py). Measured on v5e the
    flax path is faster (XLA fuses the stat reductions WITH the
    normalise/grad elementwise work into single passes; splitting them
    out costs extra activation reads — docs/BENCHMARKS.md), so 'auto'
    resolves to 'flax'. The pallas implementation stays available and
    tested for shapes where XLA's schedule regresses.

    ``real_feat`` (channel padding, see :class:`ResNet.min_channels`)
    is flax-only; the pallas kernel falls back to flax when set."""
    if impl == "auto":
        impl = "flax"
    if impl == "pallas" and not real_feat:
        from stil_tta_tpu.ops.batch_norm import TPUBatchNorm
        return TPUBatchNorm(use_running_average=use_running_average,
                            dtype=dtype, name=name)
    return BN(use_running_average=use_running_average, dtype=dtype,
              name=name, real_feat=real_feat)


def torch_kaiming_conv_init(key, shape, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out', nonlinearity='relu') as in
    ``resnets.py:195-197``. Flax conv kernels are (kh, kw, cin, cout); torch
    fan_out = cout * kh * kw."""
    fan_out = shape[-1] * shape[0] * shape[1]
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


Conv = partial(nn.Conv, use_bias=False, kernel_init=torch_kaiming_conv_init,
               param_dtype=jnp.float32)


class PadConv(nn.Module):
    """Conv whose kernel is zero-padded in-graph to lane-aligned channel
    widths (the ``min_channels`` layout fix, see :class:`ResNet`).

    The parameter keeps the torch-compatible shape
    ``(kh, kw, real_in, features)`` at the same tree path as
    :data:`Conv` (``<name>/kernel``) — checkpoints, converters and the
    EMA teacher are untouched. At trace time the kernel is padded with
    zeros to ``(kh, kw, x_channels, pad_out)``: zero input-channel rows
    ignore the caller's zero-padded activation channels, zero output
    filters produce exactly-zero padded channels, and autodiff slices
    the gradient back to the real region — bit-identical math with a
    physically 128-wide activation that XLA lays out channel-minor like
    every other tensor in the network (round-2 smoking gun:
    NOTES_ROUND2.md, mixed batch-minor/channel-minor joins).
    """

    features: int                 # real cout (param width)
    kernel_size: Any
    strides: int = 1
    padding: int = 0
    real_in: int = 0              # real cin (param depth); 0 = x width
    pad_out: int = 0              # physical cout; 0/<=features = features
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = self.real_in or x.shape[-1]
        assert x.shape[-1] >= cin, (x.shape, cin)
        kernel = self.param("kernel", torch_kaiming_conv_init,
                            (kh, kw, cin, self.features), self.param_dtype)
        pad_in = x.shape[-1] - cin
        pad_out = max(self.pad_out, self.features) - self.features
        if pad_in or pad_out:
            kernel = jnp.pad(kernel,
                             ((0, 0), (0, 0), (0, pad_in), (0, pad_out)))
        s = self.strides
        p = self.padding
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(s, s), padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Dot1x1(nn.Module):
    """1x1 conv expressed as a 2-D matmul over flattened pixel rows.

    Same parameter (``kernel``, shape (1, 1, cin, cout)) at the same
    tree path as :data:`Conv` — checkpoint/converter compatible, math
    identical (a stride-s 1x1 conv reads x[::s, ::s] exactly).

    Why: XLA's TPU conv emitter packs the batch dimension into sublanes
    for sub-128-channel operands (``EmitAllInputFeatureInSublanes
    OutputBatchInSublanes...``), which runs the stage-1 bottleneck 1x1
    backward at ~2% MFU (~1.9 ms each for 17 GFLOP at the bench shape).
    A flattened (B*H*W, cin) x (cin, cout) dot takes the standard
    matmul path with well-tiled 2-D layouts instead.
    """

    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_kaiming_conv_init,
                            (1, 1, cin, self.features), self.param_dtype)
        s = self.strides
        if s != 1:
            x = x[:, ::s, ::s, :]
        b, h, w, _ = x.shape
        y = (x.astype(self.dtype).reshape(b * h * w, cin)
             @ kernel.reshape(cin, self.features).astype(self.dtype))
        return y.reshape(b, h, w, self.features)


class ConvDotBwd1x1(nn.Module):
    """1x1 conv: conv forward (keeps XLA's conv/BN-stat fusions) with a
    flattened-matmul backward (``ops.conv1x1``). Same param tree as
    :data:`Conv`."""

    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from stil_tta_tpu.ops.conv1x1 import conv1x1_dotbwd
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_kaiming_conv_init,
                            (1, 1, cin, self.features), self.param_dtype)
        return conv1x1_dotbwd(x.astype(self.dtype),
                              kernel.astype(self.dtype), self.strides)


def quant_conv_apply(x, kernel, strides, padding, out_dtype,
                     groups: int = 1):
    """Dynamically-quantized int8 convolution: per-output-channel
    symmetric weight scales, per-tensor symmetric activation scale,
    s8 x s8 -> s32 MXU conv, dequantized epilogue.

    The v5e MXU runs int8 contractions at ~2x the bf16 rate (measured
    1.8-1.9x on bench-shaped convs, docs/BENCHMARKS.md round-5). Used
    by the ``int8`` eval forward (teacher/inference path only — never
    under training BN or autodiff; the quantization is a documented
    numerics change gated by the convergence study).

    NOTE the activation scale is dynamic PER BATCH (amax over the whole
    input tensor): a sample's quantized outputs depend on what it was
    batched with, so int8 predictions are batch-composition-dependent
    (bounded by the int8 rounding band, but not per-sample
    reproducible across batch sizes), and an int8 teacher's
    pseudo-labels couple weakly across the micro-chunk. Per-sample
    scales would restore independence at the cost of a finer reduction;
    not done while the lane is off-default."""
    wf = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-30)
    w_q = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-30)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    s = strides if isinstance(strides, tuple) else (strides, strides)
    p = padding if isinstance(padding, tuple) else ((padding, padding),) * 2
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=s, padding=p,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    scale = (s_x * s_w.reshape(1, 1, 1, -1)).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


class QuantConv(nn.Module):
    """int8-eval conv: same ``kernel`` parameter (shape, init, tree
    path) as :data:`Conv`, computed via :func:`quant_conv_apply`."""

    features: int
    kernel_size: Any
    strides: int = 1
    padding: int = 0
    groups: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", torch_kaiming_conv_init,
                            (kh, kw, x.shape[-1] // self.groups,
                             self.features), self.param_dtype)
        return quant_conv_apply(x, kernel, self.strides, self.padding,
                                self.dtype, self.groups)


def _dot1x1_mode():
    import os
    return os.environ.get("STIL_RESNET_DOT1X1", "0")


def resolve_maxpool(maxpool_impl: Any = None) -> str:
    """``STIL_RESNET_MAXPOOL=custom``: routing-exact custom-VJP maxpool
    (ops/maxpool.py) instead of XLA reduce_window/select-and-scatter.
    Off by default — measured negative at the bench shape (round 5).
    Resolved ONCE at model construction by :func:`image_encoder` (same
    contract as :func:`resolve_act_store`); env changes after
    construction have no effect."""
    if maxpool_impl is not None:
        maxpool_impl = str(maxpool_impl)
        if maxpool_impl not in ("0", "custom"):
            raise ValueError(
                f"maxpool_impl must be '0' or 'custom', got "
                f"{maxpool_impl!r}")
        return maxpool_impl
    import os
    env = os.environ.get("STIL_RESNET_MAXPOOL", "0")
    return env if env == "custom" else "0"


def _conv(name, features, ksize, stride, padding, groups, dtype,
          in_real, pad_out, x, int8: bool = False):
    """Dispatch to :class:`PadConv` only when channel padding is in play
    for this conv (padded input activation and/or padded output width);
    otherwise the plain :data:`Conv` path keeps the min_channels=0 HLO
    byte-identical to previous rounds (warm compile caches).

    ``int8``: quantized eval conv (:class:`QuantConv`; teacher/inference
    fast path). Falls back to the exact conv when channel padding is in
    play (quantization scales would interact with the zero-pad masks)."""
    needs_pad = ((in_real and in_real != x.shape[-1])
                 or (pad_out and pad_out > features))
    if int8 and not needs_pad:
        return QuantConv(features=features, kernel_size=ksize,
                         strides=stride, padding=padding, groups=groups,
                         dtype=dtype, name=name)(x)
    if needs_pad:
        assert groups == 1, "channel padding unsupported for grouped convs"
        return PadConv(features=features, kernel_size=ksize, strides=stride,
                       padding=padding, real_in=in_real, pad_out=pad_out,
                       dtype=dtype, name=name)(x)
    if tuple(ksize) == (1, 1) and groups == 1 and padding == 0:
        mode = _dot1x1_mode()
        if mode == "1":
            return Dot1x1(features=features, strides=stride, dtype=dtype,
                          name=name)(x)
        if mode == "bwd":
            return ConvDotBwd1x1(features=features, strides=stride,
                                 dtype=dtype, name=name)(x)
    return Conv(features, ksize, strides=stride, padding=padding,
                feature_group_count=groups, dtype=dtype, name=name)(x)


class BasicBlock(nn.Module):
    """``resnets.py:50-88``."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1        # accepted for uniformity; must stay 1
    base_width: int = 64   # (torchvision BasicBlock raises otherwise)
    dtype: Any = jnp.bfloat16
    bn_impl: str = "auto"
    min_channels: int = 0  # pad activations narrower than this (ResNet)
    in_real: int = 0       # real channel width of x (0 = unpadded)
    act_store: str = "0"   # fp8 storage of branch-remat saved residuals
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool, int8: bool = False):
        if self.groups != 1 or self.base_width != 64:
            raise ValueError(
                "BasicBlock only supports groups=1 and base_width=64")
        mc = self.min_channels
        wp = max(self.planes, mc) if mc else self.planes  # physical width
        rf = self.planes if wp != self.planes else 0
        # fp8 residual storage only affects the train forward; eval
        # forwards (parity suites) stay bit-identical (advisor r4)
        am = self.act_store if train else "0"
        q = int8 and not train
        identity = x
        out = _conv_out(_conv("conv1", self.planes, (3, 3), self.stride, 1,
                              1, self.dtype, self.in_real, wp, x, q), am)
        out = make_bn(self.bn_impl, not train, self.dtype, "bn1",
                      real_feat=rf)(out)
        out = nn.relu(out)
        out = _conv_out(_conv("conv2", self.planes, (3, 3), 1, 1, 1,
                              self.dtype, rf, wp, out, q), am)
        out = make_bn(self.bn_impl, not train, self.dtype, "bn2",
                      real_feat=rf)(out)
        if self.downsample:
            identity = _conv_out(_conv("downsample_conv", self.planes,
                                       (1, 1), self.stride, 0, 1,
                                       self.dtype, self.in_real, wp, x,
                                       q), am)
            identity = make_bn(self.bn_impl, not train, self.dtype,
                               "downsample_bn", real_feat=rf)(identity)
        elif identity.shape[-1] != out.shape[-1]:
            # no-downsample block fed an UNPADDED input while the block
            # output is channel-padded (min_channels with pad_stem off):
            # zero-pad the skip — exact, since the padded lanes carry
            # zeros and downstream convs mask them via in_real
            identity = jnp.pad(
                identity,
                ((0, 0),) * 3 + ((0, out.shape[-1] - identity.shape[-1]),))
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
    min_channels: int = 0  # pad activations narrower than this (ResNet)
    in_real: int = 0       # real channel width of x (0 = unpadded)
    act_store: str = "0"   # fp8 storage of branch-remat saved residuals
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool, int8: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        mc = self.min_channels
        wp = max(width, mc) if mc else width  # physical mid width
        rf = width if wp != width else 0
        am = self.act_store if train else "0"
        q = int8 and not train
        identity = x
        out = _conv_out(_conv("conv1", width, (1, 1), 1, 0, 1, self.dtype,
                              self.in_real, wp, x, q), am)
        out = make_bn(self.bn_impl, not train, self.dtype, "bn1",
                      real_feat=rf)(out)
        out = nn.relu(out)
        out = _conv_out(_conv("conv2", width, (3, 3), self.stride, 1,
                              self.groups, self.dtype, rf, wp, out, q), am)
        out = make_bn(self.bn_impl, not train, self.dtype, "bn2",
                      real_feat=rf)(out)
        out = nn.relu(out)
        out = _conv_out(_conv("conv3", self.planes * self.expansion,
                              (1, 1), 1, 0, 1, self.dtype, rf, 0, out, q),
                        am)
        out = make_bn(self.bn_impl, not train, self.dtype, "bn3")(out)
        if self.downsample:
            identity = _conv_out(_conv("downsample_conv",
                                       self.planes * self.expansion,
                                       (1, 1), self.stride, 0, 1,
                                       self.dtype, self.in_real, 0, x,
                                       q), am)
            identity = make_bn(self.bn_impl, not train, self.dtype,
                          "downsample_bn")(identity)
        return nn.relu(out + identity)


def _space_to_depth_conv1(x, kernel, dtype, int8: bool = False):
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
    # NOTE: the stem's weight-grad fusion re-reads xs once per tap
    # (~1.45 ms/step, ~16x minimal traffic). A pallas kernel stacking
    # the 16 tap views into one (rows, 192)x(rows, 64) contraction was
    # attempted in round 3 but Mosaic cannot lower the misaligned
    # 12-channel lane concatenate ("result/input offset mismatch on
    # non-concat dimension"); per-tap dots run the MXU at M=12 and
    # model out slower than XLA. Left to the conv emitter.
    if int8:
        return quant_conv_apply(xs, kp, (1, 1), ((2, 1), (2, 1)), dtype)
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
    # Layout-uniformity channel padding (round-3 perf attack,
    # NOTES_ROUND2.md): zero-pad every activation narrower than this to
    # min_channels physical channels (stem + stage-1 bottleneck mids at
    # 64ch -> 128). XLA stores sub-128-channel NHWC activations
    # batch-minor (2 samples packed into the 128 lanes) but wider ones
    # channel-minor; the mixed layouts throttle the backward
    # residual-join fusions to ~360 GB/s. Padding is weight-side
    # (PadConv/real_feat) so parameters, checkpoints and math are
    # bit-identical; padded channels are exactly zero everywhere.
    min_channels: int = 0
    # Storage dtype of the branch-remat saved conv residuals: '0' (bf16)
    # | 'fp8'/'e4m3' | 'e5m2'. Threaded only to blocks that are actually
    # branch-remat'd, and only in train mode — eval forwards, non-remat
    # configs, and f32/f64 runs are bit-identical regardless of the
    # setting. See _conv_out / resolve_act_store.
    act_store: str = "0"
    # '0' (XLA reduce_window/select-and-scatter) | 'custom'
    # (ops/maxpool.py routing-exact custom VJP — measured negative at
    # the bench shape, round 5). See resolve_maxpool.
    maxpool_impl: str = "0"
    dtype: Any = jnp.bfloat16

    # pad the stem too when min_channels is set (the stem's 64x64x64
    # output is the largest narrow tensor, but also the costliest to
    # widen — separately toggleable for measurement)
    pad_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, int8: bool = False):
        """``int8``: dynamically-quantized eval convs
        (:func:`quant_conv_apply`) — the teacher/inference fast path.
        Ignored in train mode; BN, pooling and the head stay exact."""
        x = x.astype(self.dtype)
        mc = self.min_channels
        q = int8 and not train
        stem_p = max(64, mc) if (mc and self.pad_stem) else 64
        stem_rf = 64 if stem_p != 64 else 0
        if self.first_conv:
            if self.space_to_depth and x.shape[1] % 2 == 0 \
                    and x.shape[2] % 2 == 0:
                kernel = _StemKernel(in_ch=x.shape[-1],
                                     name="conv1")()
                if stem_rf:
                    kernel = jnp.pad(
                        kernel, ((0, 0), (0, 0), (0, 0), (0, stem_p - 64)))
                x = _space_to_depth_conv1(x, kernel, self.dtype, int8=q)
            else:
                x = _conv("conv1", 64, (7, 7), 2, 3, 1, self.dtype,
                          0, stem_p, x, q)
        else:
            x = _conv("conv1", 64, (3, 3), 1, 1, 1, self.dtype,
                      0, stem_p, x, q)
        x = make_bn(self.bn_impl, not train, self.dtype, "bn1",
                    real_feat=stem_rf)(x)
        x0 = nn.relu(x)
        if self.maxpool1:
            if self.maxpool_impl == "custom" and x0.shape[1] % 2 == 0 \
                    and x0.shape[2] % 2 == 0:
                # routing-exact custom backward (ops/maxpool.py).
                # MEASURED NEGATIVE at the bench shape (round 5:
                # 5,832 vs 6,460 samples/s — the backward's interleave
                # reshapes relayout worse than select-and-scatter's
                # walk); kept off-default for shapes where XLA's
                # select-and-scatter is the bottleneck.
                from stil_tta_tpu.ops.maxpool import max_pool_3x3_s2
                x0 = max_pool_3x3_s2(x0)
            else:
                x0 = nn.max_pool(x0, (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)))

        feats = [x0]
        feats_real = [64]
        x = x0
        real_ch = 64          # real width of x (physical may be wider)
        in_planes = 64
        if self.remat == "branch":
            block_cls = nn.remat(
                self.block, static_argnums=(2, 3),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "bn_stats"))
        elif self.remat:
            block_cls = nn.remat(self.block, static_argnums=(2, 3))
        else:
            block_cls = self.block
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            cls = block_cls if (self.remat_stages is None
                                or stage in self.remat_stages) \
                else self.block
            # fp8 residual storage is only meaningful where the branch
            # policy actually elides the recomputed activations
            astore = self.act_store if (
                self.remat == "branch" and cls is block_cls) else "0"
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = b == 0 and (
                    s != 1 or in_planes != planes * self.block.expansion)
                ir = real_ch if real_ch != x.shape[-1] else 0
                x = cls(planes=planes, stride=s, downsample=needs_ds,
                        groups=self.groups, base_width=self.width_per_group,
                        dtype=self.dtype, bn_impl=self.bn_impl,
                        min_channels=mc, in_real=ir, act_store=astore,
                        name=f"layer{stage + 1}_{b}")(x, train, q)
                real_ch = planes * self.block.expansion
            in_planes = planes * self.block.expansion
            feats.append(x)
            feats_real.append(real_ch)

        if self.return_all_feature_maps:
            # contract: reference channel widths (``resnets.py:254-260``)
            return [f if f.shape[-1] == r else f[..., :r]
                    for f, r in zip(feats, feats_real)]
        if x.shape[-1] != real_ch:
            x = x[..., :real_ch]
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


def resolve_min_channels(min_channels: Any = None) -> int:
    """``STIL_RESNET_PAD``: integer minimum physical channel width
    (:class:`ResNet.min_channels`), default 0 = off.

    Off by default as a MEASURED negative result (round 3, v5e,
    reference DVM STiL shape): padding the width-64 tensors to 128
    makes every layout uniform but costs 2-4x FLOPs on the affected
    convs, and the step is FLOP-coupled enough that the bench LOST
    16% (4,449 vs 5,323 samples/s; 12% loss even with the stem left
    narrow via ``STIL_RESNET_PAD_STEM=0``). The genuine
    wide_resnet50_2 scaling point (3,372/s at ~1.85x modeled FLOPs —
    1.58x slower) shows wider channels are more efficient per FLOP,
    but nowhere near the 'free' reading round 2 derived from the
    then-broken wide model. The mechanism stays available (and
    f64-exact, tests/test_channel_pad.py) for shapes where the
    trade-off differs."""
    if min_channels is not None:
        return int(min_channels)
    import os
    return int(os.environ.get("STIL_RESNET_PAD", "0"))


def image_encoder(name: str, return_all_feature_maps: bool = False,
                  dtype: Any = jnp.bfloat16, remat: Any = None,
                  min_channels: Any = None, act_store: Any = None):
    """``torchvision_ssl_encoder`` equivalent
    (``models/self_supervised.py:8-15``): encoder with no fc head.
    Unlike the reference, vit_small/vit_base resolve to a real encoder
    (the reference ships those configs but no implementation —
    SURVEY.md §2.8).

    ``remat`` (ResNets only): None resolves from ``STIL_RESNET_REMAT``
    ('branch' | 'full' | '0', default off) — see :class:`ResNet`.
    ``min_channels`` (ResNets only): None resolves from
    ``STIL_RESNET_PAD`` — see :func:`resolve_min_channels`.
    ``act_store`` (ResNets only): None resolves from
    ``STIL_RESNET_ACT_STORE`` at construction time — see
    :func:`resolve_act_store`; only active under ``remat='branch'``
    in train mode.
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
    import os as _os
    pad_stem = _os.environ.get("STIL_RESNET_PAD_STEM", "1") != "0"
    return _ENCODERS[name](return_all_feature_maps=return_all_feature_maps,
                           dtype=dtype, remat=remat, remat_stages=stages,
                           min_channels=resolve_min_channels(min_channels),
                           act_store=resolve_act_store(act_store),
                           maxpool_impl=resolve_maxpool(),
                           pad_stem=pad_stem)
