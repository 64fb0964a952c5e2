"""1x1 convolution with a matmul-formulated backward (custom VJP).

Motivation (round-3 trace, bench shape): XLA's TPU conv emitter handles
the *backward* of sub-128-channel 1x1 convs with batch-in-sublanes
layouts (``EmitAllInputFeatureInSublanesOutputBatchInSublanes...``),
running e.g. the stage-1 bottleneck ``conv1`` data-grad at ~9 TFLOP/s
(~2% MFU, ~1.9 ms for 17 GFLOP). The forward conv however fuses BN-stat
reductions into its epilogue and is fine — replacing the forward with a
dot (``resnet.Dot1x1``) measured -2.4% end-to-end.

This module keeps the forward as ``lax.conv_general_dilated``
(bit-identical HLO) and overrides only the backward:

- ``dx = dy2d @ W^T`` and ``dw = x2d^T @ dy2d`` over flattened pixel
  rows — the standard 2-D matmul path with well-tiled layouts.
- stride-s convs read ``x[:, ::s, ::s]`` in the forward; their ``dx``
  scatters the dense grad back to the strided positions (exact).

Math is identical to the conv backward (same contractions, f32 MXU
accumulation); only the op formulation changes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1_dotbwd(x, kernel, stride: int = 1):
    """1x1 conv (padding 0), backward computed as flattened matmuls.

    ``kernel`` is (1, 1, cin, cout) in the dtype the conv should run in
    (cast before calling, as with ``lax.conv``).
    """
    return _conv(x, kernel, stride)


def _fwd(x, kernel, stride):
    return _conv(x, kernel, stride), (x, kernel)


def _bwd(stride, res, dy):
    x, kernel = res
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    k2 = kernel.reshape(cin, cout)
    b, oh, ow, _ = dy.shape
    dy2 = dy.reshape(b * oh * ow, cout)
    x_eff = x if stride == 1 else x[:, ::stride, ::stride, :]
    x2 = x_eff.reshape(b * oh * ow, cin)
    # f32 MXU accumulation, results in the operand dtype — the same
    # numerics as XLA's conv transpose ops
    dw = jnp.matmul(x2.T, dy2,
                    preferred_element_type=jnp.float32).astype(kernel.dtype)
    dx2 = jnp.matmul(dy2, k2.T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    dx_dense = dx2.reshape(b, oh, ow, cin)
    if stride == 1:
        dx = dx_dense
    else:
        dx = jnp.zeros_like(x).at[:, ::stride, ::stride, :].set(dx_dense)
    return dx, dw.reshape(kernel.shape)


conv1x1_dotbwd.defvjp(_fwd, _bwd)
