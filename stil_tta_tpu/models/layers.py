"""Shared transformer building blocks (Flax).

Parity targets: ``/root/reference/models/Transformer.py`` (Mlp ``:17-33``,
Attention ``:36-92``, Block ``:145-183``) and the DropPath of
``/root/reference/models/Disentangle/utils/disentangle_transformer.py:96-123``.

TPU-first notes: attention over the tiny token counts here (16 image
tokens, <=77 tabular tokens) is a handful of small matmuls — XLA fuses the
whole block; no custom kernel is warranted (SURVEY.md §5 "long-context:
not applicable"). We keep QK^T in f32 via ``preferred_element_type`` so
softmax numerics match the f32 reference even when activations are bf16.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# trunc_normal_(std=.02)-style init used across the reference transformer
# stacks (``Transformer.py:231-238``).
trunc02 = nn.initializers.truncated_normal(stddev=0.02)

Dense = lambda *a, **kw: nn.Dense(*a, kernel_init=trunc02,
                                  param_dtype=jnp.float32, **kw)
LayerNorm = lambda **kw: nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32,
                                      **kw)


def drop_path(x, rate: float, deterministic: bool, rng) -> jax.Array:
    """Per-sample stochastic depth (``disentangle_transformer.py:108-123``)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x / keep) * mask.astype(x.dtype)


class Mlp(nn.Module):
    """fc -> GELU -> drop -> fc -> drop (``Transformer.py:17-33``)."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = Dense(out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def _split_heads(x, num_heads: int, b: Optional[int] = None,
                 n: Optional[int] = None):
    """(B, N, C) or (B*N, C) -> (B, H, N, C/H)."""
    if x.ndim == 3:
        b, n, c = x.shape
    else:
        c = x.shape[-1]
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x, flat: bool = False):
    b, h, n, d = x.shape
    out = x.transpose(0, 2, 1, 3)
    return out.reshape(b * n, h * d) if flat else out.reshape(b, n, h * d)


def scaled_attention(q, k, v, scale: float, mask=None, dropout_rate: float = 0.0,
                     deterministic: bool = True, dropout_rng=None):
    """Softmax attention with additive mask; accumulates in at-least-f32
    (f64 inputs keep f64 accumulation — the f64 golden-parity tests run
    truly end-to-end f64).

    Matches ``Transformer.py:72-85`` (mask is *added* pre-softmax, the
    reference's -1e9 convention).
    """
    acc_t = jnp.promote_types(v.dtype, jnp.float32)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=acc_t) * scale
    if mask is not None:
        attn = attn + mask
    attn = jax.nn.softmax(attn, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                     preferred_element_type=acc_t)
    return out.astype(v.dtype), attn


class Attention(nn.Module):
    """Self-attention (``Transformer.py:36-92``)."""

    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 return_attn: bool = False, attn_probe=None,
                 seq_shape=None):
        """``x`` is (B, N, C), or (B*N, C) with ``seq_shape=(B, N)`` —
        the 2-D form keeps every dense on well-tiled (rows, C) operands
        (XLA assigns batch-minor layouts to 3-D token tensors, which
        measured ~2.4x slower end-to-end on the 18-token encoder)."""
        flat = x.ndim == 2
        if flat:
            b, n = seq_shape
        else:
            b, n = x.shape[:2]
        dim = x.shape[-1]
        head_dim = dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = Dense(dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.num_heads, b, n)
                   for t in (q, k, v))
        rng = self.make_rng("dropout") if (
            self.attn_drop > 0.0 and not deterministic) else None
        if attn_probe is None:
            out, attn = scaled_attention(q, k, v, scale, mask,
                                         self.attn_drop, deterministic,
                                         rng)
        else:
            # zero probe added to the post-softmax map: grads w.r.t. the
            # probe ARE the attention-map gradients (the reference's
            # save_attn_gradients hook, ``Transformer.py:51-55``)
            acc_t = jnp.promote_types(v.dtype, jnp.float32)
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=acc_t) * scale
            if mask is not None:
                attn = attn + mask
            attn = jax.nn.softmax(attn, axis=-1) + attn_probe
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                             preferred_element_type=acc_t) \
                .astype(v.dtype)
        out = _merge_heads(out, flat=flat)
        out = Dense(dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_attn:
            return out, attn
        return out


class CrossAttention(nn.Module):
    """Query attends over encoder states (``Transformer.py:95-142``)."""

    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q_in, k_in, deterministic: bool = True,
                 return_attn: bool = False, seq_shape=None):
        """``q_in`` is (B, Nq, C) or (B*Nq, C) with ``seq_shape=(B, Nq)``
        (see :class:`Attention`); ``k_in`` is always (B, Nk, C)."""
        flat = q_in.ndim == 2
        bq, nq = seq_shape if flat else q_in.shape[:2]
        k_dim = k_in.shape[-1]
        head_dim = k_dim // self.num_heads
        scale = head_dim ** -0.5
        kv = Dense(k_dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                   name="kv_proj")(k_in)
        k, v = jnp.split(kv, 2, axis=-1)
        q = Dense(k_dim, dtype=self.dtype, name="q_proj")(q_in)
        q = _split_heads(q, self.num_heads, bq, nq)
        k, v = (_split_heads(t, self.num_heads) for t in (k, v))
        rng = self.make_rng("dropout") if (
            self.attn_drop > 0.0 and not deterministic) else None
        out, attn = scaled_attention(q, k, v, scale, None, self.attn_drop,
                                     deterministic, rng)
        out = _merge_heads(out, flat=flat)
        out = Dense(k_dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_attn:
            return out, attn
        return out


class Block(nn.Module):
    """Pre-norm transformer block, optional cross-attention
    (``Transformer.py:145-183``)."""

    num_heads: int = 8
    is_cross_attention: bool = False
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, encoder_hidden_states=None, mask=None,
                 deterministic: bool = True, return_attn: bool = False,
                 attn_probe=None):
        # Run every dense/norm/residual on 2-D (B*N, C): XLA lays 3-D
        # token tensors out batch-minor on TPU, costing ~2.4x on the
        # small-token encoders here; the head split/merge inside the
        # attention modules is the only place the sequence structure is
        # needed. Math (and params) are identical to the 3-D form.
        b, n, dim = x.shape
        x = x.reshape(b * n, dim)

        def dp(t):
            if self.drop_path == 0.0 or deterministic:
                return t
            # per-SAMPLE stochastic depth: mask over b, broadcast over n
            t3 = drop_path(t.reshape(b, n, dim), self.drop_path,
                           deterministic, self.make_rng("dropout"))
            return t3.reshape(b * n, dim)

        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn_out = Attention(self.num_heads, self.qkv_bias, self.attn_drop,
                             self.drop, dtype=self.dtype, name="attn")(
            h, mask=mask, deterministic=deterministic,
            return_attn=return_attn, attn_probe=attn_probe,
            seq_shape=(b, n))
        attn_map = None
        if return_attn:
            attn_out, attn_map = attn_out
        x = x + dp(attn_out)
        if self.is_cross_attention:
            assert encoder_hidden_states is not None
            h = LayerNorm(dtype=self.dtype, name="cross_norm")(x)
            x = x + dp(CrossAttention(self.num_heads, self.qkv_bias,
                                      self.attn_drop, self.drop,
                                      dtype=self.dtype, name="cross_attn")(
                h, encoder_hidden_states, deterministic=deterministic,
                seq_shape=(b, n)))
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + dp(Mlp(int(dim * self.mlp_ratio), drop=self.drop,
                       dtype=self.dtype, name="mlp")(
            h, deterministic=deterministic))
        if return_attn:
            return x.reshape(b, n, dim), attn_map
        return x.reshape(b, n, dim)


class MLPHead(nn.Module):
    """Linear -> ReLU -> Linear (``STiLModel_backbone.py:19-32``)."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(x)
        return x


class SimCLRProjectionHead(nn.Module):
    """Linear -> ReLU -> Linear, as lightly's SimCLRProjectionHead used at
    ``STiLModel.py:56-64``."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(x)
        return x
