"""Disentangled (modality-shared vs modality-specific) fusion attention.

Parity target: ``/root/reference/models/Disentangle/utils/
disentangle_transformer.py`` (from PIBD): one *shared* qkv projection for
all three streams; the modality-specific image/tabular streams
self-attend, while the shared stream cross-attends over
``cat(k_global, k_img, k_tab)`` (``:65-81``); a single shared MLP and
shared norms serve all three streams (``:151-164``).

TPU-first: the three attention computations are batched into shared
einsums on padded token axes where profitable; at these token counts
(16 + Nt + 1) everything is one fused XLA region anyway.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.models.layers import (Dense, LayerNorm, Mlp, _merge_heads,
                                        _split_heads, drop_path,
                                        scaled_attention)


class MIAttention(nn.Module):
    """``disentangle_transformer.py:29-94``."""

    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_img, x_tab, x_glob, deterministic: bool = True):
        dim = x_img.shape[-1]
        head_dim = dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = Dense(dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")
        proj = Dense(dim, dtype=self.dtype, name="proj")
        proj_dropout = nn.Dropout(self.proj_drop)

        b, ni = x_img.shape[:2]
        nt, ng = x_tab.shape[1], x_glob.shape[1]
        # One shared qkv/proj matmul over the concatenated token rows
        # (2-D operands — see layers.Block for why), instead of three
        # small per-stream matmuls: the projections share weights, only
        # the attention pattern differs per stream.
        x2 = jnp.concatenate([x_img.reshape(b * ni, dim),
                              x_tab.reshape(b * nt, dim),
                              x_glob.reshape(b * ng, dim)], axis=0)
        q2, k2, v2 = jnp.split(qkv(x2), 3, axis=-1)

        def stream(t2, start, n):
            rows = t2[start * b:(start + n) * b]
            return _split_heads(rows, self.num_heads, b, n)

        q_i, k_i, v_i = (stream(t, 0, ni) for t in (q2, k2, v2))
        q_t, k_t, v_t = (stream(t, ni, nt) for t in (q2, k2, v2))
        q_g, k_g, v_g = (stream(t, ni + nt, ng) for t in (q2, k2, v2))

        need_rng = self.attn_drop > 0.0 and not deterministic
        rngs = [self.make_rng("dropout") if need_rng else None
                for _ in range(3)]

        out_i, _ = scaled_attention(q_i, k_i, v_i, scale, None,
                                    self.attn_drop, deterministic, rngs[0])
        out_t, _ = scaled_attention(q_t, k_t, v_t, scale, None,
                                    self.attn_drop, deterministic, rngs[1])
        k_all = jnp.concatenate([k_g, k_i, k_t], axis=2)
        v_all = jnp.concatenate([v_g, v_i, v_t], axis=2)
        out_g, _ = scaled_attention(q_g, k_all, v_all, scale, None,
                                    self.attn_drop, deterministic, rngs[2])

        o2 = jnp.concatenate([_merge_heads(out_i, flat=True),
                              _merge_heads(out_t, flat=True),
                              _merge_heads(out_g, flat=True)], axis=0)
        o2 = proj(o2)
        if self.proj_drop > 0.0 and not deterministic:
            # per-stream dropout draws (one rng per call, like the
            # reference's three module calls)
            outs = []
            for start, n in ((0, ni), (ni, nt), (ni + nt, ng)):
                o = o2[start * b:(start + n) * b]
                o = proj_dropout(o, deterministic=deterministic)
                outs.append(o.reshape(b, n, dim))
            return tuple(outs)
        return (o2[:b * ni].reshape(b, ni, dim),
                o2[b * ni:b * (ni + nt)].reshape(b, nt, dim),
                o2[b * (ni + nt):].reshape(b, ng, dim))


class MITransformerLayer(nn.Module):
    """``disentangle_transformer.py:125-169``: shared norms/MLP across the
    three streams, residual + per-sample DropPath."""

    num_heads: int = 8
    mlp_ratio: float = 1.0
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_img, x_tab, x_glob, deterministic: bool = True):
        dim = x_img.shape[-1]
        norm1 = LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        # NOTE: reference passes drop=drop_path into the shared Mlp
        # (``disentangle_transformer.py:149``); out_features == hidden
        # (= dim * mlp_ratio), which equals dim at mlp_ratio=1.0.
        mlp = Mlp(int(dim * self.mlp_ratio),
                  out_features=int(dim * self.mlp_ratio),
                  drop=self.drop_path, dtype=self.dtype, name="mlp")
        attn = MIAttention(self.num_heads, self.qkv_bias, self.attn_drop,
                           self.proj_drop, dtype=self.dtype, name="attn")

        def dp(t):
            if self.drop_path == 0.0 or deterministic:
                return t
            return drop_path(t, self.drop_path, deterministic,
                             self.make_rng("dropout"))

        a_i, a_t, a_g = attn(norm1(x_img), norm1(x_tab), norm1(x_glob),
                             deterministic=deterministic)
        stochastic = not deterministic and (
            self.drop_path > 0.0)
        if stochastic:
            # reference rng-draw order: six separate DropPath draws plus
            # three Mlp dropout calls — keep the per-stream form
            x_img = x_img + dp(a_i)
            x_tab = x_tab + dp(a_t)
            x_glob = x_glob + dp(a_g)
            x_img = x_img + dp(mlp(norm2(x_img),
                                   deterministic=deterministic))
            x_tab = x_tab + dp(mlp(norm2(x_tab),
                                   deterministic=deterministic))
            x_glob = x_glob + dp(mlp(norm2(x_glob),
                                     deterministic=deterministic))
            return x_img, x_tab, x_glob
        # fast path: one flat residual + norm2 + shared-MLP pass over
        # the concatenated token rows (identical math; the MLP and
        # norms are shared across streams by construction)
        b, ni = x_img.shape[:2]
        nt, ng = x_tab.shape[1], x_glob.shape[1]
        x2 = jnp.concatenate([x_img.reshape(b * ni, dim),
                              x_tab.reshape(b * nt, dim),
                              x_glob.reshape(b * ng, dim)], axis=0)
        a2 = jnp.concatenate([a_i.reshape(b * ni, dim),
                              a_t.reshape(b * nt, dim),
                              a_g.reshape(b * ng, dim)], axis=0)
        x2 = x2 + a2
        x2 = x2 + mlp(norm2(x2), deterministic=deterministic)
        return (x2[:b * ni].reshape(b, ni, dim),
                x2[b * ni:b * (ni + nt)].reshape(b, nt, dim),
                x2[b * (ni + nt):].reshape(b, ng, dim))
