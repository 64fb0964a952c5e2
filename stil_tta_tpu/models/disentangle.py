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
    def __call__(self, x_img, x_tab, x_glob, deterministic: bool = True,
                 seq_shapes=None):
        """Inputs are either 3-D ``(B, N, C)`` (``seq_shapes=None``) or
        2-D ``(B*N, C)`` rows with ``seq_shapes=[(B, N_img), (B, N_tab),
        (B, N_glob)]``; outputs mirror the input form. The 2-D form
        exists for layout reasons (see :class:`~.layers.Block`): every
        dense runs on flattened rows, the head split/merge is the only
        place the per-stream sequence structure appears."""
        dim = x_img.shape[-1]
        head_dim = dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = Dense(dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")
        proj = Dense(dim, dtype=self.dtype, name="proj")
        proj_dropout = nn.Dropout(self.proj_drop)

        flat_io = seq_shapes is not None
        if not flat_io:
            seq_shapes = [x.shape[:2] for x in (x_img, x_tab, x_glob)]
            x_img, x_tab, x_glob = (
                x.reshape(-1, dim) for x in (x_img, x_tab, x_glob))

        def qkv_split(x, bn):
            q, k, v = jnp.split(qkv(x), 3, axis=-1)
            return tuple(_split_heads(t, self.num_heads, *bn)
                         for t in (q, k, v))

        q_i, k_i, v_i = qkv_split(x_img, seq_shapes[0])
        q_t, k_t, v_t = qkv_split(x_tab, seq_shapes[1])
        q_g, k_g, v_g = qkv_split(x_glob, seq_shapes[2])

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

        outs = []
        for o, (b, n) in zip((out_i, out_t, out_g), seq_shapes):
            o = proj(_merge_heads(o, flat=True))
            o = proj_dropout(o, deterministic=deterministic)
            outs.append(o if flat_io else o.reshape(b, n, dim))
        return tuple(outs)


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

        # 2-D rows throughout (layout, see layers.Block): flatten each
        # stream once; the attention handles head split/merge per stream.
        seq_shapes = [x.shape[:2] for x in (x_img, x_tab, x_glob)]
        x_img, x_tab, x_glob = (x.reshape(-1, dim)
                                for x in (x_img, x_tab, x_glob))

        def dp(t, bn):
            if self.drop_path == 0.0 or deterministic:
                return t
            # per-SAMPLE stochastic depth: mask over b, broadcast over n
            t3 = drop_path(t.reshape(*bn, dim), self.drop_path,
                           deterministic, self.make_rng("dropout"))
            return t3.reshape(-1, dim)

        a_i, a_t, a_g = attn(norm1(x_img), norm1(x_tab), norm1(x_glob),
                             deterministic=deterministic,
                             seq_shapes=seq_shapes)
        x_img = x_img + dp(a_i, seq_shapes[0])
        x_tab = x_tab + dp(a_t, seq_shapes[1])
        x_glob = x_glob + dp(a_g, seq_shapes[2])
        x_img = x_img + dp(mlp(norm2(x_img), deterministic=deterministic),
                           seq_shapes[0])
        x_tab = x_tab + dp(mlp(norm2(x_tab), deterministic=deterministic),
                           seq_shapes[1])
        x_glob = x_glob + dp(mlp(norm2(x_glob), deterministic=deterministic),
                             seq_shapes[2])
        return tuple(x.reshape(*bn, dim) for x, bn in
                     zip((x_img, x_tab, x_glob), seq_shapes))
