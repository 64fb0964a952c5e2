"""BERT-style tabular transformer encoder (TIP-style), Flax.

Parity target: ``/root/reference/models/Transformer.py:186-278``
(TabularTransformerEncoder): per-categorical-value embedding with
cumulative offsets (``:203-205``), continuous Linear(1,d) embedding
(``:207``), CLS token (``:209``), mask-special token (``:210``), learned
column embedding (``:214``), N pre-norm self-attention blocks
(``:220-223``), and additive -1e9 attention masking incl. the self-eye
(``:264-274``).

TPU-first: the embedding step is a single gather + one (B, Ncon) x (1, d)
outer product; the whole encoder is a chain of small matmuls that XLA
fuses. Input rows carry categorical columns first, then continuous
(SURVEY.md §2.2 artifact contract).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.models.layers import Block, Dense, LayerNorm, trunc02


def build_attention_mask(missing: jax.Array) -> jax.Array:
    """Additive attention mask from a boolean missing-column mask.

    ``missing`` is (B, N) True where a column is missing
    (``Transformer.py:264-274``): every token masks attention *to* missing
    tokens except each missing token still attends to itself; CLS is never
    masked. Returns (B, 1, N+1, N+1) additive mask of {0, -1e9}.
    """
    b, n = missing.shape
    cls = jnp.zeros((b, 1), dtype=bool)
    m = jnp.concatenate([cls, missing], axis=1)  # (B, N+1)
    m = jnp.repeat(m[:, None, :], n + 1, axis=1)  # (B, N+1, N+1)
    eye = ~jnp.eye(n + 1, dtype=bool)
    m = m & eye[None]
    return (m[:, None, :, :]).astype(jnp.float32) * (-1e9)


class TabularTransformerEncoder(nn.Module):
    cat_lengths: Sequence[int]
    con_lengths: Sequence[int]
    embedding_dim: int = 512
    num_layers: int = 4
    embedding_dropout: float = 0.0
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @property
    def num_cat(self):
        return len(self.cat_lengths)

    @property
    def num_con(self):
        return len(self.con_lengths)

    def setup(self):
        num_unique_cat = int(sum(self.cat_lengths))
        n_tokens = self.num_cat + self.num_con + 1
        self.cat_offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(jnp.asarray(self.cat_lengths[:-1], jnp.int32)),
        ]) if self.num_cat > 0 else jnp.zeros((0,), jnp.int32)
        self.cat_embedding = nn.Embed(num_unique_cat, self.embedding_dim,
                                      embedding_init=trunc02,
                                      param_dtype=jnp.float32,
                                      name="cat_embedding")
        self.con_proj = Dense(self.embedding_dim, dtype=self.dtype,
                              name="con_proj")
        self.cls_token = self.param("cls_token", trunc02,
                                    (1, 1, self.embedding_dim), jnp.float32)
        self.mask_special_token = self.param(
            "mask_special_token", trunc02, (1, 1, self.embedding_dim),
            jnp.float32)
        self.column_embedding = nn.Embed(n_tokens, self.embedding_dim,
                                         embedding_init=trunc02,
                                         param_dtype=jnp.float32,
                                         name="column_embedding")
        self.norm = LayerNorm(dtype=self.dtype, name="norm")
        self.embed_drop = nn.Dropout(self.embedding_dropout)
        self.blocks = [
            Block(num_heads=8, mlp_ratio=4.0, qkv_bias=False,
                  drop=self.drop_rate, dtype=self.dtype, name=f"block_{i}")
            for i in range(self.num_layers)
        ]

    def embed(self, x: jax.Array, mask_special: Optional[jax.Array] = None,
              deterministic: bool = True) -> jax.Array:
        """``Transformer.py:240-259``. x: (B, num_cat+num_con) float rows,
        categorical columns first."""
        b = x.shape[0]
        parts = []
        if self.num_cat > 0:
            # clamp per-column to [0, cardinality-1] (the torch one_hot
            # path clamps the same way — ``...Dataset.py:163``; the raw
            # torch embedding would hard-crash on out-of-range values,
            # while an unclamped jnp gather fills NaN under jit)
            lens = jnp.asarray(self.cat_lengths, jnp.int32)
            cat = jnp.clip(x[:, :self.num_cat].astype(jnp.int32), 0,
                           lens - 1)
            cat_ids = cat + self.cat_offsets
            parts.append(self.cat_embedding(cat_ids).astype(self.dtype))
        if self.num_con > 0:
            con = x[:, self.num_cat:].astype(self.dtype)[..., None]  # (B,Ncon,1)
            parts.append(self.con_proj(con))
        tokens = jnp.concatenate(parts, axis=1)  # (B, N, d)
        if mask_special is not None:
            ms = mask_special[..., None]
            tok_m = self.mask_special_token.astype(self.dtype)
            tokens = jnp.where(ms, tok_m, tokens)
        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype),
                               (b, 1, self.embedding_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        n_tokens = self.num_cat + self.num_con + 1
        col = self.column_embedding(jnp.arange(n_tokens)).astype(self.dtype)
        tokens = tokens + col[None]
        tokens = self.norm(tokens)
        tokens = self.embed_drop(tokens, deterministic=deterministic)
        return tokens

    def __call__(self, x: jax.Array, missing_mask: Optional[jax.Array] = None,
                 mask_special: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 return_attn: bool = False,
                 attn_probes=None) -> jax.Array:
        tokens = self.embed(x, mask_special=mask_special,
                            deterministic=deterministic)
        attn_mask = None
        if missing_mask is not None:
            attn_mask = build_attention_mask(missing_mask)
        attn_maps = []
        for i, block in enumerate(self.blocks):
            tokens = block(tokens, mask=attn_mask,
                           deterministic=deterministic,
                           return_attn=return_attn,
                           attn_probe=None if attn_probes is None
                           else attn_probes[i])
            if return_attn:
                tokens, attn = tokens
                attn_maps.append(attn)
        if return_attn:
            # attention-map capture for visualisation (the reference's
            # save_attention hooks, ``Transformer.py:48-61``)
            return tokens, attn_maps
        return tokens


def split_field_lengths(field_lengths: Sequence[int]):
    """Split artifact field lengths into (cat, con) lists; 1 => continuous
    (``STiLModel_backbone.py:96-105``)."""
    cat = [int(x) for x in field_lengths if int(x) > 1]
    con = [1 for x in field_lengths if int(x) == 1]
    return cat, con


class MultimodalTransformerEncoder(nn.Module):
    """TIP's cross-attention multimodal encoder
    (``Transformer.py:281-327``). Defined-unused by the reference's
    algorithms (kept for TIP checkpoint compatibility, SURVEY.md §2.3);
    fully functional here.

    Tabular tokens cross-attend over projected image features."""

    embedding_dim: int = 2048           # image feature dim
    multimodal_embedding_dim: int = 512
    tabular_embedding_dim: int = 512
    num_layers: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, image_features, deterministic: bool = True):
        if image_features.ndim == 4:  # (B,H,W,C) map -> (B,HW,C)
            b, h, w, c = image_features.shape
            image_features = image_features.reshape(b, h * w, c)
        img = Dense(self.multimodal_embedding_dim, dtype=self.dtype,
                    name="image_proj")(image_features)
        img = LayerNorm(dtype=self.dtype, name="image_norm")(img)
        if self.tabular_embedding_dim != self.multimodal_embedding_dim:
            x = Dense(self.multimodal_embedding_dim, dtype=self.dtype,
                      name="tabular_proj")(x)
        for i in range(self.num_layers):
            x = Block(num_heads=8, is_cross_attention=True,
                      dtype=self.dtype, name=f"block_{i}")(
                x, encoder_hidden_states=img,
                deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class TabularPredictor(nn.Module):
    """Masked tabular reconstruction head (``Transformer.py:331-364``):
    categorical classifier over all unique category values + continuous
    regressor, applied to the post-CLS tokens."""

    cat_lengths: Sequence[int]
    con_lengths: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        num_cat = len(self.cat_lengths)
        num_unique = int(sum(self.cat_lengths))
        x = x[:, 1:, :]  # drop CLS
        cat_out = Dense(num_unique, dtype=jnp.float32,
                        name="cat_classifier")(
            x[:, :num_cat].astype(jnp.float32))
        con_out = Dense(1, dtype=jnp.float32, name="con_regressor")(
            x[:, num_cat:].astype(jnp.float32))
        return cat_out, con_out
