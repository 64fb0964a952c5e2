"""Vision Transformer image encoder.

The reference *ships* ViT model configs
(``configs/models/{vit_small,vit_base}.yaml`` with img_size/patch_size/
embedding_dim keys) but no implementation — ``torchvision_ssl_encoder``
resolves names only against the ResNet zoo, so ``models=vit_base``
crashes (SURVEY.md §2.8 caveat). This module closes that gap with a
standard pre-norm ViT built from the same transformer blocks as the
tabular encoder.

Output contract matches the encoder zoo: ``return_all_feature_maps``
yields the patch-token grid reshaped to (B, H/p, W/p, C) as the last
"feature map" (so the DisCo backbone's stage-4-tokens path works
unchanged); otherwise the CLS embedding is returned pooled.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.models.layers import Block, Dense, LayerNorm, trunc02


class ViT(nn.Module):
    patch_size: int = 16
    embedding_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    return_all_feature_maps: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = nn.Conv(self.embedding_dim, (p, p), strides=(p, p),
                    param_dtype=jnp.float32, dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        tokens = x.reshape(b, gh * gw, self.embedding_dim)
        cls = self.param("cls_token", trunc02,
                         (1, 1, self.embedding_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (b, 1, self.embedding_dim)), tokens], axis=1)
        pos = self.param("pos_embed", trunc02,
                         (1, gh * gw + 1, self.embedding_dim), jnp.float32)
        tokens = tokens + pos.astype(self.dtype)
        for i in range(self.depth):
            tokens = Block(num_heads=self.num_heads,
                           mlp_ratio=self.mlp_ratio, qkv_bias=True,
                           drop=self.drop_rate, dtype=self.dtype,
                           name=f"block_{i}")(
                tokens, deterministic=not train)
        tokens = LayerNorm(dtype=self.dtype, name="norm")(tokens)
        if self.return_all_feature_maps:
            grid = tokens[:, 1:, :].reshape(b, gh, gw, self.embedding_dim)
            return [grid]
        return [tokens[:, 0, :]]


def vit_small(**kw):
    return ViT(embedding_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw):
    return ViT(embedding_dim=768, depth=12, num_heads=12, **kw)
