"""Fusion backbones (Flax).

Three families, mirroring the reference's capability surface:

- :class:`DisCoBackbone` — STiL's disentangled contrastive backbone
  (``/root/reference/models/Disentangle/utils/STiLModel_backbone.py:35-165``):
  image tokens from the ResNet stage-4 map, tabular tokens, si/ai/st/at
  disentangle projections, shared-feature reduction, MITransformer fusion,
  and three classifiers (multimodal / imaging / tabular).
- :class:`MatchBackbone` — concat fusion + projection head + single
  multimodal classifier for SimMatch/CoMatch/FreeMatch multimodal variants
  (``/root/reference/models/MatchModel/multimodal_backbone.py:37-124``).
- :class:`SemiMultimodalBackbone` — concat fusion with three classifiers
  for MMatch/Co-Training
  (``/root/reference/models/SemiMultimodal/Multimodal_model.py:36-122``).

All operate on NHWC images; tabular rows are (B, ncat+ncon) float with
categorical columns first.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.models.disentangle import MITransformerLayer
from stil_tta_tpu.models.layers import MLPHead
from stil_tta_tpu.models.resnet import EMBEDDING_DIM, image_encoder
from stil_tta_tpu.models.tabular_transformer import (TabularTransformerEncoder,
                                                     split_field_lengths)

from stil_tta_tpu.losses.common import at_least_f32

Linear = lambda features, **kw: nn.Dense(features, param_dtype=jnp.float32,
                                         **kw)


class DisCoBackbone(nn.Module):
    """STiL disentangled-attention backbone."""

    model: str  # image encoder name, e.g. 'resnet50'
    field_lengths: Sequence[int]
    num_classes: int
    tabular_embedding_dim: int = 512
    multimodal_embedding_dim: int = 512
    tabular_num_layers: int = 4
    multimodal_num_layers: int = 1
    embedding_dropout: float = 0.0
    drop_rate: float = 0.0
    tabular_encoder: str = "transformer"  # or 'saint'
    # reference hard-codes SAINT FF dropout 0.8
    # (``STiLModel_SAINT_backbone.py:119``); overridable for
    # deterministic parity tests
    saint_ff_dropout: float = 0.8
    dtype: Any = jnp.bfloat16

    def setup(self):
        cat_lengths, con_lengths = split_field_lengths(self.field_lengths)
        self.encoder_imaging = image_encoder(
            self.model, return_all_feature_maps=True, dtype=self.dtype)
        if self.tabular_encoder == "saint":
            from stil_tta_tpu.models.saint import SAINTEncoder
            # SAINT variant hard-codes its own hyperparameters
            # (``STiLModel_SAINT_backbone.py:108-142``).
            self.encoder_tabular = SAINTEncoder(
                cat_lengths=cat_lengths, num_continuous=len(con_lengths),
                token_dim=32, out_dim=self.tabular_embedding_dim,
                depth=1, heads=4, attentiontype="colrow",
                ff_dropout=self.saint_ff_dropout, dtype=self.dtype)
        else:
            self.encoder_tabular = TabularTransformerEncoder(
                cat_lengths=cat_lengths, con_lengths=con_lengths,
                embedding_dim=self.tabular_embedding_dim,
                num_layers=self.tabular_num_layers,
                embedding_dropout=self.embedding_dropout,
                drop_rate=self.drop_rate, dtype=self.dtype)
        hid = self.multimodal_embedding_dim
        # SAINT backbone overrides the tabular token dim to 32
        # (``STiLModel_SAINT_backbone.py:116-125``); projections lift it
        # back to the fusion dim.
        tab_dim = 32 if self.tabular_encoder == "saint" \
            else self.tabular_embedding_dim
        self.projection_si = MLPHead(hid, hid, dtype=self.dtype)
        self.projection_ai = MLPHead(hid, hid, dtype=self.dtype)
        self.projection_st = MLPHead(tab_dim, hid, dtype=self.dtype)
        self.projection_at = MLPHead(tab_dim, hid, dtype=self.dtype)
        self.reduce = Linear(hid, dtype=self.dtype)
        self.transformer = [
            MITransformerLayer(num_heads=4, mlp_ratio=1.0, qkv_bias=True,
                               attn_drop=0.1, proj_drop=0.1, drop_path=0.1,
                               dtype=self.dtype, name=f"fusion_{i}")
            for i in range(self.multimodal_num_layers)
        ]
        head_t = jnp.promote_types(self.dtype, jnp.float32)
        self.classifier_multimodal = Linear(self.num_classes, dtype=head_t)
        self.classifier_imaging = Linear(self.num_classes, dtype=head_t)
        self.classifier_tabular = Linear(self.num_classes, dtype=head_t)

    def encode(self, image, tabular, train: bool, missing_mask=None,
               int8_image: bool = False):
        """Disentangled features (``STiLModel_backbone.py:118-132``).

        ``int8_image``: quantized eval convs in the image tower
        (ResNets only — models/resnet.py ``int8``); the tabular
        encoder, projections and fusion stay exact."""
        if int8_image and not self.model.startswith("vit"):
            x_i = self.encoder_imaging(image, train=train, int8=True)[-1]
        else:
            x_i = self.encoder_imaging(image, train=train)[-1]  # (B,H,W,C)
        b, h, w, c = x_i.shape
        x_i = x_i.reshape(b, h * w, c)  # token order == torch (B,HW,C)
        if self.tabular_encoder == "saint":
            x_t = self.encoder_tabular(tabular, deterministic=not train)
        else:
            x_t = self.encoder_tabular(tabular, missing_mask=missing_mask,
                                       deterministic=not train)
        x_si = self.projection_si(x_i)               # (B, N_i, C)
        x_ai = self.projection_ai(jnp.mean(x_i, axis=1))  # (B, C)
        x_st = self.projection_st(x_t[:, 1:, :])     # (B, N_t, C)
        x_at = self.projection_at(x_t[:, 0, :])      # (B, C)
        return x_si, x_ai, x_st, x_at

    def fuse(self, x_si, x_ai, x_st, x_at, train: bool):
        """``STiLModel_backbone.py:135-147``."""
        x_c = self.reduce(jnp.concatenate([x_ai, x_at], axis=1))[:, None, :]
        for block in self.transformer:
            x_si, x_st, x_c = block(x_si, x_st, x_c, deterministic=not train)
        return (jnp.mean(x_si, axis=1), jnp.mean(x_st, axis=1),
                jnp.mean(x_c, axis=1))

    def __call__(self, image, tabular, train: bool = False,
                 missing_mask=None, int8_image: bool = False):
        """Full forward; returns a dict superset of the reference's
        ``forward_all`` tuple (``STiLModel_backbone.py:150-156``)."""
        x_si, x_ai, x_st, x_at = self.encode(image, tabular, train,
                                             missing_mask, int8_image)
        x_si_pool = jnp.mean(x_si, axis=1)
        x_st_pool = jnp.mean(x_st, axis=1)
        x_si_enh, x_st_enh, x_c = self.fuse(x_si, x_ai, x_st, x_at, train)
        f32 = at_least_f32
        out_m = self.classifier_multimodal(
            f32(jnp.concatenate([x_si_enh, x_c, x_st_enh], axis=1)))
        out_i = self.classifier_imaging(
            f32(jnp.concatenate([x_si_enh, x_ai], axis=1)))
        out_t = self.classifier_tabular(
            f32(jnp.concatenate([x_st_enh, x_at], axis=1)))
        return {
            "out_m": out_m, "out_i": out_i, "out_t": out_t,
            "x_si_enhance": f32(x_si_enh), "x_si": f32(x_si_pool),
            "x_ai": f32(x_ai), "x_st_enhance": f32(x_st_enh),
            "x_st": f32(x_st_pool), "x_at": f32(x_at), "x_c": f32(x_c),
        }


class MatchBackbone(nn.Module):
    """Concat fusion with projection head + one classifier
    (``multimodal_backbone.py:37-124``)."""

    model: str
    field_lengths: Sequence[int]
    num_classes: int
    projection_dim: int = 128
    tabular_embedding_dim: int = 512
    multimodal_embedding_dim: int = 512
    tabular_num_layers: int = 4
    embedding_dropout: float = 0.0
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    def setup(self):
        cat_lengths, con_lengths = split_field_lengths(self.field_lengths)
        self.encoder_imaging = image_encoder(self.model, dtype=self.dtype)
        self.encoder_tabular = TabularTransformerEncoder(
            cat_lengths=cat_lengths, con_lengths=con_lengths,
            embedding_dim=self.tabular_embedding_dim,
            num_layers=self.tabular_num_layers,
            embedding_dropout=self.embedding_dropout,
            drop_rate=self.drop_rate, dtype=self.dtype)
        hid = self.multimodal_embedding_dim
        self.image_proj = Linear(hid, dtype=self.dtype)
        self.tabular_proj = (
            Linear(hid, dtype=self.dtype)
            if self.tabular_embedding_dim != hid else None)
        self.head = MLPHead(hid, self.projection_dim, dtype=self.dtype)
        self.classifier_multimodal = Linear(
            self.num_classes, dtype=jnp.promote_types(self.dtype,
                                                       jnp.float32))

    def __call__(self, image, tabular, train: bool = False):
        x_i = self.encoder_imaging(image, train=train)[0]
        x_t = self.encoder_tabular(tabular, deterministic=not train)
        t_cls = x_t[:, 0, :]
        if self.tabular_proj is not None:
            t_cls = self.tabular_proj(t_cls)
        x_m = jnp.concatenate([self.image_proj(x_i), t_cls], axis=1)
        embedding = at_least_f32(self.head(x_m))
        logits = self.classifier_multimodal(at_least_f32(x_m))
        embedding = embedding / (
            jnp.linalg.norm(embedding, axis=1, keepdims=True) + 1e-12)
        return logits, embedding


class SemiMultimodalBackbone(nn.Module):
    """Concat fusion with three classifiers
    (``Multimodal_model.py:36-122``)."""

    model: str
    field_lengths: Sequence[int]
    num_classes: int
    projection_dim: int = 128
    tabular_embedding_dim: int = 512
    multimodal_embedding_dim: int = 512
    tabular_num_layers: int = 4
    embedding_dropout: float = 0.0
    drop_rate: float = 0.0
    tabular_encoder: str = "transformer"
    saint_ff_dropout: float = 0.8  # see DisCoBackbone.saint_ff_dropout
    dtype: Any = jnp.bfloat16

    def setup(self):
        cat_lengths, con_lengths = split_field_lengths(self.field_lengths)
        self.encoder_imaging = image_encoder(self.model, dtype=self.dtype)
        if self.tabular_encoder == "saint":
            from stil_tta_tpu.models.saint import SAINTEncoder
            self.encoder_tabular = SAINTEncoder(
                cat_lengths=cat_lengths, num_continuous=len(con_lengths),
                token_dim=32, out_dim=self.tabular_embedding_dim,
                depth=1, heads=4, attentiontype="colrow",
                ff_dropout=self.saint_ff_dropout, dtype=self.dtype)
        else:
            self.encoder_tabular = TabularTransformerEncoder(
                cat_lengths=cat_lengths, con_lengths=con_lengths,
                embedding_dim=self.tabular_embedding_dim,
                num_layers=self.tabular_num_layers,
                embedding_dropout=self.embedding_dropout,
                drop_rate=self.drop_rate, dtype=self.dtype)
        hid = self.multimodal_embedding_dim
        pooled = EMBEDDING_DIM[self.model]
        self.image_proj = Linear(hid, dtype=self.dtype)
        self.tabular_proj = (
            Linear(hid, dtype=self.dtype)
            if self.tabular_embedding_dim != hid else None)
        self.multimodal_proj = Linear(self.projection_dim, dtype=self.dtype)
        head_t = jnp.promote_types(self.dtype, jnp.float32)
        self.classifier_multimodal = Linear(self.num_classes, dtype=head_t)
        self.classifier_imaging = Linear(self.num_classes, dtype=head_t)
        self.classifier_tabular = Linear(self.num_classes, dtype=head_t)
        del pooled

    def __call__(self, image, tabular, train: bool = False):
        x_i = self.encoder_imaging(image, train=train)[0]
        x_t = self.encoder_tabular(tabular, deterministic=not train)
        t_cls = x_t[:, 0, :]
        proj_t = self.tabular_proj(t_cls) if self.tabular_proj is not None \
            else t_cls
        x_m = self.multimodal_proj(
            jnp.concatenate([self.image_proj(x_i), proj_t], axis=1))
        out_m = self.classifier_multimodal(at_least_f32(x_m))
        out_i = self.classifier_imaging(at_least_f32(x_i))
        out_t = self.classifier_tabular(at_least_f32(t_cls))
        return out_m, out_i, out_t, at_least_f32(x_m)
