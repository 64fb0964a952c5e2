"""SAINT tabular encoder (col + colrow intersample attention), Flax.

Parity target: ``/root/reference/models/Disentangle/utils/SAINT/
model_util.py`` (Attention ``:60-87``, GEGLU FeedForward ``:43-57``,
RowColTransformer ``:90-129``) and the encoder path the STiL-SAINT
backbone actually drives (``/root/reference/models/Disentangle/utils/
STiLModel_SAINT_backbone.py:159-184``):

- CLS column id 0 prepended to the categorical columns;
  ``categories_offset = cumsum([0, 1] + cats)[:-1]`` (1 special token).
- Per-continuous-column MLP [1 -> 100 -> dim] embeddings, vectorised here
  into two einsums over a stacked per-column weight tensor (the reference
  loops per column — a Python loop we fold onto the MXU).
- Positional encodings added to the categorical tokens only (reference
  quirk, ``STiLModel_SAINT_backbone.py:176-180``).
- 'colrow': column self-attention over tokens at ``dim``, then *row*
  (intersample) attention over the flattened per-row vector with the
  batch as the sequence axis (``model_util.py:113-121``). Under GSPMD
  data parallelism the batch axis is a *logical* axis: XLA inserts the
  collectives so intersample attention mixes the GLOBAL batch, and the
  sharded result equals the single-device result
  (``tests/test_mesh.py::test_saint_intersample_global_under_sharding``).
  That is stronger than the reference under DDP, where each rank's
  intersample attention sees only its local batch.
- Reference quirk kept: SAINT's Attention defines but never applies its
  dropout (``model_util.py:75-86``), so only the FeedForward dropout is
  active.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from stil_tta_tpu.models.layers import _merge_heads, _split_heads


class SaintAttention(nn.Module):
    """``model_util.py:60-87`` (no bias on qkv, bias on out; dropout
    defined-unused in the reference, so omitted)."""

    heads: int = 8
    dim_head: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = self.dim_head * self.heads
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))
        # accumulate in at-least-f32 (f64 inputs keep f64 — the golden
        # parity tests run end-to-end f64)
        acc_t = jnp.promote_types(v.dtype, jnp.float32)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=acc_t)
        attn = jax.nn.softmax(attn * self.dim_head ** -0.5, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=acc_t).astype(v.dtype)
        out = _merge_heads(out)
        return nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """``model_util.py:43-57``."""

    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        h = nn.Dense(dim * self.mult * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        a, gates = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(gates, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


class SAINTEncoder(nn.Module):
    """SAINT encoder producing (B, 1 + ncat + ncon, token_dim) tokens,
    CLS first. ``out_dim`` is unused for projection (the DisCo backbone
    projects 32 -> 512 itself) but recorded for introspection."""

    cat_lengths: Sequence[int]
    num_continuous: int
    token_dim: int = 32
    out_dim: int = 32
    depth: int = 1
    heads: int = 4
    dim_head: int = 16
    attentiontype: str = "colrow"
    ff_dropout: float = 0.8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ncat = len(self.cat_lengths)
        ncon = self.num_continuous
        b = x.shape[0]
        dim = self.token_dim

        # categories_offset = cumsum([0, 1] + cats)[:-1]
        offsets = jnp.cumsum(jnp.asarray(
            [0, 1] + [int(c) for c in self.cat_lengths], jnp.int32))[:-1]
        total_tokens = int(sum(int(c) for c in self.cat_lengths)) + 1

        cls = jnp.zeros((b, 1), jnp.int32)
        # clamp per-column to the valid cardinality range (an unclamped
        # jnp gather fills NaN under jit on out-of-range values; torch
        # would hard-crash instead)
        lens = jnp.asarray([int(c) for c in self.cat_lengths], jnp.int32)
        cat = jnp.clip(x[:, :ncat].astype(jnp.int32), 0, lens - 1)
        x_categ = jnp.concatenate([cls, cat], axis=1) + offsets
        embeds = nn.Embed(total_tokens, dim, param_dtype=jnp.float32,
                          name="embeds")
        x_categ_enc = embeds(x_categ).astype(self.dtype)  # (B, ncat+1, dim)

        # per-continuous-column MLP [1 -> 100 -> dim], vectorised
        if ncon > 0:
            w1 = self.param("con_mlp_w1", nn.initializers.lecun_normal(),
                            (ncon, 1, 100), jnp.float32)
            b1 = self.param("con_mlp_b1", nn.initializers.zeros,
                            (ncon, 100), jnp.float32)
            w2 = self.param("con_mlp_w2", nn.initializers.lecun_normal(),
                            (ncon, 100, dim), jnp.float32)
            b2 = self.param("con_mlp_b2", nn.initializers.zeros,
                            (ncon, dim), jnp.float32)
            con = x[:, ncat:].astype(self.dtype)[..., None]  # (B, ncon, 1)
            h = jnp.einsum("bci,cih->bch", con, w1.astype(self.dtype)) \
                + b1.astype(self.dtype)
            h = nn.relu(h)
            x_cont_enc = jnp.einsum("bch,cho->bco", h,
                                    w2.astype(self.dtype)) \
                + b2.astype(self.dtype)
        else:
            x_cont_enc = jnp.zeros((b, 0, dim), self.dtype)

        # positional encodings on categorical tokens only (reference quirk)
        pos_embed = nn.Embed(ncat + ncon, dim, param_dtype=jnp.float32,
                             name="pos_encodings")
        x_categ_enc = x_categ_enc + pos_embed(
            jnp.arange(ncat + 1)).astype(self.dtype)[None]

        tokens = jnp.concatenate([x_categ_enc, x_cont_enc], axis=1)
        n = tokens.shape[1]

        # Reference quirk (ground-truthed against the real module,
        # tests/test_reference_golden.py): SAINT composes each sublayer
        # as ``PreNorm(dim, Residual(fn))`` (``model_util.py:24-39``),
        # i.e. ``fn(norm(x)) + norm(x)`` — the residual carries the
        # NORMED input, not the raw one (the standard pre-norm form
        # ``x + fn(norm(x))`` is NOT what the reference computes).
        for layer in range(self.depth):
            if self.attentiontype in ("col", "colrow"):
                h = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, dtype=self.dtype,
                                 name=f"l{layer}_norm_col")(tokens)
                tokens = h + SaintAttention(
                    self.heads, self.dim_head, dtype=self.dtype,
                    name=f"l{layer}_attn_col")(h)
                h = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, dtype=self.dtype,
                                 name=f"l{layer}_norm_ff_col")(tokens)
                tokens = h + GEGLUFeedForward(
                    4, self.ff_dropout, dtype=self.dtype,
                    name=f"l{layer}_ff_col")(h, deterministic)
            if self.attentiontype in ("row", "colrow"):
                # intersample attention: batch becomes the sequence axis
                flat = tokens.reshape(1, b, n * dim)
                h = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, dtype=self.dtype,
                                 name=f"l{layer}_norm_row")(flat)
                flat = h + SaintAttention(
                    self.heads, 64, dtype=self.dtype,
                    name=f"l{layer}_attn_row")(h)
                h = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, dtype=self.dtype,
                                 name=f"l{layer}_norm_ff_row")(flat)
                flat = h + GEGLUFeedForward(
                    4, self.ff_dropout, dtype=self.dtype,
                    name=f"l{layer}_ff_row")(h, deterministic)
                tokens = flat.reshape(b, n, dim)
        return tokens
