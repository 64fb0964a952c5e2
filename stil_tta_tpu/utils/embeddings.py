"""Embedding-space helpers.

Parity target: ``/root/reference/utils/utils.py:343-373`` —
``cos_sim_collate`` (batch assembly + pairwise cosine-similarity matrix
with optional thresholding) and ``calc_logits_labels`` (InfoNCE logits
+ diagonal labels). The reference builds the similarity matrix with an
O(n^2) Python loop over ``torch.nn.CosineSimilarity``; here it is one
normalised matmul (MXU-friendly, jit-safe).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cosine_similarity_matrix(embeddings: jax.Array,
                             threshold: Optional[float] = None
                             ) -> jax.Array:
    """Pairwise cosine similarity of row embeddings (N, D) -> (N, N).

    With ``threshold`` set, entries <= threshold are zeroed
    (``torch.threshold`` semantics as used at ``utils.py:361-362``).
    """
    z = _l2norm(jnp.asarray(embeddings, jnp.float32))
    sim = jnp.matmul(z, z.T, precision=jax.lax.Precision.HIGHEST)
    if threshold is not None:
        sim = jnp.where(sim > threshold, sim, 0.0)
    return sim


def cos_sim_collate(view_1: Sequence, view_2: Sequence,
                    labels: Sequence, embeddings: Sequence,
                    threshold: Optional[float] = None):
    """Batch assembly + similarity matrix (``utils.py:343-364``): stacks
    the two view lists, tensorises labels, and returns the (optionally
    thresholded) cosine-similarity matrix of the sample embeddings."""
    v1 = jnp.stack([jnp.asarray(v) for v in view_1])
    v2 = jnp.stack([jnp.asarray(v) for v in view_2])
    y = jnp.asarray(labels)
    emb = jnp.stack([jnp.asarray(e, jnp.float32).ravel()
                     for e in embeddings])
    return v1, v2, y, cosine_similarity_matrix(emb, threshold)


def calc_logits_labels(out0: jax.Array, out1: jax.Array,
                       temperature: float = 0.1
                       ) -> Tuple[jax.Array, jax.Array]:
    """InfoNCE logits between two normalised embedding batches and the
    matching diagonal labels (``utils.py:366-373``)."""
    z0 = _l2norm(jnp.asarray(out0, jnp.float32), axis=1)
    z1 = _l2norm(jnp.asarray(out1, jnp.float32), axis=1)
    logits = jnp.matmul(z0, z1.T,
                        precision=jax.lax.Precision.HIGHEST) \
        / temperature
    labels = jnp.arange(z0.shape[0], dtype=jnp.int32)
    return logits, labels
