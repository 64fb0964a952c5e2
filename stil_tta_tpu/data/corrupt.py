"""On-device tabular corruption.

Parity target: ``/root/reference/datasets/
ContrastiveImagingAndTabularDataset.py:146-158`` (``corrupt``): pick
``floor(F * rate)`` distinct feature indices per row and replace each
with a value drawn from that feature's empirical marginal distribution
(a uniformly random row of the training table).

TPU-native: the marginal table is the (N, F) training matrix resident on
device; corruption is a per-row random permutation (to choose distinct
columns) + a uniform row-index draw + one gather — all inside the jitted
train step. The weak multimodal view uses rate 0.1
(``StrongWeakImagingAndTabularDataset.py:79``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def corrupt_tabular(key: jax.Array, rows: jax.Array, marginal: jax.Array,
                    rate: float) -> jax.Array:
    """rows: (B, F); marginal: (N, F) training table. Returns (B, F)."""
    b, f = rows.shape
    n = marginal.shape[0]
    n_corrupt = int(f * rate)
    if n_corrupt == 0:
        return rows
    k_perm, k_pick = jax.random.split(key)
    # distinct column choice per row: argsort of uniform noise == a
    # uniform random permutation, batched without a Python loop
    noise = jax.random.uniform(k_perm, (b, f))
    ranks = jnp.argsort(noise, axis=1).argsort(axis=1)
    mask = ranks < n_corrupt  # (B, F) exactly n_corrupt True per row
    src_rows = jax.random.randint(k_pick, (b, f), 0, n)
    col_ids = jnp.broadcast_to(jnp.arange(f)[None, :], (b, f))
    sampled = marginal[src_rows, col_ids]
    return jnp.where(mask, sampled.astype(rows.dtype), rows)
