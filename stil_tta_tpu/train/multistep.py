"""Multi-step dispatch: run K fused train steps per device call.

The per-call dispatch to the accelerator costs real time on high-latency
links (docs/DESIGN.md); `lax.scan` over the step body amortises it K-fold
— the host ships one (K, B) index block per call instead of K vectors.
Enabled via ``steps_per_dispatch`` in the config; the epoch tail falls
back to single steps.
"""

from __future__ import annotations

import jax


def make_scan_train_step(jitted_step, k: int):
    """Wrap an algorithm's jitted train step (signature
    ``(state, cache_l, cache_u, idx_l, idx_u, epoch)``) into a scanned
    K-step program. Uses the uncompiled body via ``__wrapped__``."""
    body = getattr(jitted_step, "__wrapped__", None)
    if body is None:
        raise ValueError("train step does not expose __wrapped__")

    def scan_fn(state, cache_l, cache_u, idx_l_k, idx_u_k, epoch):
        def f(s, idx):
            il, iu = idx
            return body(s, cache_l, cache_u, il, iu, epoch), None

        state, _ = jax.lax.scan(f, state, (idx_l_k, idx_u_k),
                                unroll=_scan_unroll())
        return state

    return jax.jit(scan_fn, donate_argnums=(0,))


def _scan_unroll() -> int:
    """Steps unrolled per while-loop iteration (STIL_SCAN_UNROLL,
    default 1). >1 lets XLA software-pipeline across step boundaries at
    the cost of a proportionally larger program; measured neutral at the
    bench shape (docs/BENCHMARKS.md) so the default stays 1."""
    import os
    return int(os.environ.get("STIL_SCAN_UNROLL", "1"))


def make_scan_stream_step(jitted_step, k: int):
    """Host-stream variant of :func:`make_scan_train_step`: scan over
    K stacked per-batch "virtual caches" (leaves shaped (K, B, ...))
    instead of K index vectors into a device cache. The corruption
    marginals (full tabular tables) are passed separately and shared
    across the K steps, keeping the marginal semantics exact."""
    body = getattr(jitted_step, "__wrapped__", None)
    if body is None:
        raise ValueError("train step does not expose __wrapped__")

    def scan_fn(state, vl_k, vu_k, marg_l, marg_u, idx_l, idx_u, epoch):
        def f(s, caches):
            bl, bu = caches
            bl = dict(bl, marginal=marg_l)
            bu = dict(bu, marginal=marg_u)
            return body(s, bl, bu, idx_l, idx_u, epoch), None

        state, _ = jax.lax.scan(f, state, (vl_k, vu_k))
        return state

    return jax.jit(scan_fn, donate_argnums=(0,))


def chunk_indices(pairs, k: int):
    """Group an iterable of (idx_l, idx_u) into ((K,Bl),(K,Bu)) blocks +
    a list of leftover single pairs."""
    import numpy as np
    pairs = list(pairs)
    blocks = []
    n_full = len(pairs) // k
    for i in range(n_full):
        chunk = pairs[i * k:(i + 1) * k]
        blocks.append((np.stack([c[0] for c in chunk]),
                       np.stack([c[1] for c in chunk])))
    tail = pairs[n_full * k:]
    return blocks, tail
