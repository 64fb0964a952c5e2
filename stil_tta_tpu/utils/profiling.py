"""Profiling / tracing utilities.

The reference constructs a torch.profiler that is never started
(``utils/utils.py:376-382`` — dead scaffolding, SURVEY.md §5) and keeps
attention-map capture hooks for visualisation
(``models/Transformer.py:48-61``). TPU equivalents:

- :func:`trace` — a context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard trace directory.
- :func:`step_timer` — wall-clock per-step timing with device sync.
- attention-map capture: run the tabular encoder blocks with
  ``return_attn=True`` via :func:`capture_attention`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates device-synchronised step timings."""

    def __init__(self):
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "p50_s": ts[len(ts) // 2],
            "p95_s": ts[int(len(ts) * 0.95)],
        }


def capture_attention(encoder, variables, x, missing_mask=None):
    """Per-block self-attention maps from the tabular encoder
    (visualisation parity with ``Transformer.py:48-61, 106-134``).
    Returns (tokens, [ (B, heads, N, N) per block ])."""
    return encoder.apply(variables, x, missing_mask=missing_mask,
                         return_attn=True)


def attention_gradients(encoder, variables, x, scalar_fn,
                        missing_mask=None):
    """Gradients of a scalar w.r.t. each block's post-softmax attention
    map (the reference's ``save_attn_gradients`` hook,
    ``Transformer.py:51-55``), via a zero probe added to the maps.

    ``scalar_fn(tokens) -> scalar`` (e.g. a class logit through a head).
    Returns a list of (B, heads, N, N) gradient arrays.
    """
    import jax
    import jax.numpy as jnp

    b = x.shape[0]
    n = encoder.num_cat + encoder.num_con + 1
    heads = 8  # TabularTransformerEncoder blocks (Transformer.py:220-223)
    zeros = [jnp.zeros((b, heads, n, n), jnp.float32)
             for _ in range(encoder.num_layers)]

    def f(probes):
        tokens = encoder.apply(variables, x, missing_mask=missing_mask,
                               attn_probes=probes)
        return scalar_fn(tokens)

    return jax.grad(f)(zeros)
