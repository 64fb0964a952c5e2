"""Process-level JAX runtime setup: persistent compilation cache.

The first compile of the fused train step is expensive (remote-compile
over the axon tunnel); the persistent cache makes subsequent runs start
in seconds. Call ``setup()`` before the first jitted computation.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or "/root/repo/.jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation only
