"""Process-level JAX runtime setup: persistent compilation cache and
tuned TPU compiler options.

The first compile of the fused train step is expensive (remote-compile
over the axon tunnel); the persistent cache makes subsequent runs start
in seconds. Call ``setup()`` before the first jitted computation.
"""

from __future__ import annotations

import os

# Winners of the v5e compiler-flag sweeps (tools/bench_xla_flags.py,
# docs/BENCHMARKS.md): +5.3% from the round-1 pair (the experimental
# fusion cost model makes profitable the extra fusions that
# input_conv_multi_users admits into conv producers; each is neutral
# alone) and +1.5% from layout negotiation (round 2 — relaxes the
# batch-minor/channel-minor layout mismatch between the 64- and
# 256-channel bottleneck activations inside the residual-join fusions).
TUNED_TPU_COMPILER_OPTIONS = {
    "xla_tpu_enable_experimental_fusion_cost_model": "true",
    "xla_tpu_input_conv_multi_users": "true",
    "xla_tpu_allow_layout_negotiation": "true",
}


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


def training_key(seed: int):
    """PRNG key for the training hot path.

    On TPU the counter-based ``rbg`` generator (hardware
    RngBitGenerator) replaces threefry's key-derivation kernel chains —
    the fused train step burns ~2-3 ms/step deriving per-sample
    augmentation and dropout keys with threefry. The typed key
    propagates the impl through every ``split``/``fold_in`` inside the
    step. Override with ``STIL_PRNG_IMPL`` (e.g. ``threefry2x32`` for
    cross-backend reproducibility of random streams).
    """
    import jax

    impl = os.environ.get("STIL_PRNG_IMPL")
    if impl in ("threefry",):  # jax >= 0.9 renamed the impl
        impl = "threefry2x32"
    if impl is None:
        impl = "rbg" if is_tpu_backend() else "threefry2x32"
    return jax.random.key(int(seed), impl=impl)


def is_tpu_backend() -> bool:
    import jax
    try:
        dev = jax.devices()[0]
        return "tpu" in (dev.platform + " " + dev.device_kind).lower()
    except Exception:
        return False


def tuned_compile(jit_fn, *example_args, options=None):
    """AOT-compile a jitted function with the tuned TPU compiler options
    (falling back to ``jit_fn`` unchanged off-TPU or if the runtime
    rejects the options). The returned executable is shape-specialised
    to ``example_args`` — exactly right for the static-shape train/eval
    steps. Opt out with ``STIL_DISABLE_TUNED_XLA=1``.

    Delivery note: these are *server-side* (libtpu) flags. The axon
    client's XLA_FLAGS parser rejects them; PJRT per-compile options are
    forwarded to remote_compile and validated there.
    """
    if os.environ.get("STIL_DISABLE_TUNED_XLA"):
        return jit_fn
    if not is_tpu_backend():
        return jit_fn
    opts = dict(TUNED_TPU_COMPILER_OPTIONS if options is None else options)
    env = os.environ.get("STIL_TPU_COMPILER_OPTIONS")
    if env:  # explicit override (tools/bench_xla_flags.py)
        import json
        opts = json.loads(env)
    if not opts:
        return jit_fn
    try:
        return jit_fn.lower(*example_args).compile(compiler_options=opts)
    except Exception:
        return jit_fn


def lazy_tuned(jit_fn):
    """Defer ``tuned_compile`` until the first call supplies example
    arguments (the hot-path steps in the training driver). AOT
    executables are shape-specialised, so compilations are keyed on the
    argument shapes/dtypes (e.g. val vs test caches differ in length)."""
    import jax

    cache = {}

    def call(*args):
        key = tuple(
            (getattr(leaf, "shape", ()), str(getattr(leaf, "dtype", "")))
            for leaf in jax.tree_util.tree_leaves(args))
        fn = cache.get(key)
        if fn is None:
            fn = tuned_compile(jit_fn, *args)
            cache[key] = fn
        return fn(*args)

    return call
