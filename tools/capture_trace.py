#!/usr/bin/env python
"""Capture a jax.profiler trace of the headline bench step.

Sets up the exact bench configuration (bench.py, reference DVM shape,
micro_batches profile from STIL_BENCH_MICRO) compiled through
``jax_setup.tuned_compile``, warms it, then traces ``STIL_TRACE_CALLS``
dispatched blocks (default 1 = 32 fused steps) into ``STIL_TRACE_DIR``
(default /tmp/jaxtrace). Feed the result to ``tools/parse_trace.py``
for the per-op table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from stil_tta_tpu.utils import jax_setup
    jax_setup.setup()
    import jax.numpy as jnp
    import numpy as np

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.data.loader import DeviceCache
    from stil_tta_tpu.data.source import synthetic_source
    from stil_tta_tpu.train.multistep import make_scan_train_step

    batch_size = int(os.environ.get("STIL_BENCH_BATCH", "512"))
    l_batch = batch_size // 8
    u_batch = batch_size - l_batch
    img_size = int(os.environ.get("STIL_BENCH_IMG", "128"))
    num_classes = int(os.environ.get("STIL_BENCH_CLASSES", "286"))
    fields = os.environ.get("STIL_BENCH_FIELDS", "dvm")
    if fields == "dvm":
        field_lengths = [20, 10, 5, 3] + [1] * 13
    elif fields == "cardiac":
        field_lengths = [2] * 20 + [3, 4, 5, 6, 7, 8] + [1] * 49
    else:
        field_lengths = [int(x) for x in fields.split(",")]
    model = os.environ.get("STIL_BENCH_MODEL", "resnet50")
    config_name = os.environ.get("STIL_BENCH_CONFIG", "config_dvm_STiL")
    cfg = load_config(config_name, overrides=[
        "dataset=synthetic_dvm", f"models={model}",
        f"batch_size={batch_size}", f"num_classes={num_classes}",
        f"img_size={img_size}", "start_epoch=0", "tta=false",
    ])
    cfg.field_lengths = field_lengths
    cfg.repeat_ratio = 1
    # mirror bench.py's headline-profile defaults exactly (micro=4 +
    # bf16 Adam mu for the DVM STiL config, gated on divisibility) so
    # the trace profiles the same executable as the headline bench
    default_micro = (4 if config_name == "config_dvm_STiL"
                     and l_batch % 4 == 0 and u_batch % 4 == 0
                     else (cfg.micro_batches or 1))
    cfg.micro_batches = int(os.environ.get("STIL_BENCH_MICRO",
                                           str(default_micro)))
    mu_env = os.environ.get("STIL_BENCH_MU_DTYPE")
    if mu_env:
        cfg.adam_mu_dtype = None if mu_env == "float32" else mu_env
    elif cfg.micro_batches > 1 and config_name == "config_dvm_STiL":
        cfg.adam_mu_dtype = "bfloat16"
    if os.environ.get("STIL_BENCH_TEACHER_INT8"):
        cfg.teacher_int8 = os.environ["STIL_BENCH_TEACHER_INT8"] != "0"

    src_l = synthetic_source(max(l_batch * 4, 256), num_classes=num_classes,
                             field_lengths=field_lengths,
                             image_size=img_size, labelled_frac=1.0, seed=0)
    src_u = synthetic_source(max(u_batch * 4, 1792), num_classes=num_classes,
                             field_lengths=field_lengths,
                             image_size=img_size, labelled_frac=0.0, seed=1)
    if cfg.algorithm_name == "SimMatch" and not cfg.K:
        cfg.K = len(src_l)
    algo = get_algorithm(cfg.algorithm_name)(cfg, field_lengths)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    rng = jax_setup.training_key(0)
    state = algo.init_state(rng, jnp.zeros((2, img_size, img_size, 3)),
                            jnp.asarray(src_l.tabular[:2]))
    train_step = algo.make_train_step()
    k = int(os.environ.get("STIL_BENCH_K", "32"))
    scan_step = make_scan_train_step(train_step, k)
    epoch = jnp.asarray(1, jnp.int32)
    rs = np.random.RandomState(0)

    def idx_block():
        return (jnp.asarray(rs.randint(0, len(src_l), (k, l_batch)),
                            jnp.int32),
                jnp.asarray(rs.randint(0, len(src_u), (k, u_batch)),
                            jnp.int32))

    il, iu = idx_block()
    scan_step = jax_setup.tuned_compile(scan_step, state, cache_l, cache_u,
                                        il, iu, epoch)
    state = scan_step(state, cache_l, cache_u, il, iu, epoch)
    assert int(state.step) == k
    # timed, untraced reference call
    t0 = time.perf_counter()
    il, iu = idx_block()
    state = scan_step(state, cache_l, cache_u, il, iu, epoch)
    _ = int(state.step)
    dt = time.perf_counter() - t0
    print(f"untraced: {dt / k * 1e3:.3f} ms/step")

    trace_dir = os.environ.get("STIL_TRACE_DIR", "/tmp/jaxtrace")
    n_calls = int(os.environ.get("STIL_TRACE_CALLS", "1"))
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        il, iu = idx_block()
        state = scan_step(state, cache_l, cache_u, il, iu, epoch)
    _ = int(state.step)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced: {dt / (n_calls * k) * 1e3:.3f} ms/step "
          f"({n_calls} calls) -> {trace_dir}")


if __name__ == "__main__":
    main()
