#!/usr/bin/env python
"""XLA TPU compiler-flag sweep over bench.py.

Runs ``bench.py`` in a subprocess per flag set (each set recompiles —
the persistent cache keys on flags) and prints a result table. TPU jobs
are serialized: one subprocess at a time, each run to completion.

Usage: python tools/bench_xla_flags.py [--quick]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Flag names verified against this libtpu build:
#   strings libtpu.so | grep '^xla_tpu_'
# Delivery: PJRT per-compile options (bench.py reads
# STIL_TPU_COMPILER_OPTIONS). The axon client's XLA_FLAGS parser
# rejects server-side --xla_tpu_* names; compiler_options are forwarded
# to the server's remote_compile and validated there (bogus names 500).
SWEEP = [
    ("baseline", {}),
    ("space_to_batch", {"xla_tpu_run_space_to_batch": "true"}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("aggr_loop_fusion_layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    # combos around the round-1 winner (experimental fusion cost model)
    ("fcm_repeat",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("fcm_s2b",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true",
      "xla_tpu_run_space_to_batch": "true"}),
    ("fcm_conv_multi",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true",
      "xla_tpu_input_conv_multi_users": "true"}),
    ("conv_multi",
     {"xla_tpu_input_conv_multi_users": "true"}),
    ("fcm_join_mxu",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true",
      "xla_tpu_join_mxu_result_add": "true"}),
    ("win_downcast",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true",
      "xla_tpu_input_conv_multi_users": "true",
      "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"}),
    ("win_x8prod",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true",
      "xla_tpu_input_conv_multi_users": "true",
      "xla_tpu_fuse_non_trivial_x8_producers_into_conv_like": "true"}),
    ("win_dotdot",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true",
      "xla_tpu_input_conv_multi_users": "true",
      "xla_tpu_dot_dot_fusion": "true"}),
]

# Round-2 sweep: winner pair + one candidate each, targeting the
# backward reduce fusions / layouts / schedulers the round-2 trace
# attribution names (backward 47 ms of the 97 ms step).
_WIN = {"xla_tpu_enable_experimental_fusion_cost_model": "true",
        "xla_tpu_input_conv_multi_users": "true"}
SWEEP_R2 = [("baseline_win", dict(_WIN))] + [
    (name, {**_WIN, flag: "true"})
    for name, flag in [
        ("reduce_input_fusion",
         "xla_tpu_allow_input_fusion_in_certain_reduce_ops"),
        ("backward_prop_reduce", "xla_tpu_backward_propagate_reduce"),
        ("multi_dim_reduce_rwb", "xla_tpu_allow_multi_dim_reduce_rwb"),
        ("rwb_fusion", "xla_tpu_rwb_fusion"),
        ("nested_loop_fusion",
         "xla_tpu_enable_multi_level_nested_loop_fusion"),
        ("pincer_short_fusion",
         "xla_tpu_enable_pincer_short_fusion_emitter"),
        ("large_2nd_minor_x16",
         "xla_tpu_enable_large_2nd_minor_layout_for_x16"),
        ("untiled_layout", "xla_tpu_enable_untiled_layout"),
        ("reduce_window_as_conv",
         "xla_tpu_handle_reduce_window_as_convolution"),
        ("conv_normalizer",
         "xla_tpu_impure_enable_convolution_normalizer"),
        ("vmem_to_vmem_dmas", "xla_tpu_enable_vmem_to_vmem_dmas"),
        ("pipelined_unroll", "xla_tpu_enable_pipelined_loop_unrolling"),
        ("ilp_scheduler", "xla_tpu_enable_ilp_latency_hiding_scheduler"),
        ("all_sched_features",
         "xla_tpu_enable_all_experimental_scheduler_features"),
        ("fusion_layout_update", "xla_tpu_enable_fusion_layout_update"),
        ("layout_hints", "xla_tpu_enable_layout_hints"),
    ]
]


def run_one(name: str, flags: dict) -> dict | None:
    env = dict(os.environ)
    if flags:
        env["STIL_TPU_COMPILER_OPTIONS"] = json.dumps(flags)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=2400)
    except subprocess.TimeoutExpired:
        print(f"{name:<20s} TIMEOUT", flush=True)
        return None
    line = None
    for ln in out.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and "samples_per_sec" in ln:
            line = ln
    if line is None:
        print(f"{name:<20s} FAILED rc={out.returncode}\n"
              f"{out.stderr[-500:]}", flush=True)
        return None
    rec = json.loads(line)
    print(f"{name:<20s} {rec['value']:9.1f} samples/s "
          f"(vs_baseline {rec['vs_baseline']})", flush=True)
    rec["name"] = name
    rec["flags"] = flags
    return rec


def main():
    only = sys.argv[1:]
    sweep = SWEEP
    if only and only[0] == "--round2":
        sweep, only = SWEEP_R2, only[1:]
    results = []
    for name, flags in sweep:
        if only and name not in only:
            continue
        rec = run_one(name, flags)
        if rec:
            results.append(rec)
    if results:
        best = max(results, key=lambda r: r["value"])
        print(f"\nBEST: {best['name']} ({best['value']} samples/s) "
              f"flags: {best['flags'] or '<none>'}")


if __name__ == "__main__":
    main()
