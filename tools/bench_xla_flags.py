#!/usr/bin/env python
"""XLA TPU compiler-flag sweep over bench.py.

Runs ``bench.py`` in a subprocess per flag set (each set recompiles —
the persistent cache keys on flags) and prints a result table. TPU jobs
are serialized: one subprocess at a time, each run to completion.

Usage: python tools/bench_xla_flags.py [--quick]
"""

from __future__ import annotations

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
    results = []
    for name, flags in SWEEP:
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
