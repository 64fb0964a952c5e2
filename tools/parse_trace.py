#!/usr/bin/env python
"""Parse a jax.profiler perfetto trace into a per-op cost table, and
optionally resolve hot fusion names against a dumped HLO text.

Usage:
  python tools/parse_trace.py /tmp/jaxtrace [--hlo /tmp/step_hlo.txt]

Produces the top-N device ops by accumulated duration; with --hlo, each
hot fusion is annotated with its output shape and op histogram so you
can see *what* it computes (e.g. BN stat reductions vs conv fusions).
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re
from pathlib import Path


def load_events(trace_dir: str):
    paths = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f).get("traceEvents", [])


def op_table(events, top: int = 30):
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "device" in n.lower()}
    by_name = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids:
            by_name[e.get("name", "?")] += e["dur"]
    return by_name.most_common(top)


def annotate(name: str, hlo: str):
    m = re.search(rf"%{re.escape(name)} = ([^\n]+)", hlo)
    if not m:
        return ""
    line = m.group(1)
    shape = line.split(" fusion(")[0][:80]
    meta = re.search(r'op_name="([^"]+)"', line)
    return f"{shape} | {meta.group(1)[:90] if meta else ''}"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--hlo", default=None)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    events = load_events(args.trace_dir)
    hlo = open(args.hlo).read() if args.hlo else None
    for name, us in op_table(events, args.top):
        extra = annotate(name, hlo) if hlo else ""
        print(f"{us / 1000:10.2f} ms  {name[:60]:60s} {extra}")


if __name__ == "__main__":
    main()
