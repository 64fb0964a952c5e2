"""Metric logging: stdout + JSONL + CSV dumps.

Replaces the reference's W&B(offline)/Lightning logging stack
(``run.py:2-3,73-80``, ``trainers/evaluate.py:180-181,217-219``): every
epoch's scalar streams go to a ``metrics.jsonl`` (W&B-offline-style
append log) and the final summaries to ``eval_results.csv`` /
``test_results.csv``.
"""

from __future__ import annotations

import csv
import json
import os
import time
from pathlib import Path
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, logdir: os.PathLike, echo: bool = True):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self.path = self.logdir / "metrics.jsonl"
        self.echo = echo
        self.latest: Dict[str, float] = {}

    def log(self, metrics: Dict[str, float], step: Optional[int] = None,
            prefix: str = "") -> None:
        record = {f"{prefix}{k}": (float(v) if hasattr(v, "__float__") else v)
                  for k, v in metrics.items()}
        self.latest.update(record)
        record["_step"] = step
        record["_time"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.echo:
            body = ", ".join(f"{k}: {v:.4f}" if isinstance(v, float)
                             else f"{k}: {v}" for k, v in record.items()
                             if not k.startswith("_"))
            print(f"[step {step}] {body}", flush=True)

    def dump_csv(self, filename: str,
                 metrics: Optional[Dict[str, float]] = None) -> Path:
        metrics = metrics if metrics is not None else self.latest
        out = self.logdir / filename
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(list(metrics.keys()))
            w.writerow([metrics[k] for k in metrics])
        return out


def create_logdir(base: os.PathLike, name: str,
                  resume: bool = False) -> Path:
    """Collision-guarded logdir (``utils/utils.py:12-27``)."""
    logdir = Path(base) / name
    if logdir.exists() and not resume and any(logdir.iterdir()):
        raise FileExistsError(
            f"Run dir {logdir} already exists; delete it or resume.")
    logdir.mkdir(parents=True, exist_ok=True)
    return logdir
