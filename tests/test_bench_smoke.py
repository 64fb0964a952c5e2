"""bench.py smoke on CPU at tiny shapes (env knobs): both input modes
— DeviceCache (indexed scan blocks) and host_stream ((K,B) stacked
block dispatch) — run end to end and emit the one-line JSON contract
the driver parses."""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

TINY = {"STIL_BENCH_MODEL": "resnet18", "STIL_BENCH_BATCH": "8",
        "STIL_BENCH_IMG": "32", "STIL_BENCH_CLASSES": "4",
        "STIL_BENCH_K": "2", "STIL_BENCH_CALLS": "1"}


def _run_bench(monkeypatch, capsys, mode):
    for k, v in TINY.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("STIL_BENCH_INPUT", mode)
    spec = importlib.util.spec_from_file_location(
        f"bench_{mode}", ROOT / "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.main()
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert out, "bench printed no JSON line"
    rec = json.loads(out[-1])
    # non-default input modes get their own metric series so a
    # transfer-bound host_stream number can never be mistaken for the
    # device_cache headline
    suffix = "" if mode == "device_cache" else f"_{mode}"
    assert rec["metric"] == \
        "stil_dvm_train_samples_per_sec_per_chip" + suffix
    assert rec["value"] > 0
    assert rec["unit"] == "samples/sec"
    assert rec["vs_baseline"] >= 0  # rounds to 0.0 at CPU speeds
    assert rec["ms_per_step"] > 0
    assert rec["batch_size"] == 8
    assert rec["steps_per_dispatch"] == 2
    assert rec["input_mode"] == mode
    return rec


@pytest.mark.parametrize("mode", ["device_cache", "host_stream"])
def test_bench_smoke(monkeypatch, capsys, mode):
    _run_bench(monkeypatch, capsys, mode)


@pytest.mark.parametrize("config,metric_prefix", [
    ("config_dvm_SimMatch", "dvm_simmatch"),
    ("config_dvm_STiL_SAINT", "dvm_stil_saint"),
])
def test_bench_config_knob(monkeypatch, capsys, config, metric_prefix):
    """STIL_BENCH_CONFIG swaps the algorithm family / recipe: the algo
    is resolved from cfg.algorithm_name, SimMatch's bank is sized to
    the synthetic labeled set (mirroring train/evaluate.py), and the
    metric name is derived from the config so BENCH json lines from
    different recipes never collide."""
    for k, v in TINY.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("STIL_BENCH_INPUT", "device_cache")
    monkeypatch.setenv("STIL_BENCH_CONFIG", config)
    spec = importlib.util.spec_from_file_location(
        f"bench_{config}", ROOT / "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.main()
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert out, "bench printed no JSON line"
    rec = json.loads(out[-1])
    assert rec["metric"] == (
        metric_prefix + "_train_samples_per_sec_per_chip")
    assert rec["value"] > 0


@pytest.mark.parametrize("dp,int8", [("", ""), ("1", ""), ("", "1")])
def test_bench_infer_smoke(monkeypatch, capsys, dp, int8):
    """tools/bench_infer.py (serving throughput) end to end on CPU at
    tiny shapes: single-device, 8-device data-parallel, and the int8
    image-tower serving path."""
    for k, v in {"STIL_INFER_MODEL": "resnet18", "STIL_INFER_BATCH": "8",
                 "STIL_INFER_IMG": "32", "STIL_INFER_CLASSES": "4",
                 "STIL_INFER_CALLS": "2", "STIL_INFER_DP": dp,
                 "STIL_INFER_INT8": int8}.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location(
        f"bench_infer_{dp or 'single'}_{int8}",
        ROOT / "tools" / "bench_infer.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.main()
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert out, "bench_infer printed no JSON line"
    rec = json.loads(out[-1])
    assert rec["metric"] == ("stil_dvm_infer_samples_per_sec_per_chip"
                             + ("_int8" if int8 else ""))
    assert rec["value"] > 0
    assert rec["ms_per_batch"] > 0
    assert rec["batch_size"] == 8
    assert rec["n_devices"] == (8 if dp else 1)
