"""Two-way checkpoint migration through the CLIs, per family layout:
``tools/export_torch_checkpoint.py`` emits the reference's Lightning
key layout, and ``tools/convert_torch_checkpoint.py`` reimports it —
params, EMA, BN stats, and every Lightning-level buffer round-trip
exactly. Four layouts:

- STiL: sibling ``model.`` / ``ema.`` + prototypes/prototype-sums
- SimMatch (wrapped): ``model.main.`` / ``model.ema.`` + bank/labels/DA
- MMatch (no EMA): ``model.`` + embed/probs queues + DA
- CoMatch (wrapped): both feature/probs queue pairs + ring pointers
"""

import dataclasses
import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stil_tta_tpu.algorithms.base import DAState
from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.train.checkpoint import restore_checkpoint, \
    save_checkpoint
from tests.helpers import FIELD_LENGTHS, IMG, NUM_CLASSES, tiny_cfg

TOOLS = Path(__file__).resolve().parent.parent / "tools"
OV = ["dataset=synthetic_dvm", "models=resnet18",
      "batch_size=8", "unlabelled_ratio=3", f"img_size={IMG}",
      f"num_classes={NUM_CLASSES}",
      "tabular_embedding_dim=32", "multimodal_embedding_dim=32",
      "tabular_transformer_num_layers=1", "projection_dim=8",
      "start_epoch=0", "tta=false", "K=16",
      "field_lengths=[" + ",".join(map(str, FIELD_LENGTHS)) + "]"]


def _run_tool(tool, args):
    spec = importlib.util.spec_from_file_location(
        "t_" + tool.replace(".", "_"), TOOLS / tool)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = sys.argv
    sys.argv = [tool] + args
    try:
        m.main()
    finally:
        sys.argv = old


def _init_state(cfg, seed=0):
    algo = get_algorithm(cfg.algorithm_name)(cfg, FIELD_LENGTHS)
    img = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    tab = jnp.zeros((2, len(FIELD_LENGTHS)), jnp.float32)
    return algo, algo.init_state(jax.random.key(seed), img, tab)


def _assert_tree_equal(a, b, what):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=what)


def _roundtrip(tmp_path, config_name, mutate=None):
    cfg = tiny_cfg(config_name)
    algo, state = _init_state(cfg)
    if mutate:
        state = mutate(state)
    run = tmp_path / "run"
    run.mkdir()
    save_checkpoint(run, state, cfg.to_dict(), name="checkpoint_best_acc")

    ckpt = tmp_path / "export.ckpt"
    _run_tool("export_torch_checkpoint.py",
              ["--config-name", config_name, "--run", str(run),
               "--out", str(ckpt)] + OV)
    sd = torch.load(ckpt, weights_only=False)["state_dict"]

    out = tmp_path / "reimport"
    _run_tool("convert_torch_checkpoint.py",
              ["--config-name", config_name, "--ckpt", str(ckpt),
               "--out", str(out)] + OV)
    _, fresh = _init_state(cfg, seed=1)
    back = restore_checkpoint(out, fresh, name="checkpoint_converted")
    return state, back, sd


def test_stil_cli_roundtrip(tmp_path):
    rng = np.random.RandomState(0)

    def mutate(state):
        # config_dvm_STiL has DA: false (reference default), so no DA
        # ring exists to export — prototypes + sums only
        c, p = NUM_CLASSES, 8
        return dataclasses.replace(
            state,
            prototypes=jnp.asarray(rng.randn(c, p), jnp.float32),
            prototypes_sum=jnp.asarray(rng.randn(c, p), jnp.float32),
            prototypes_count=jnp.asarray(rng.rand(c, 1), jnp.float32))

    state, back, sd = _roundtrip(tmp_path, "config_dvm_STiL", mutate)
    assert any(k.startswith("model.encoder_imaging.") for k in sd)
    assert any(k.startswith("ema.encoder_imaging.") for k in sd)
    assert {"prototypes", "prototypes_sum",
            "prototypes_count_sum"} <= set(sd)
    assert "DA_queue" not in sd  # DA disabled in this config
    _assert_tree_equal(state.params, back.params, "params")
    _assert_tree_equal(state.batch_stats, back.batch_stats, "stats")
    _assert_tree_equal(state.ema_params, back.ema_params, "ema")
    np.testing.assert_array_equal(np.asarray(state.prototypes),
                                  np.asarray(back.prototypes))
    np.testing.assert_array_equal(np.asarray(state.prototypes_sum),
                                  np.asarray(back.prototypes_sum))
    np.testing.assert_array_equal(np.asarray(state.prototypes_count),
                                  np.asarray(back.prototypes_count))


def test_simmatch_cli_roundtrip(tmp_path):
    rng = np.random.RandomState(1)

    def mutate(state):
        extra = dict(state.extra)
        extra["bank"] = jnp.asarray(rng.randn(8, 16), jnp.float32)
        extra["bank_labels"] = jnp.asarray(
            rng.randint(0, NUM_CLASSES, 16), jnp.int32)
        kw = {}
        if state.da is not None:
            kw["da"] = DAState(
                jnp.asarray(rng.rand(256, NUM_CLASSES), jnp.float32),
                jnp.asarray(3, jnp.int32))
        return dataclasses.replace(state, extra=extra, **kw)

    state, back, sd = _roundtrip(tmp_path, "config_dvm_SimMatch", mutate)
    # wrapped layout + buffers under the reference's registered names
    assert any(k.startswith("model.main.") for k in sd)
    assert any(k.startswith("model.ema.") for k in sd)
    assert not any(k.startswith("model.encoder") for k in sd)
    assert {"model.bank", "model.labels"} <= set(sd)
    _assert_tree_equal(state.params, back.params, "params")
    _assert_tree_equal(state.ema_params, back.ema_params, "ema")
    np.testing.assert_array_equal(np.asarray(state.extra["bank"]),
                                  np.asarray(back.extra["bank"]))
    np.testing.assert_array_equal(
        np.asarray(state.extra["bank_labels"]),
        np.asarray(back.extra["bank_labels"]))
    if state.da is not None:
        np.testing.assert_array_equal(np.asarray(state.da.queue),
                                      np.asarray(back.da.queue))
        assert int(back.da.ptr) == int(state.da.ptr)


def test_mmatch_cli_roundtrip(tmp_path):
    rng = np.random.RandomState(2)

    def mutate(state):
        extra = dict(state.extra)
        extra["embed_queue"] = jnp.asarray(rng.randn(8, 640), jnp.float32)
        extra["probs_queue"] = jnp.asarray(
            rng.rand(NUM_CLASSES, 640), jnp.float32)
        extra["ptr"] = jnp.asarray(11, jnp.int32)
        kw = {}
        if state.da is not None:
            kw["da"] = DAState(
                jnp.asarray(rng.rand(256, NUM_CLASSES), jnp.float32),
                jnp.asarray(5, jnp.int32))
        return dataclasses.replace(state, extra=extra, **kw)

    state, back, sd = _roundtrip(tmp_path, "config_dvm_MMatch", mutate)
    assert any(k.startswith("model.encoder_imaging.") for k in sd)
    assert not any(k.startswith(("ema.", "model.ema.")) for k in sd)
    assert {"embed_queue", "embed_queue_ptr", "probs_queue"} <= set(sd)
    _assert_tree_equal(state.params, back.params, "params")
    np.testing.assert_array_equal(
        np.asarray(state.extra["embed_queue"]),
        np.asarray(back.extra["embed_queue"]))
    np.testing.assert_array_equal(
        np.asarray(state.extra["probs_queue"]),
        np.asarray(back.extra["probs_queue"]))
    assert int(back.extra["ptr"]) == 11
    if state.da is not None:
        np.testing.assert_array_equal(np.asarray(state.da.queue),
                                      np.asarray(back.da.queue))


def test_comatch_cli_roundtrip(tmp_path):
    rng = np.random.RandomState(3)

    def mutate(state):
        extra = dict(state.extra)
        k = extra["queue_s"].shape[1]
        c = NUM_CLASSES
        extra["queue_s"] = jnp.asarray(rng.randn(8, k), jnp.float32)
        extra["probs_u"] = jnp.asarray(rng.rand(c, k), jnp.float32)
        extra["queue_w"] = jnp.asarray(rng.randn(8, k), jnp.float32)
        extra["probs_xu"] = jnp.asarray(rng.rand(c, k), jnp.float32)
        extra["ptr_s"] = jnp.asarray(5, jnp.int32)
        extra["ptr_w"] = jnp.asarray(9, jnp.int32)
        return dataclasses.replace(state, extra=extra)

    state, back, sd = _roundtrip(tmp_path, "config_dvm_CoMatch", mutate)
    # wrapped layout + all six queue buffers under reference names
    assert any(k.startswith("model.main.") for k in sd)
    assert any(k.startswith("model.ema.") for k in sd)
    assert {"model.queue_s", "model.queue_ptr_s", "model.probs_u",
            "model.queue_w", "model.queue_ptr_w",
            "model.probs_xu"} <= set(sd)
    _assert_tree_equal(state.params, back.params, "params")
    _assert_tree_equal(state.ema_params, back.ema_params, "ema")
    for key in ("queue_s", "probs_u", "queue_w", "probs_xu"):
        np.testing.assert_array_equal(np.asarray(state.extra[key]),
                                      np.asarray(back.extra[key]),
                                      err_msg=key)
    assert int(back.extra["ptr_s"]) == 5
    assert int(back.extra["ptr_w"]) == 9
