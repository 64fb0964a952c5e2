"""Every shipped config loads, composes, and constructs its algorithm
(catches YAML/key drift across the whole surface — the reference's 21
top-level configs + dataset groups, SURVEY.md §2.8)."""

from pathlib import Path

import pytest

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.config import load_config
from stil_tta_tpu.config.loader import DEFAULT_CONFIG_DIR

ALGO_CONFIGS = sorted(
    p.stem for p in Path(DEFAULT_CONFIG_DIR).glob("config_*.yaml"))
DATASET_CONFIGS = sorted(
    p.stem for p in
    (Path(DEFAULT_CONFIG_DIR) / "dataset").glob("*.yaml"))
SHIFTED_CONFIGS = sorted(
    p.stem for p in
    (Path(DEFAULT_CONFIG_DIR) / "dataset" / "shifted_configs")
    .glob("*.yaml"))


def test_config_counts():
    assert len(ALGO_CONFIGS) == 20
    assert len(SHIFTED_CONFIGS) == 15


@pytest.mark.parametrize("name", ALGO_CONFIGS)
def test_algorithm_config_constructs(name):
    cfg = load_config(name, overrides=["num_classes=4"])
    assert cfg.algorithm_name
    assert cfg.batch_size and cfg.lr_eval and cfg.img_size
    assert cfg.eval_metric in ("acc", "auc")
    cfg.field_lengths = [5, 4, 2, 1, 1]
    cfg.repeat_ratio = 1
    cfg.K = 8
    algo = get_algorithm(cfg.algorithm_name)(cfg, cfg.field_lengths)
    assert algo.net is not None
    assert callable(algo.make_train_step)


@pytest.mark.parametrize("name", SHIFTED_CONFIGS)
def test_shifted_dataset_config_composes(name):
    cfg = load_config("config_dvm_STiL", overrides=[f"dataset={name}"])
    assert cfg.target == "dvm" and cfg.num_classes == 286
    assert cfg.shift_name and cfg.label_fraction in (0.01, 0.1)


def test_dataset_groups_compose():
    for ds in DATASET_CONFIGS:
        cfg = load_config("config_dvm_STiL", overrides=[f"dataset={ds}"])
        assert cfg.num_classes and cfg.eval_metric
