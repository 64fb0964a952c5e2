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
    assert cfg.target == "dvm"
    # shifted splits pass ensure_common_label_space (class-set
    # intersection + contiguous relabel), so num_classes mirrors the
    # reference's per-shift values: 285 black, 278 miles, 281 adv_year
    # (0.1), 283/284 labels, 286 otherwise
    assert cfg.num_classes in (286, 285, 284, 283, 281, 278)
    assert cfg.shift_name and cfg.label_fraction in (0.01, 0.1)


def _reference_config_keys():
    import re

    import yaml
    path = Path("/root/reference/configs/config_dvm_STiL.yaml")
    if not path.exists():
        pytest.skip("reference tree not mounted")
    text = re.sub(r"\$\{[^}]*\}", "0",
                  path.read_text().replace("defaults:", "defaults_:"))
    return set(yaml.safe_load(text)) - {"defaults_"}


def test_reference_config_key_coverage():
    """Every key of the reference's config_dvm_STiL.yaml is either
    present in our composed config surface (same name) or explicitly
    documented as n/a in PARITY.md (the VERDICT-required contract)."""
    cfg = load_config("config_dvm_STiL", overrides=["dataset=synthetic_dvm"])
    ours = set(cfg.keys())
    parity = (Path(__file__).resolve().parent.parent
              / "PARITY.md").read_text()
    import re
    documented = set(re.findall(r"`([a-zA-Z0-9_*]+)`", parity))
    # expand the documented `_short` family wildcard
    missing = []
    for key in sorted(_reference_config_keys()):
        if key in ours or key in documented:
            continue
        if key.endswith("_short") and ("data_*_short" in documented
                                       or "labels_*_short" in documented):
            continue
        if key.startswith(("data_", "labels_", "labelled_identification",
                           "field_lengths_tabular")):
            # per-file artifact keys, documented as a family in PARITY.md
            continue
        missing.append(key)
    assert not missing, (
        f"reference config keys neither consumed nor documented n/a in "
        f"PARITY.md: {missing}")


def test_dataset_groups_compose():
    for ds in DATASET_CONFIGS:
        cfg = load_config("config_dvm_STiL", overrides=[f"dataset={ds}"])
        assert cfg.num_classes and cfg.eval_metric
