"""The "-TTA" fork's headline workflow, end to end: build a shifted
split with the dataprep builder, then evaluate a model on it through
the test driver with test-time adaptation enabled (the hook the
reference left TODO)."""

import numpy as np

from stil_tta_tpu.config import load_config
from stil_tta_tpu.data.source import synthetic_source
from stil_tta_tpu.dataprep.shifted import (build_shifted_splits,
                                           make_column_value_shift)
from stil_tta_tpu.train.test import test as run_test


def test_shifted_split_tta_workflow(tmp_path):
    # 1. build a color-style shifted split (hold out cat-column value)
    src = synthetic_source(160, num_classes=4,
                           field_lengths=[5, 4, 2, 1, 1, 1],
                           image_size=40, seed=0)
    spec = make_column_value_shift("black", column=0, values=[3.0])
    res = build_shifted_splits(src, spec, label_fraction=0.2,
                               out_dir=tmp_path / "shift")
    assert (tmp_path / "shift" / "shift_report.json").exists()

    # 2. score the shifted test split through the test driver with TTA
    cfg = load_config("config_dvm_STiL", overrides=[
        "dataset=synthetic_dvm", "models=resnet18",
        "batch_size=8", "img_size=32", "num_classes=4",
        "tabular_embedding_dim=32", "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "tta=true", "tta_strategy=bn_adapt",
        "enable_progress_bar=false", "synthetic=false",
    ])
    cfg.field_lengths = [5, 4, 2, 1, 1, 1]
    cfg.data_base = str(tmp_path / "shift")
    # test driver reads data_test; point the other splits anywhere valid
    for k in ("data_train_labelled", "data_train_unlabelled", "data_val"):
        cfg[k] = str(tmp_path / "shift" / "test")
    cfg.data_test = str(tmp_path / "shift" / "test")
    cfg.logdir = str(tmp_path / "run")
    metrics = run_test(cfg)
    assert "test.acc" in metrics
    assert np.isfinite(metrics["test.acc"])
    assert (tmp_path / "run" / "test_results.csv").exists()
