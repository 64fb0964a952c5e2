"""Driver e2e over the other dataset/algorithm axes: imaging-only
SimMatch (SURVEY.md §3.4 representative stack) and cardiac binary STiL
(rotation-warp augmentation + AUC model selection)."""

import numpy as np

from stil_tta_tpu.config import load_config
from stil_tta_tpu.train.evaluate import evaluate

COMMON = [
    "models=resnet18", "batch_size=8", "unlabelled_ratio=3",
    "img_size=32", "synthetic_image_size=40", "synthetic_labelled=8",
    "synthetic_unlabelled=24", "synthetic_val=16", "synthetic_test=16",
    "max_epochs=1", "start_epoch=0", "tabular_embedding_dim=32",
    "multimodal_embedding_dim=32", "tabular_transformer_num_layers=1",
    "projection_dim=8", "tta=false", "strict_prototypes=false",
    "test_and_eval=false", "enable_progress_bar=false",
    "save_checkpoints=false",
]


def test_simmatch_imaging_e2e(tmp_path):
    cfg = load_config("config_dvm_SimMatch", overrides=[
        "dataset=synthetic_dvm", "num_classes=4", *COMMON,
    ])
    cfg.logdir = str(tmp_path / "run")
    res = evaluate(cfg)
    assert np.isfinite(res["best_val"])
    assert 0.0 <= res["best_val"] <= 1.0


def test_stil_cardiac_binary_e2e(tmp_path):
    cfg = load_config("config_cardiac_STiL", overrides=[
        "dataset=synthetic_dvm", "num_classes=2", "target=CAD",
        "eval_metric=auc", *COMMON,
    ])
    cfg.logdir = str(tmp_path / "run")
    res = evaluate(cfg)
    # AUC-monitored binary task ran through the rotation-warp pipeline
    assert np.isfinite(res["best_val"])
    assert 0.0 <= res["best_val"] <= 1.0
