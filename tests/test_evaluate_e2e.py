"""End-to-end driver test: two epochs of STiL on synthetic data through
the full evaluate() path (loaders, train steps, epoch end, validation,
checkpointing, test with best checkpoint), on the virtual CPU mesh."""

import shutil

import numpy as np
import pytest

from stil_tta_tpu.config import load_config
from stil_tta_tpu.train.evaluate import evaluate


@pytest.fixture
def cfg(tmp_path):
    cfg = load_config("config_dvm_STiL", overrides=[
        "dataset=synthetic_dvm", "models=resnet18",
        "batch_size=8", "unlabelled_ratio=3", "img_size=32",
        "synthetic_image_size=40", "synthetic_labelled=8",
        "synthetic_unlabelled=24", "synthetic_val=16",
        "synthetic_test=16", "max_epochs=2", "start_epoch=0",
        "num_classes=4", "tabular_embedding_dim=32",
        "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "test_and_eval=true", "tta=false", "enable_progress_bar=false",
        "strict_prototypes=false",
    ])
    cfg.logdir = str(tmp_path / "run")
    return cfg


def test_evaluate_end_to_end(cfg, tmp_path):
    results = evaluate(cfg)
    assert "best_val" in results and np.isfinite(results["best_val"])
    assert "test.acc" in results
    assert 0.0 <= results["test.acc"] <= 1.0
    # artifacts written
    logdir = tmp_path / "run"
    assert (logdir / "metrics.jsonl").exists()
    assert (logdir / "eval_results.csv").exists()
    assert (logdir / "test_results.csv").exists()
    assert any(p.name.startswith("checkpoint_best")
               for p in logdir.iterdir())
