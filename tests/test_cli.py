"""CLI surface: run.py argument handling and config overrides."""

import sys

import pytest


def test_run_requires_config_name(capsys):
    import run as run_mod
    with pytest.raises(SystemExit):
        run_mod.main([])


def test_run_cli_smoke(tmp_path):
    """Full CLI path: evaluate a tiny synthetic STiL run."""
    import run as run_mod
    rc = run_mod.main([
        "--config-name", "config_dvm_STiL",
        "dataset=synthetic_dvm", "models=resnet18",
        "batch_size=8", "unlabelled_ratio=3", "img_size=32",
        "synthetic_image_size=40", "synthetic_labelled=8",
        "synthetic_unlabelled=24", "synthetic_val=16",
        "synthetic_test=16", "max_epochs=1", "start_epoch=0",
        "num_classes=4", "tabular_embedding_dim=32",
        "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "tta=false", "strict_prototypes=false", "test_and_eval=false",
        "enable_progress_bar=false",
        f"logdir={tmp_path / 'cli_run'}",
    ])
    assert rc == 0
    assert (tmp_path / "cli_run" / "metrics.jsonl").exists()


def test_run_cli_multiseed(tmp_path):
    import run as run_mod
    rc = run_mod.main([
        "--config-name", "config_dvm_STiL",
        "dataset=synthetic_dvm", "models=resnet18",
        "batch_size=8", "unlabelled_ratio=3", "img_size=32",
        "synthetic_image_size=40", "synthetic_labelled=8",
        "synthetic_unlabelled=24", "synthetic_val=16",
        "synthetic_test=16", "max_epochs=1", "start_epoch=0",
        "num_classes=4", "tabular_embedding_dim=32",
        "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "tta=false", "strict_prototypes=false", "test_and_eval=false",
        "enable_progress_bar=false", "run_all_seeds=true",
        "seeds=[1, 2]", f"logdir={tmp_path / 'ms'}",
    ])
    assert rc == 0
    assert (tmp_path / "ms_1" / "metrics.jsonl").exists()
    assert (tmp_path / "ms_2" / "metrics.jsonl").exists()
    assert (tmp_path / "ms_seed_summary.csv").exists()


def test_run_cli_val_disabled_no_early_stop(tmp_path):
    """limit_val_batches: 0 disables validation (PL semantics) and must
    NOT trickle into early stopping: with patience=1 the run still
    completes all max_epochs instead of stopping after the first
    metric-less epoch."""
    import json

    import run as run_mod
    logdir = tmp_path / "noval"
    rc = run_mod.main([
        "--config-name", "config_dvm_STiL",
        "dataset=synthetic_dvm", "models=resnet18",
        "batch_size=8", "unlabelled_ratio=3", "img_size=32",
        "synthetic_image_size=40", "synthetic_labelled=8",
        "synthetic_unlabelled=24", "synthetic_val=16",
        "synthetic_test=16", "max_epochs=3", "start_epoch=0",
        "num_classes=4", "tabular_embedding_dim=32",
        "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "tta=false", "strict_prototypes=false", "test_and_eval=false",
        "enable_progress_bar=false", "limit_val_batches=0",
        "patience=1", f"logdir={logdir}",
    ])
    assert rc == 0
    train_epochs = [json.loads(ln) for ln in
                    (logdir / "metrics.jsonl").read_text().splitlines()
                    if "multimodal.train.CEloss" in ln]
    assert len(train_epochs) == 3  # all epochs ran, no early stop
