"""End-to-end torch-checkpoint conversion CLI: a Lightning-style
checkpoint (student + EMA + prototypes) converts into an orbax state
that the Predictor can serve."""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

from tests.test_full_model_parity import CATS, DIM, NCLS, NCON, PROJ, TSTiL


def test_convert_checkpoint_cli(tmp_path, monkeypatch):
    torch.manual_seed(0)
    tm = TSTiL().eval()
    sd = tm.state_dict()
    # Lightning layout: backbone under model., plus EMA + prototypes
    out_sd = {}
    for k, v in sd.items():
        out_sd["model." + k[len("backbone."):] if k.startswith("backbone.")
               else k] = v
    for k, v in sd.items():
        if k.startswith("backbone."):
            out_sd["ema." + k[len("backbone."):]] = v
    out_sd["prototypes"] = torch.randn(NCLS, PROJ)
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": out_sd}, ckpt)

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import convert_torch_checkpoint as cli
    fl = ",".join(str(c) for c in CATS + (1,) * NCON)
    monkeypatch.setattr(sys, "argv", [
        "convert", "--config-name", "config_dvm_STiL",
        "--ckpt", str(ckpt), "--out", str(tmp_path / "converted"),
        "dataset=synthetic_dvm", "models=resnet18",
        f"num_classes={NCLS}", f"projection_dim={PROJ}",
        f"tabular_embedding_dim={DIM}", f"multimodal_embedding_dim={DIM}",
        "tabular_transformer_num_layers=1",
        f"field_lengths=[{fl}]", "img_size=32",
    ])
    cli.main()
    assert (tmp_path / "converted" / "checkpoint_converted").exists()

    # converted state serves through the Predictor
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.serve import Predictor
    cfg = load_config("config_dvm_STiL", overrides=[
        "dataset=synthetic_dvm", "models=resnet18",
        f"num_classes={NCLS}", f"projection_dim={PROJ}",
        f"tabular_embedding_dim={DIM}", f"multimodal_embedding_dim={DIM}",
        "tabular_transformer_num_layers=1",
        f"field_lengths=[{fl}]", "img_size=32",
    ])
    cfg.repeat_ratio = 1
    pred = Predictor.from_checkpoint(
        cfg, str(tmp_path / "converted" / "checkpoint_converted"),
        batch_size=4)
    rng = np.random.RandomState(0)
    probs = pred(rng.rand(6, 32, 32, 3).astype(np.float32) * 255,
                 np.concatenate([
                     np.stack([rng.randint(0, c, 6) for c in CATS], 1),
                     rng.randn(6, NCON)], 1).astype(np.float32))
    assert probs.shape == (6, NCLS)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
