"""tools/convert_torch_artifacts.py: reference-format dataset artifacts
(.pt path lists / labels / masks, .csv tabular, per-image .npy) ->
native ArraySource splits that the drivers load. This is the on-ramp for
real DVM/cardiac data (SURVEY.md §2.2 artifact contract)."""

import csv
import sys
from pathlib import Path

import numpy as np
import torch


def _make_reference_artifacts(tmp_path, n=6, size=12):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
        p = img_dir / f"im_{i}.npy"
        np.save(p, arr)
        # the reference's path lists store .pt paths next to the .npy
        # (augmentation_speedup convention) — exercise that remap
        paths.append(str(p)[:-4] + ".pt")
    torch.save(paths, tmp_path / "paths.pt")
    labels = rng.randint(0, 3, n)
    torch.save(torch.tensor(labels), tmp_path / "labels.pt")
    tab = np.concatenate([rng.randint(0, 4, (n, 2)),
                          rng.randn(n, 3)], axis=1).astype(np.float32)
    with open(tmp_path / "tab.csv", "w", newline="") as f:
        csv.writer(f).writerows(tab.tolist())
    torch.save(torch.tensor([4, 4, 1, 1, 1]),
               tmp_path / "field_lengths.pt")
    mask = np.array([True, True, False, False, True, False])
    torch.save(torch.tensor(mask), tmp_path / "labelled.pt")
    return paths, labels, tab, mask


def _run_converter(argv):
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "convert_torch_artifacts",
        Path(__file__).resolve().parent.parent
        / "tools" / "convert_torch_artifacts.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    try:
        sys.argv = ["convert_torch_artifacts.py"] + argv
        mod.main()
    finally:
        sys.argv = old


def test_artifacts_roundtrip_and_driver_load(tmp_path):
    from stil_tta_tpu.data.source import ArraySource

    paths, labels, tab, mask = _make_reference_artifacts(tmp_path)
    out = tmp_path / "native" / "train_labelled"
    _run_converter([
        "--images", str(tmp_path / "paths.pt"),
        "--labels", str(tmp_path / "labels.pt"),
        "--tabular", str(tmp_path / "tab.csv"),
        "--field-lengths", str(tmp_path / "field_lengths.pt"),
        "--labelled", str(tmp_path / "labelled.pt"),
        "--out", str(out),
    ])
    src = ArraySource.load(out)
    assert len(src) == 6
    np.testing.assert_array_equal(src.labels, labels)
    np.testing.assert_allclose(src.tabular, tab, atol=1e-6)
    np.testing.assert_array_equal(src.labelled, mask)
    assert list(src.field_lengths) == [4, 4, 1, 1, 1]
    # images round-trip through the .pt -> .npy remap
    np.testing.assert_array_equal(
        src.images[2], np.load(tmp_path / "imgs" / "im_2.npy"))


def test_artifacts_resize_and_unlabelled_all(tmp_path):
    from stil_tta_tpu.data.source import ArraySource

    _make_reference_artifacts(tmp_path)
    out = tmp_path / "native" / "train_unlabelled"
    _run_converter([
        "--images", str(tmp_path / "paths.pt"),
        "--labels", str(tmp_path / "labels.pt"),
        "--tabular", str(tmp_path / "tab.csv"),
        "--field-lengths", str(tmp_path / "field_lengths.pt"),
        "--unlabelled-all", "--size", "8",
        "--out", str(out),
    ])
    src = ArraySource.load(out)
    assert src.images.shape == (6, 8, 8, 3)
    assert not src.labelled.any()


def test_reference_artifact_rehearsal_end_to_end(tmp_path):
    """The full REFERENCE surface, end to end (VERDICT item 5): write
    reference-format artifacts (.pt path lists, labels .pt, tabular
    .csv, field_lengths.pt, labelled_identification masks), convert via
    tools/convert_torch_artifacts.py, train config_dvm_STiL through the
    CLI on the converted splits, then score with the test driver."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "rehearse", Path(__file__).resolve().parent.parent
        / "tools" / "rehearse_reference_artifacts.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import sys
    argv = sys.argv
    sys.argv = ["rehearse", "--root", str(tmp_path), "--n-train", "96",
                "--n-eval", "16", "--img-size", "32", "--classes", "4",
                "--epochs", "1", "--batch-size", "8"]
    try:
        rc = mod.main()
    finally:
        sys.argv = argv
    assert rc == 0
    assert (tmp_path / "run" / "test" / "test_results.csv").exists()
    assert (tmp_path / "native" / "train_labelled" / "spec.json").exists()
