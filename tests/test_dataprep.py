"""Dataprep subsystem tests: shifted splits + JS divergence, missing
masks, DVM table building, cardiac packing, native gather."""

import numpy as np
import pandas as pd
import pytest

from stil_tta_tpu.data.source import ArraySource, synthetic_source
from stil_tta_tpu.dataprep.dvm import build_semi_splits, build_tabular, \
    label_encode
from stil_tta_tpu.dataprep.missing_mask import (feature_missing_mask,
                                                random_missing_mask)
from stil_tta_tpu.dataprep.shifted import (build_shifted_splits,
                                           js_divergence,
                                           make_column_value_shift,
                                           make_label_subset_shift,
                                           make_normal_shift)
from stil_tta_tpu.dataprep.ukbb import (center_crop, filter_tabular,
                                        normalise_intensity,
                                        pack_cardiac_image)


def test_js_divergence_properties():
    rng = np.random.RandomState(0)
    a = rng.randn(2000)
    assert js_divergence(a, a) < 1e-9
    b = rng.randn(2000) + 5
    assert js_divergence(a, b) > 0.3
    assert js_divergence(a, b) <= np.log(2) + 1e-6


def test_shifted_split_column_holdout(tmp_path):
    src = synthetic_source(200, num_classes=4,
                           field_lengths=[3, 1, 1], image_size=8)
    spec = make_column_value_shift("c0_is_2", column=0, values=[2.0])
    res = build_shifted_splits(src, spec, label_fraction=0.1,
                               out_dir=tmp_path / "shift")
    splits = res["splits"]
    # held-out rows all have column0 == 2, train rows never do
    assert (splits["test"].tabular[:, 0] == 2.0).all()
    assert (splits["train_labelled"].tabular[:, 0] != 2.0).all()
    assert (splits["train_unlabelled"].tabular[:, 0] != 2.0).all()
    # the shifted column has high JS divergence
    assert res["report"]["feature_0"] > 0.3
    # artifacts reloadable
    reloaded = ArraySource.load(tmp_path / "shift" / "test")
    assert len(reloaded) == len(splits["test"])


def test_shifted_split_label_subset():
    src = synthetic_source(120, num_classes=6,
                           field_lengths=[3, 1, 1], image_size=8)
    spec = make_label_subset_shift("l45", [4, 5])
    res = build_shifted_splits(src, spec, label_fraction=0.2)
    assert set(np.unique(res["splits"]["test"].labels)) <= {4, 5}
    assert not set(np.unique(res["splits"]["train_labelled"].labels)) \
        & {4, 5}


def test_normal_shift_is_iid():
    src = synthetic_source(2000, num_classes=4,
                           field_lengths=[3, 1, 1], image_size=8)
    res = build_shifted_splits(src, make_normal_shift(frac=0.3),
                               label_fraction=0.5)
    # i.i.d. control: small-sample JS noise only (vs >0.3 for real shifts)
    assert max(v for k, v in res["report"].items()) < 0.1


def test_missing_masks():
    m = random_missing_mask(100, 10, 0.3, seed=0)
    assert 0.2 < m.mean() < 0.4
    f = feature_missing_mask(100, 10, 0.3, seed=0)
    assert (f.all(axis=0) | (~f).all(axis=0)).all()  # whole columns
    assert f.mean() == pytest.approx(0.3)
    imp = np.arange(10.0)
    f2 = feature_missing_mask(10, 10, 0.2, importance=imp)
    assert f2[:, 9].all() and f2[:, 8].all() and not f2[:, 0].any()


def test_dvm_build_tabular_and_splits():
    df = pd.DataFrame({
        "color": ["red", "blue", "red", "green"] * 5,
        "body": ["suv", "hatch"] * 10,
        "price": np.arange(20.0),
        "miles": np.linspace(0, 1e5, 20),
    })
    tab, fl = build_tabular(df, ["color", "body"], ["price", "miles"])
    assert fl == [3, 2, 1, 1]
    assert tab.shape == (20, 4)
    np.testing.assert_allclose(tab[:, 2].mean(), 0, atol=1e-6)

    labels, mapping = label_encode(list(df["color"]))
    assert len(mapping) == 3

    src = synthetic_source(60, num_classes=3, field_lengths=[3, 1, 1],
                           image_size=8)
    splits = build_semi_splits(src, label_fraction=0.1, val_frac=0.2,
                               test_frac=0.2)
    total = sum(len(v) for v in splits.values())
    assert total == 60
    assert splits["train_labelled"].labelled.all()
    assert not splits["train_unlabelled"].labelled.any()


def test_cardiac_packing():
    vol = np.random.RandomState(0).rand(50, 60, 8, 10) * 1000
    img = pack_cardiac_image(vol, size=32, timepoints=(0, 5))
    assert img.shape == (32, 32, 2)
    assert 0 <= img.min() and img.max() <= 1.0
    c = center_crop(np.ones((10, 10)), 16)
    assert c.shape == (16, 16) and c.sum() == 100


def test_cardiac_tabular_filtering():
    df = pd.DataFrame({
        "sex": ["m", "f", "m", None, "f"],
        "age": [50.0, None, 60.0, 55.0, 65.0],
        "bmi": [22.0, 25.0, None, 28.0, 30.0],
    })
    tab, fl, keep = filter_tabular(df, ["sex"], ["age", "bmi"],
                                   max_missing_frac=0.5)
    assert fl[0] == 2 and fl[1:] == [1, 1]
    assert keep.sum() == len(tab)
    assert np.isfinite(tab).all()
