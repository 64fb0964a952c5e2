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
from stil_tta_tpu.dataprep.shifted import (build_label_dist_shifted_splits,
                                           build_shifted_splits,
                                           ensure_common_label_space,
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


def test_common_label_space_intersection_and_relabel():
    """ensure_common_label_space mirrors create_shifted_data.ipynb cell 26
    (ensure_same_class_num) + categorize: intersect class sets, relabel
    contiguously — the reason reference shifted configs carry
    num_classes < 286 (e.g. 283/284 for labels, 285 black, 278 miles)."""
    src = synthetic_source(300, num_classes=6,
                           field_lengths=[3, 1, 1], image_size=8)
    a_keep = np.isin(src.labels, [0, 2, 3, 5])
    b_keep = np.isin(src.labels, [1, 2, 3, 5])

    def sub(keep):
        return ArraySource(images=src.images[keep], tabular=src.tabular[keep],
                           labels=src.labels[keep],
                           labelled=src.labelled[keep],
                           field_lengths=src.field_lengths,
                           num_classes=6, target=src.target)

    splits, n, mapping = ensure_common_label_space(
        {"a": sub(a_keep), "b": sub(b_keep)})
    # common classes {2,3,5} -> relabeled 0,1,2
    assert n == 3
    assert mapping == {2: 0, 3: 1, 5: 2}
    for s in splits.values():
        assert s.num_classes == 3
        assert set(np.unique(s.labels)) <= {0, 1, 2}
    # same label space on both sides, matching the head size
    assert (set(np.unique(splits["a"].labels))
            == set(np.unique(splits["b"].labels)))


def test_label_dist_shift_reference_semantics(tmp_path):
    """The 'labels' shift (create_shifted_data.ipynb cells 132-144):
    labeled train from one column group, unlabeled from another, common
    class space, contiguous labels matching the saved num_classes."""
    rng = np.random.RandomState(0)
    src = synthetic_source(600, num_classes=8,
                           field_lengths=[3, 1, 1], image_size=8)
    # column 0 is categorical with 3 values; treat value 0 as "black"
    # (labeled pool), values 1/2 as "grey/white" (unlabeled pool)
    src.tabular[:, 0] = rng.randint(0, 3, len(src)).astype(
        src.tabular.dtype)
    res = build_label_dist_shifted_splits(
        src, column=0, labeled_values=[0], unlabeled_values=[1, 2],
        label_fraction=0.1, seed=0, out_dir=tmp_path / "labels")
    splits = res["splits"]
    assert set(splits) == {"train_labelled", "train_unlabelled", "test",
                           "test_black"}
    # pool membership: labeled train only from the "black" group,
    # unlabeled only from grey/white, test from the union
    assert (splits["train_labelled"].tabular[:, 0] == 0).all()
    assert np.isin(splits["train_unlabelled"].tabular[:, 0], [1, 2]).all()
    assert (splits["test_black"].tabular[:, 0] == 0).all()
    # common, contiguous label space sized to num_classes in every split
    n = res["num_classes"]
    for s in splits.values():
        assert s.num_classes == n
        assert s.labels.min() >= 0 and s.labels.max() < n
    # train and test label spaces match the head size (the VERDICT's
    # required invariant)
    assert (set(np.unique(splits["train_labelled"].labels))
            | set(np.unique(splits["train_unlabelled"].labels))
            == set(range(n)))
    assert set(np.unique(splits["test"].labels)) <= set(range(n))
    # persisted metadata records the produced class count
    import json
    meta = json.load(open(tmp_path / "labels" / "shift_report.json"))
    assert meta["num_classes"] == n
    assert meta["label_mapping"]
    # reloadable
    reloaded = ArraySource.load(tmp_path / "labels" / "train_labelled")
    assert reloaded.num_classes == n


def test_column_shift_drops_noncommon_classes():
    """Every shifted split passes the class-set intersection (the
    reference applies ensure_same_class_num to color/miles/year shifts
    too — black: 285, miles: 278 classes in its configs)."""
    src = synthetic_source(400, num_classes=5,
                           field_lengths=[3, 1, 1], image_size=8)
    # held-out rows (column0 == 2): ~40% of every class, plus ALL of
    # class 4 — so class 4 exists only in the test pool
    rng = np.random.RandomState(1)
    col = np.where(rng.rand(len(src)) < 0.4, 2.0, 1.0)
    col[src.labels == 4] = 2.0
    src.tabular[:, 0] = col.astype(src.tabular.dtype)
    spec = make_column_value_shift("c0_is_2", column=0, values=[2.0])
    res = build_shifted_splits(src, spec, label_fraction=0.2)
    # class 4 exists only in the test pool -> dropped everywhere,
    # remaining labels relabeled to [0, 4)
    assert res["num_classes"] == 4
    for s in res["splits"].values():
        assert s.labels.max() < 4


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


def test_ukbb_pack_sa_es_ed_reference_semantics():
    """pack_sa_es_ed mirrors preprocess_cardiac_image.py:113-180:
    channels [ES, mid-beat, ED] at the mid z-slice, square-padded to
    210, per-channel max-normalised HWC float32."""
    from stil_tta_tpu.dataprep.ukbb import mid_beat_index, pack_sa_es_ed
    rng = np.random.RandomState(0)
    h, w, z, t = 40, 32, 5, 20
    sa = rng.rand(h, w, z, t) * 100
    es_i = 13
    es_vol = np.zeros((h, w, z))
    es_vol[:, :, z // 2] = sa[:, :, z // 2, es_i]
    ed_vol = rng.rand(h, w, z) * 100

    mb, found_es, match = mid_beat_index(sa, es_vol[:, :, z // 2])
    assert found_es == es_i and match and mb == es_i // 2

    img = pack_sa_es_ed(es_vol, sa, ed_vol)
    assert img.shape == (210, 210, 3) and img.dtype == np.float32
    # per-channel max-normalised
    assert np.allclose(img.max(axis=(0, 1)), 1.0, atol=1e-6)
    # channel 0 centre equals the normalised ES mid slice
    from stil_tta_tpu.dataprep.ukbb import pad_square
    es_sq = pad_square(es_vol[:, :, z // 2])
    y0 = (210 - es_sq.shape[0]) // 2
    x0 = (210 - es_sq.shape[1]) // 2
    centre = img[y0:y0 + es_sq.shape[0], x0:x0 + es_sq.shape[1], 0]
    np.testing.assert_allclose(centre, es_sq / es_sq.max(), rtol=1e-5)


def test_ukbb_field_mapping():
    """select_cardiac_columns + ukbb_dtype_map mirror
    filter_cardiac_tabular_feature.py:50-137."""
    from stil_tta_tpu.dataprep.ukbb import (CARDIAC_FIELD_IDS,
                                            select_cardiac_columns,
                                            ukbb_dtype_map)
    assert len(CARDIAC_FIELD_IDS) == 156
    cols = ["eid", "31-0.0", "9999-0.0", "21001-0.0", "21001-1.0",
            "46-0.0"]
    kept, have, lack = select_cardiac_columns(cols)
    assert "eid" in kept and "31-0.0" in kept and "21001-1.0" in kept
    assert "9999-0.0" not in kept
    assert "31" in have and "21001" in have
    assert "42000" in lack  # not present in this tiny header

    rows = [
        {"FieldID": 21001, "Instances": 2, "Array": 1,
         "ValueType": "Continuous", "Field": "Body mass index (BMI)"},
        {"FieldID": 23104, "Instances": 1, "Array": 1,
         "ValueType": "Continuous", "Field": "Body mass index (BMI)"},
        {"FieldID": 53, "Instances": 1, "Array": 1,
         "ValueType": "Date", "Field": "Date of attending"},
        {"FieldID": 46, "Instances": 1, "Array": 1,
         "ValueType": "Integer", "Field": "Hand grip (left)"},
    ]
    dtype, dates, id2name = ukbb_dtype_map(rows)
    assert dtype["21001-0.0"] is float and "21001-1.0" in dtype
    assert "53-0.0" in dates and dtype["53-0.0"] is str
    # the impedance-BMI rename disambiguates the duplicate field name
    assert id2name[23104] == "Body mass index (BMI) Impedance"
    assert id2name[21001] == "Body mass index (BMI)"
    # field 46 forced float despite Integer value type
    assert dtype["46-0.0"] is float
