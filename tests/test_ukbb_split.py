"""UKBB cardiac split assembly (`dataprep/ukbb_split.py`) vs the
reference notebooks (`preprocess_ukbb/create_image_tabular_split.ipynb`
cells 9-20, `preprocess_cardiac_table.ipynb` cells 222-231)."""

import numpy as np
import pandas as pd
import pytest

from stil_tta_tpu.dataprep import ukbb_split as us

torch = pytest.importorskip("torch")


def _labeled_frame(n=80, seed=0):
    """Synthetic cardiac_feature_*_vector_labeled_noOH-shaped table:
    eid + 49 continuous + 26 categorical + the doctor/ICD columns the
    label derivation needs."""
    rs = np.random.RandomState(seed)
    d = {"eid": np.arange(1000, 1000 + n)}
    for c in us.CONTINUOUS_COLUMNS:
        col = rs.normal(50, 10, n)
        col[rs.rand(n) < 0.1] = np.nan  # holes for the imputers
        d[c] = col
    for c in us.CATEGORICAL_COLUMNS:
        d[c] = rs.randint(0, 4, n).astype(float)
    d["Heart attack diagnosed by doctor"] = rs.randint(0, 2, n)
    df = pd.DataFrame(d)
    # keep the label-input columns hole-free
    for c in ("Systolic blood pressure-2.mean",
              "Diastolic blood pressure-2.mean"):
        df[c] = rs.normal(120, 15, n)
    for c in ("High blood pressure diagnosed by doctor",
              "Blood pressure medication regularly taken"):
        df[c] = rs.randint(0, 2, n).astype(float)
    return df


def _icd_frame(n, codes_at=None):
    """223 'Diagnoses - ICD10-0.{i}' columns, NaN except prescribed."""
    cols = {f"{us.ICD_FIELD}-0.{i}": pd.Series([None] * n, dtype=object)
            for i in range(us.N_ICD_COLUMNS)}
    df = pd.DataFrame(cols)
    for (row, col), code in (codes_at or {}).items():
        df.iloc[row, col] = code
    return df


def test_label_derivation_and_missing_comma_quirk():
    feat = _labeled_frame(n=8)
    feat["Heart attack diagnosed by doctor"] = 0
    feat["High blood pressure diagnosed by doctor"] = 0.0
    feat["Blood pressure medication regularly taken"] = 0.0
    feat["Systolic blood pressure-2.mean"] = 120.0
    feat["Diastolic blood pressure-2.mean"] = 80.0
    icd = _icd_frame(8, codes_at={
        (0, 0): "I210",    # infarction + CAD
        (1, 5): "I252",    # infarction (I252 is in both sets) + CAD
        (2, 100): "I249",  # swallowed by the missing-comma quirk
        (3, 7): "I250",    # likewise
        (4, 0): "I500",    # heart failure -> CAD_broad only
        (5, 3): "I200",    # CAD only
    })
    out = us.derive_labels(icd, feat, faithful=True)
    assert out["Infarction"].tolist() == [1, 1, 0, 0, 0, 0, 0, 0]
    assert out["CAD"].tolist() == [1, 1, 0, 0, 0, 1, 0, 0]
    assert out["CAD_broad"].tolist() == [1, 1, 0, 0, 1, 1, 0, 0]

    fixed = us.derive_labels(icd, feat, faithful=False)
    assert fixed["CAD"].tolist() == [1, 1, 1, 1, 0, 1, 0, 0]

    # cell 223: doctor-diagnosed heart attack forces Infarction=1
    feat2 = feat.copy()
    feat2.loc[6, "Heart attack diagnosed by doctor"] = 1
    out2 = us.derive_labels(icd, feat2)
    assert out2.loc[6, "Infarction"] == 1

    # cell 231 hypertension: BOTH BP limits exceeded, or diagnosis/med
    feat3 = feat.copy()
    feat3.loc[0, "Systolic blood pressure-2.mean"] = 150.0
    feat3.loc[0, "Diastolic blood pressure-2.mean"] = 95.0
    feat3.loc[1, "Systolic blood pressure-2.mean"] = 150.0  # dia normal
    feat3.loc[2, "Blood pressure medication regularly taken"] = 1.0
    out3 = us.derive_labels(icd, feat3)
    assert out3["Hypertension"].tolist()[:3] == [1, 0, 1]


def test_split_ids_match_sklearn_reference():
    ids = list(range(100, 180))
    train, val, test = us.split_subject_ids(ids)
    assert len(test) == 8 and len(train) + len(val) == 72
    assert sorted(train + val + test) == sorted(ids)
    # reproduces the notebook's exact nested train_test_split shuffles
    from sklearn.model_selection import train_test_split
    ts, te = train_test_split(ids, test_size=0.1, random_state=2022)
    tr, va = train_test_split(ts, test_size=0.2, random_state=2022)
    assert (train, val, test) == (tr, va, te)


def test_field_lengths_reorder_and_noext():
    feat = _labeled_frame()
    imputed = us.assemble_feature_table(feat, "simple")
    assert list(imputed.columns[:1]) == ["eid"]
    assert not imputed.isnull().any().any()
    lengths = us.compute_field_lengths(imputed)
    assert len(lengths) == 49 + 26
    assert lengths[:49] == [1] * 49
    assert all(l >= 1 for l in lengths[49:])
    reorder, reordered, noext = us.reorder_indices(lengths)
    assert len(reorder) == 75 and sorted(reorder) == list(range(75))
    # categorical-first: every non-1 length leads
    n_cat = sum(1 for l in lengths if l != 1)
    assert all(l != 1 for l in reordered[:n_cat])
    assert all(l == 1 for l in reordered[n_cat:])
    assert noext == reordered[:-10]


def test_global_zscore_before_split():
    feat = _labeled_frame()
    cont = feat.loc[:, us.CONTINUOUS_COLUMNS]
    z = us.normalise_continuous(cont)
    col = us.CONTINUOUS_COLUMNS[3]
    ref = (cont[col] - cont[col].mean()) / cont[col].std()
    pd.testing.assert_series_equal(z[col], ref)


def test_iterative_impute_rounds_categoricals():
    feat = _labeled_frame(n=60)
    cat = feat.loc[:, us.CATEGORICAL_COLUMNS].copy()
    cat.iloc[2, 3] = np.nan
    cont = us.normalise_continuous(feat.loc[:, us.CONTINUOUS_COLUMNS])
    c2, k2 = us.impute_iterative(cont, cat)
    assert not c2.isnull().any().any() and not k2.isnull().any().any()
    assert np.allclose(k2.to_numpy(), np.round(k2.to_numpy()))


def test_full_assembly_artifact_contract(tmp_path):
    n_subjects = 400  # the chained 0.01 subset needs a real-data scale
    feat = _labeled_frame(n=n_subjects)
    icd = _icd_frame(len(feat), codes_at={
        (i, i % us.N_ICD_COLUMNS): "I210"
        for i in range(0, n_subjects, 3)})
    labeled = us.derive_labels(icd, feat)
    paths = {int(e): f"/img/{int(e)}.npy" for e in labeled["eid"]}
    invalid = [1000, 1001]
    problem = [1002]
    out = us.assemble_cardiac_splits(
        labeled, paths, tmp_path, targets=("CAD",),
        invalid_ids=invalid, problem_ids=problem)

    n = n_subjects - 3
    splits = out["splits"]
    assert sum(len(v) for v in splits.values()) == n
    assert not ({1000, 1001, 1002}
                & set(sum(splits.values(), [])))

    # unbalanced artifacts: reordered CSV (+noExt), paths, labels
    df = pd.read_csv(
        tmp_path / "cardiac_features_train_imputed_noOH_tabular_imaging"
                   "_reordered.csv", header=None)
    assert df.shape == (len(splits["train"]), 75)
    noext = pd.read_csv(
        tmp_path / "cardiac_features_train_imputed_noOH_tabular_imaging"
                   "_reordered_noExt.csv", header=None)
    assert noext.shape == (len(splits["train"]), 65)
    # noExt is a prefix of the reordered frame
    assert np.allclose(noext.to_numpy(), df.to_numpy()[:, :65])
    lab = torch.load(tmp_path / "cardiac_labels_CAD_train.pt",
                     weights_only=False)
    kept = us.drop_subjects(labeled, invalid + problem)
    expect = kept.set_index("eid").loc[splits["train"], "CAD"].values
    assert np.array_equal(np.asarray(lab), expect)
    p = torch.load(tmp_path / "cardiac_train_paths_imaging.pt",
                   weights_only=False)
    assert p == [paths[k] for k in splits["train"]]

    # balanced: equal positives/negatives, positives first
    bal_ids = torch.load(
        tmp_path / "ids_train_tabular_imaging_CAD_balanced.pt",
        weights_only=False)
    bal_lab = np.asarray(torch.load(
        tmp_path / "cardiac_labels_CAD_train_balanced.pt",
        weights_only=False))
    assert len(bal_ids) % 2 == 0 and bal_lab.sum() * 2 == len(bal_lab)
    half = len(bal_lab) // 2
    assert bal_lab[:half].all() and not bal_lab[half:].any()

    # chained low-data subsets: 0.1 of balanced train, then 0.1 again,
    # both stratified (exactly balanced inputs stay balanced +-1)
    ld1 = torch.load(
        tmp_path / "ids_train_tabular_imaging_CAD_0.1_balanced.pt",
        weights_only=False)
    ld2 = torch.load(
        tmp_path / "ids_train_tabular_imaging_CAD_0.01_balanced.pt",
        weights_only=False)
    import math
    assert len(ld1) == math.ceil(0.1 * len(bal_ids))
    assert len(ld2) == math.ceil(0.1 * len(ld1))
    assert set(ld2) <= set(ld1) <= set(bal_ids)
    l1 = np.asarray(torch.load(
        tmp_path / "cardiac_labels_CAD_0.1_train_balanced.pt",
        weights_only=False))
    assert abs(int(l1.sum()) * 2 - len(l1)) <= 1
    f1 = pd.read_csv(
        tmp_path / "cardiac_features_train_imputed_noOH_tabular_imaging"
                   "_CAD_0.1_balanced_reordered.csv", header=None)
    assert f1.shape == (len(ld1), 75)
