"""Tests for dataprep/ukbb_table.py — the preprocess_cardiac_table
notebook chain (cleaning order, derivations, quirks, vectorisation)."""

import numpy as np
import pandas as pd
import pytest

from stil_tta_tpu.dataprep import ukbb_table as ut


def _base_df(n=8):
    """A minimal raw-shaped table with every column the cleaning chain
    touches, numeric defaults, n subjects."""
    rng = np.random.RandomState(0)
    df = pd.DataFrame({"eid": np.arange(1000, 1000 + n)})

    def put(col, values=None):
        df[col] = values if values is not None else rng.rand(n) * 10 + 30

    put("Alcohol intake frequency.-2.0", [1, 2, -3, 3, 4, 5, 6, 1])
    put("Pulse wave Arterial Stiffness index-2.0",
        [5.0, 60.0, 8.0, 9.0, 10.0, 11.0, 12.0, 13.0])
    put("Sex-0.0", [0, 1, 0, 1, 0, 1, 0, 1])
    for i in ("0", "2"):
        for j in ("0", "1"):
            put(f"Systolic blood pressure, automated reading-{i}.{j}",
                [120.0, 130, 140, 600, 150, 160, 170, 180])
            put(f"Diastolic blood pressure, automated reading-{i}.{j}",
                [80.0, 85, 95, 100, 70, 75, 92, 91])
            put(f"Pulse rate, automated reading-{i}.{j}")
    put("Body fat percentage-2.0")
    put("Whole body fat mass-2.0")
    put("Body mass index (BMI)-2.0")
    put("Ethnic background-0.0", [1001] * 7 + [4001])
    put("Overall health rating-2.0", [1, 2, -1, -3, 3, 4, 1, 2])
    for i in range(4):
        put(f"Diabetes diagnosed by doctor-{i}.0",
            [1, 0, 0, 0, 0, 0, 0, 0])
        put(f"Age diabetes diagnosed-{i}.0",
            [np.nan, np.nan, 45.0, np.nan, np.nan, np.nan, np.nan,
             np.nan])
    for i in range(3):
        for j in range(4):
            put(f"Vascular/heart problems diagnosed by doctor-{i}.{j}",
                [1 if (i, j) == (0, 0) else 0, 2, 3, 4, -7, -3, 0, 0])
    for i in range(4):
        put(f"Age heart attack diagnosed-{i}.0",
            [np.nan, np.nan, np.nan, np.nan, np.nan, np.nan, 50.0,
             np.nan])
        put(f"Age high blood pressure diagnosed-{i}.0", [np.nan] * n)
        put(f"Age stroke diagnosed-{i}.0", [np.nan] * n)
    for d in ("Date of myocardial infarction-0.0", "Date of STEMI-0.0",
              "Date of NSTEMI-0.0"):
        put(d, [np.nan] * 7 + ["2015-03-01"])
    for i in range(4):
        for j in range(4):
            put(f"{ut.MED_FIELD_M}-{i}.{j}",
                [0, 1, 2, 3, 4, 5, -7, -1])
        for j in range(3):
            put(f"{ut.MED_FIELD_F}-{i}.{j}", [0, 0, 0, 0, 0, 0, 2, 0])
    put("Total thigh fat-free muscle volume-2.0")
    put("Total trunk fat volume-2.0")
    put("Substances taken for anxiety-0.1", [1, -818, -121, 2, 1, 1, 1, 1])
    put("Basal metabolic rate-2.0",
        [5.0, 1500, 1600, 1700, 1800, 1900, 2000, 2100])
    put("Waist circumference-2.0")
    put("Hip circumference-2.0")
    put("Weight-2.0", [1.0, 70, 80, 90, 60, 65, 75, 85])
    put("Average heart rate-2.0")
    put("QRS duration-2.0", [1.0, 80, 90, 100, 300, 85, 95, 88])
    put("Body surface area-2.0")
    put("Tobacco smoking-0.0", [111, 112, 113, 114, -818, 0, 1, 2])
    put("Shortness of breath walking on level ground-2.0",
        [0, 1, -1, -3, 0, 1, 0, 1])
    put("Ventricular rate-2.0")
    put("P duration-2.0")
    put("Cardiac output-2.0")
    put("Cardiac index-2.0")
    put("Number of days/week walked 10+ minutes-2.0",
        [0, 3, -1, -2, -3, 7, 5, 2])
    put("Duration of walks-2.0",
        [np.nan, 30, 40, 2000, -1, -3, 20, 10])
    put("Number of days/week of moderate physical activity"
        " 10+ minutes-2.0", [0, 2, 3, 4, 5, 6, 7, 1])
    put("Duration of moderate activity-2.0",
        [np.nan, 60, 45, 30, 20, 10, 90, 80])
    put("Number of days/week of vigorous physical activity"
        " 10+ minutes-2.0", [0, 1, 2, 3, 4, 5, 6, 7])
    put("Duration of vigorous activity-2.0",
        [np.nan, 15, 20, 25, 30, 35, 40, 45])
    put("Usual walking pace-2.0", [1, 2, 3, -7, -3, 2, 1, 3])
    # coded duration buckets (0..7), with one >1000 outlier
    put("Duration of strenuous sports-2.0",
        [np.nan, 3, -1, -3, 2000, 6, 4, 1])
    for i in range(5):
        put(f"{ut.ACTIVITY_FIELD}-2.{i}",
            [1, 2, 3, 4, 5, -7, -1, -3])
    put("Diastolic brachial blood pressure-2.0",
        [0.5, 80, 85, 90, 75, 70, 95, 88])
    for f in ut.PWA_FIELDS:
        put(f"{f}-2.0")
    put("Sleep duration-2.0", [7, 8, -1, -3, 6, 5, 9, 7])
    put("Sleeplessness / insomnia-2.0", [1, 2, 3, -1, -3, 2, 1, 3])
    put("Current tobacco smoking-2.0", [0, 1, 2, -1, -3, 0, 1, 2])
    put("Past tobacco smoking-2.0",
        [np.nan, 1, 2, 3, 4, -1, -3, 2])
    put("Exposure to tobacco smoke at home-2.0",
        [np.nan, 0, 10, 60, -1, -3, 5, 2])
    put("Exposure to tobacco smoke outside home-2.0",
        [np.nan, 0, 10, 60, -1, -3, 5, 2])
    put("Smoking status-2.0", [0, 1, 2, -1, -3, 0, 1, 2])
    put("Ever smoked-2.0", [0, 1, 0, 1, 0, 1, 0, 1])
    put("Age when attended assessment centre-2.0")
    put("Alcohol drinker status-2.0",
        [np.nan, 0, 1, 2, -1, -3, 1, 2])
    put("Falls in the last year-2.0", [1, 2, 3, -1, -3, 2, 1, 3])
    put("Long-standing illness, disability or infirmity-2.0",
        [0, 1, -1, -3, 0, 1, 0, 1])
    for i in range(223):
        df[f"Diagnoses - ICD10-0.{i}"] = pd.Series([None] * n,
                                                   dtype=object)
    df.loc[1, "Diagnoses - ICD10-0.0"] = "I210"
    df.loc[2, "Diagnoses - ICD10-0.1"] = "I250"
    return df.copy()


@pytest.fixture(scope="module")
def cleaned():
    df = _base_df()
    ut.clean_cardiac_table(df)
    return df


def test_special_code_cleaning(cleaned):
    df = cleaned
    assert pd.isna(df.loc[2, "Alcohol intake frequency.-2.0"])
    # ASI > 50 removed
    assert pd.isna(df.loc[1, "Pulse wave Arterial Stiffness index-2.0"])
    # sysBP outlier removal touches only array item .0 (the notebook
    # passes '-2.0'), so subject 3's recomputed mean over (NaN, 600)
    # stays 600 — faithful quirk
    assert pd.isna(df.loc[
        3, "Systolic blood pressure, automated reading-2.0"])
    assert df.loc[3, "Systolic blood pressure-2.mean"] == 600.0
    assert df.loc[0, "Systolic blood pressure-2.mean"] == 120.0
    # QRS <2 and >200 removed
    assert pd.isna(df.loc[0, "QRS duration-2.0"])
    assert pd.isna(df.loc[4, "QRS duration-2.0"])
    # tobacco recode 111..114 -> 3..0, -818 -> NA
    assert list(df.loc[:3, "Tobacco smoking-0.0"]) == [3, 2, 1, 0]
    assert pd.isna(df.loc[4, "Tobacco smoking-0.0"])
    # weight < 2 removed
    assert pd.isna(df.loc[0, "Weight-2.0"])


def test_activity_gating_and_fills(cleaned):
    df = cleaned
    # 0 days/week gates the duration to 0 (subject 0 answered 0 days)
    assert df.loc[0, "Duration of walks-2.0"] == 0
    assert df.loc[0, "Duration of moderate activity-2.0"] == 0
    # >1000 removed
    assert pd.isna(df.loc[3, "Duration of walks-2.0"])
    # strenuous sports: NA->0 happens BEFORE -1/-3 -> those stay NA
    assert df.loc[0, "Duration of strenuous sports-2.0"] == 0
    assert pd.isna(df.loc[2, "Duration of strenuous sports-2.0"])
    assert pd.isna(df.loc[4, "Duration of strenuous sports-2.0"])
    # past tobacco NA->1 before negative-code removal
    assert df.loc[0, "Past tobacco smoking-2.0"] == 1
    assert pd.isna(df.loc[5, "Past tobacco smoking-2.0"])
    # smoke exposure NA->7, >50 removed
    assert df.loc[0, "Exposure to tobacco smoke at home-2.0"] == 7
    assert pd.isna(df.loc[3, "Exposure to tobacco smoke at home-2.0"])
    # alcohol drinker status NA->0
    assert df.loc[0, "Alcohol drinker status-2.0"] == 0
    # falls: any negative -> NA
    assert pd.isna(df.loc[3, "Falls in the last year-2.0"])
    assert pd.isna(df.loc[4, "Falls in the last year-2.0"])


def test_diagnosis_derivations(cleaned):
    df = cleaned
    # diabetes: doctor (s0) + insulin answer 3 in med field (s3, s4 has
    # answer 4? values [0,1,2,3,4,5,-7,-1] -> s3 has 3)
    assert bool(df.loc[0, "Diabetes diagnosis"])
    assert bool(df.loc[3, "Diabetes diagnosis"])
    assert not bool(df.loc[2, "Diabetes diagnosis"])
    # the swapped update_through_age mutated the AGE columns, not the
    # diagnosis: subject 2 gave an age but stays undiagnosed, and the
    # age column became truthy for everyone (reference quirk)
    assert bool(df["Age diabetes diagnosed-0.0"].all())
    # vascular: subject 0 answered 1 at instance 0 -> heart attack; also
    # subjects 1/2/3 answered 2/3/4 in every cell
    assert bool(df.loc[0, "Heart attack diagnosed by doctor"])
    assert bool(df.loc[1, "Angina diagnosed by doctor"])
    assert bool(df.loc[2, "Stroke diagnosed by doctor"])
    assert bool(df.loc[3, "High blood pressure diagnosed by doctor"])
    # date of MI folds subject 7 into heart attack
    assert bool(df.loc[7, "Heart attack diagnosed by doctor"])
    # age heart attack folds subject 6 in (cell 122)
    assert bool(df.loc[6, "Heart attack diagnosed by doctor"])
    # medications: answers 1..5 map to the five flags
    assert bool(df.loc[1, "Cholesterol lowering medication regularly"
                          " taken"])
    assert bool(df.loc[2, "Blood pressure medication regularly taken"])
    assert bool(df.loc[4, "Hormone replacement therapy medication"
                          " regularly taken"])
    # female med field chains subject 6 (answer 2) into BP medication
    assert bool(df.loc[6, "Blood pressure medication regularly taken"])
    # cell 145 quirk: the misnamed columns exist and are all-NA
    assert df["Hormone replacement therapy regularly taken"].isna().all()
    # activity types: -7 becomes 'No physical activity'
    assert bool(df.loc[5, "No physical activity-2.0"])
    assert bool(df.loc[0, "Walking for pleasure-2.0"])


def test_vectorisation_one_hot_and_ordinal(cleaned):
    cleaned = cleaned.copy()
    for c in ut.CLINICAL_COLUMNS:  # unmerged run: all-NA clinical cols
        cleaned[c] = np.nan
    vec = ut.cardiac_features_to_vector(cleaned, one_hot=True)
    noh = ut.cardiac_features_to_vector(cleaned, one_hot=False)
    n_cont = len(ut.CONTINUOUS_COLUMNS)
    n_bin = len(ut.BINARY_COLUMNS)
    n_oh = sum(k for _, k, _ in ut.MULTICLASS_COLUMNS)
    assert vec.shape[1] == 1 + n_cont + n_bin + n_oh
    assert noh.shape[1] == 1 + n_cont + n_bin + len(ut.MULTICLASS_COLUMNS)
    # one-hot: subject 0 Sleeplessness=1 (one-based) -> class 0
    s = vec.loc[0, [f"Sleeplessness / insomnia-2.0-{i}"
                    for i in range(3)]].to_numpy(float)
    np.testing.assert_array_equal(s, [1.0, 0.0, 0.0])
    # NA rows -> all-NaN one-hot (subject 3 had -1 -> NA)
    s3 = vec.loc[3, [f"Sleeplessness / insomnia-2.0-{i}"
                     for i in range(3)]].to_numpy(float)
    assert np.isnan(s3).all()
    # noOH: one-based shifted to 0-based
    assert noh.loc[0, "Sleeplessness / insomnia-2.0"] == 0
    # zero-based stays put
    assert noh.loc[2, "Smoking status-2.0"] == 2
    # binary columns are NaN-preserving ints
    assert noh.loc[2, "Long-standing illness, disability or"
                      " infirmity-2.0"] is pd.NA


def test_build_vector_tables_end_to_end(tmp_path):
    df = _base_df()
    clinical = pd.DataFrame({
        "Unnamed: 0": df["eid"],
        **{c: np.linspace(1, 2, len(df)) for c in ut.CLINICAL_COLUMNS},
    })
    tables = ut.build_vector_tables(df, clinical, tmp_path)
    assert set(tables) == {
        "cardiac_feature_18545_vector",
        "cardiac_feature_18545_vector_labeled",
        "cardiac_feature_18545_vector_noOH",
        "cardiac_feature_18545_vector_labeled_noOH",
    }
    labeled = tables["cardiac_feature_18545_vector_labeled"]
    # ethnicity filter dropped subject 7 (4001)
    assert len(labeled) == 7
    assert 1007 not in set(labeled["eid"])
    # ICD I210 -> Infarction + CAD for subject 1; I250 never matches
    # under the faithful missing-comma codes (subject 2)
    row1 = labeled[labeled["eid"] == 1001].iloc[0]
    assert row1["Infarction"] == 1 and row1["CAD"] == 1
    row2 = labeled[labeled["eid"] == 1002].iloc[0]
    assert row2["CAD"] == 0
    # doctor-diagnosed heart attack (subject 0) forces Infarction=1
    row0 = labeled[labeled["eid"] == 1000].iloc[0]
    assert row0["Infarction"] == 1
    # clinical columns merged
    assert not labeled["LVEF (%)"].isna().any()
    # label columns present in both labeled variants, absent otherwise
    for k in ("Infarction", "CAD", "CAD_broad", "Hypertension"):
        assert k in labeled.columns
        assert k not in tables["cardiac_feature_18545_vector"].columns
    # files written
    assert (tmp_path / "cardiac_feature_18545_vector_labeled_noOH.csv"
            ).exists()


def test_fixed_codes_restore_missing_comma(tmp_path):
    df = _base_df()
    tables = ut.build_vector_tables(df, None, faithful=False,
                                    out_dir=None)
    labeled = tables["cardiac_feature_18545_vector_labeled"]
    row2 = labeled[labeled["eid"] == 1002].iloc[0]
    assert row2["CAD"] == 1  # I250 matches once the comma is repaired


def test_utils_vectorised_semantics():
    df = pd.DataFrame({
        "eid": [1, 2, 3],
        "f-2.0": [1.0, 2.0, np.nan],
        "f-2.1": [3.0, np.nan, np.nan],
    })
    ut.calc_and_save_mean(df, "f-2.0")
    np.testing.assert_allclose(df["f-2.mean"].to_numpy(),
                               [2.0, 2.0, np.nan])
    # one_hot_encode_column matches the scalar reference semantics
    col = pd.Series([1.0, 3.0, np.nan])
    oh = ut.one_hot_encode_column(col, 3, one_based=True)
    np.testing.assert_array_equal(oh[0], [1, 0, 0])
    np.testing.assert_array_equal(oh[1], [0, 0, 1])
    assert np.isnan(oh[2]).all()
    # expand_list names match tabular_utils
    df2 = pd.DataFrame({"x": [[1, 0], [0, 1]]})
    out = ut.expand_list(df2, "x")
    assert list(out.columns) == ["x-0", "x-1"]
    # operations_performed counts across the 3x32 grid
    big = pd.DataFrame({f"Operation code-{i}.{j}": [np.nan, np.nan]
                        for i in range(3) for j in range(32)})
    big["Operation code-0.0"] = ["1096", np.nan]
    big["Operation code-2.31"] = ["1548", "9999"]
    counts = ut.operations_performed(big, "Operation code",
                                     ["1096", "1548"])
    assert list(counts) == [2, 0]
