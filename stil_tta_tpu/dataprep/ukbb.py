"""UK Biobank cardiac preprocessing.

Parity target: ``/root/reference/data/preprocess_ukbb/*`` (791 LoC):
short-axis cardiac MR NIfTI volumes -> fixed-size 2D arrays (mid-slice
crops across timepoints stacked as channels), plus tabular filtering of
the UKBB field table down to the 26 categorical + 49 continuous features
the cardiac configs use (``configs/dataset/cardiac_CAD_SemiPseudo_0.01
.yaml:20-21``) and binary CAD/Infarction label extraction.

nibabel is not in this image, so NIfTI reading is gated behind a lazy
import — the numeric pipeline (crop, normalise, pack) is importable and
tested without it.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np


def center_crop(volume: np.ndarray, size: int) -> np.ndarray:
    """Crop (H, W, ...) to (size, size, ...) about the centre, padding
    with zeros if needed."""
    h, w = volume.shape[:2]
    out_shape = (size, size) + volume.shape[2:]
    out = np.zeros(out_shape, volume.dtype)
    ys = max((h - size) // 2, 0)
    xs = max((w - size) // 2, 0)
    yo = max((size - h) // 2, 0)
    xo = max((size - w) // 2, 0)
    ch = min(h, size)
    cw = min(w, size)
    out[yo:yo + ch, xo:xo + cw] = volume[ys:ys + ch, xs:xs + cw]
    return out


def normalise_intensity(img: np.ndarray, lo_pct: float = 1.0,
                        hi_pct: float = 99.0) -> np.ndarray:
    """Percentile-clip + [0, 1] scale (standard cardiac MR recipe)."""
    lo, hi = np.percentile(img, [lo_pct, hi_pct])
    img = np.clip(img, lo, hi)
    return ((img - lo) / max(hi - lo, 1e-6)).astype(np.float32)


def pack_cardiac_image(volume_t: np.ndarray, size: int = 128,
                       timepoints: Sequence[int] = (0,),
                       mid_slice: Optional[int] = None) -> np.ndarray:
    """(H, W, Z, T) cine volume -> (size, size, len(timepoints)) float32:
    mid-ventricular slice at the chosen cardiac phases, normalised and
    centre-cropped (the reference stacks ED/ES/mid phases as channels)."""
    h, w, z, t = volume_t.shape
    zmid = z // 2 if mid_slice is None else mid_slice
    chans = []
    for tp in timepoints:
        sl = normalise_intensity(volume_t[:, :, zmid, tp % t])
        chans.append(center_crop(sl, size))
    return np.stack(chans, axis=-1)


def load_nifti(path) -> np.ndarray:
    try:
        import nibabel as nib
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "nibabel is required for NIfTI reading; install it or "
            "convert volumes to .npy upstream") from e
    return np.asarray(nib.load(str(path)).get_fdata())


def filter_tabular(df, cat_cols: List[str], con_cols: List[str],
                   max_missing_frac: float = 0.5):
    """Drop rows with too many missing fields, median/mode-impute the
    rest, label-encode categoricals, z-score continuous — the
    preprocess_ukbb tabular recipe. Returns (table, field_lengths)."""
    import pandas as pd
    cols = cat_cols + con_cols
    sub = df[cols].copy()
    keep = sub.isna().mean(axis=1) <= max_missing_frac
    sub = sub[keep]
    field_lengths = []
    arrays = []
    for c in cat_cols:
        col = sub[c].fillna(sub[c].mode().iloc[0])
        codes, uniq = pd.factorize(col, sort=True)
        field_lengths.append(len(uniq))
        arrays.append(codes.astype(np.float32))
    for c in con_cols:
        col = sub[c].fillna(sub[c].median()).astype(np.float32)
        std = col.std() or 1.0
        arrays.append(((col - col.mean()) / std).to_numpy())
        field_lengths.append(1)
    return np.stack(arrays, axis=1), field_lengths, keep.to_numpy()


def main():  # pragma: no cover - needs raw UKBB data
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nifti-list", required=True,
                    help="file with one NIfTI path per line")
    ap.add_argument("--table", required=True)
    ap.add_argument("--cat-cols", nargs="+", required=True)
    ap.add_argument("--con-cols", nargs="+", required=True)
    ap.add_argument("--label-col", required=True)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--timepoints", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import pandas as pd
    from stil_tta_tpu.data.source import ArraySource

    df = pd.read_csv(args.table)
    tab, field_lengths, keep = filter_tabular(df, args.cat_cols,
                                              args.con_cols)
    labels = df.loc[keep, args.label_col].astype(int).to_numpy()
    paths = [p.strip() for p in open(args.nifti_list)]
    paths = [p for p, k in zip(paths, keep) if k]
    imgs = np.stack([
        pack_cardiac_image(load_nifti(p), args.size, args.timepoints)
        for p in paths])
    src = ArraySource(images=imgs, tabular=tab, labels=labels,
                      labelled=np.ones(len(labels), bool),
                      field_lengths=field_lengths, num_classes=2,
                      target="CAD")
    src.save(args.out)
    print(f"wrote {len(src)} subjects -> {args.out}")


if __name__ == "__main__":
    main()
