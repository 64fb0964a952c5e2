"""Distribution-shifted split construction (the "-TTA" fork's core
data contribution).

Parity target: ``/root/reference/data/create_shifted_data.ipynb`` (145
cells) + the 15 ``configs/dataset/shifted_configs/*`` it feeds: hold-out
splits of the DVM table along a shift dimension — body color (black /
{blue,silver,grey} / {blue,silver,black,grey,white}), registration year
(``adv_year``), mileage (``miles``), label subsets (``labels``,
``labels_black``) and a ``normal`` i.i.d. control — with a
Jensen-Shannon-divergence report quantifying the induced shift.

Implemented as a library + CLI over :class:`ArraySource` splits instead
of a notebook.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from stil_tta_tpu.data.source import ArraySource


def js_divergence(p: np.ndarray, q: np.ndarray, bins: int = 30) -> float:
    """JS divergence between two empirical 1-D distributions."""
    lo = min(p.min(), q.min())
    hi = max(p.max(), q.max())
    if hi <= lo:
        return 0.0
    hp, _ = np.histogram(p, bins=bins, range=(lo, hi), density=False)
    hq, _ = np.histogram(q, bins=bins, range=(lo, hi), density=False)
    hp = hp / max(hp.sum(), 1)
    hq = hq / max(hq.sum(), 1)
    m = (hp + hq) / 2

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log(
            a[mask] / np.clip(b[mask], 1e-12, None))))

    return 0.5 * kl(hp, m) + 0.5 * kl(hq, m)


def shift_report(train: ArraySource, test: ArraySource) -> Dict[str, float]:
    """Per-feature JS divergence between split marginals (the
    notebook's shift-quantification analysis)."""
    report = {}
    for f in range(train.tabular.shape[1]):
        report[f"feature_{f}"] = js_divergence(train.tabular[:, f],
                                               test.tabular[:, f])
    report["labels"] = js_divergence(train.labels.astype(float),
                                     test.labels.astype(float))
    return report


@dataclasses.dataclass
class ShiftSpec:
    """Hold out rows where ``predicate(tabular, labels)`` is True as the
    shifted test pool; the remainder forms the train pool."""

    name: str
    predicate: Callable[[np.ndarray, np.ndarray], np.ndarray]
    description: str = ""


def make_column_value_shift(name: str, column: int, values,
                            description: str = "") -> ShiftSpec:
    vals = np.asarray(values, np.float32)
    return ShiftSpec(
        name=name,
        predicate=lambda tab, y: np.isin(tab[:, column], vals),
        description=description or f"column {column} in {list(values)}")


def make_quantile_shift(name: str, column: int, q: float,
                        upper: bool = True) -> ShiftSpec:
    def pred(tab, y):
        thr = np.quantile(tab[:, column], q)
        return tab[:, column] >= thr if upper else tab[:, column] <= thr

    return ShiftSpec(name=name, predicate=pred,
                     description=f"column {column} {'>=' if upper else '<='}"
                                 f" quantile {q}")


def make_label_subset_shift(name: str, labels) -> ShiftSpec:
    ls = np.asarray(labels)
    return ShiftSpec(name=name,
                     predicate=lambda tab, y: np.isin(y, ls),
                     description=f"labels in subset ({len(ls)})")


def make_normal_shift(name: str = "normal", frac: float = 0.2,
                      seed: int = 0) -> ShiftSpec:
    def pred(tab, y):
        rng = np.random.RandomState(seed)
        return rng.rand(len(y)) < frac

    return ShiftSpec(name=name, predicate=pred,
                     description="i.i.d. control split")


def build_shifted_splits(source: ArraySource, spec: ShiftSpec,
                         label_fraction: float = 0.01,
                         seed: int = 0,
                         out_dir: Optional[Path] = None) -> Dict:
    """Produce {train_labelled, train_unlabelled, test} under the shift,
    with ``label_fraction`` of the train pool labeled (the reference's
    SemiPseudo_{0.01,0.1} splits)."""
    held_out = spec.predicate(source.tabular, source.labels)
    train_idx = np.where(~held_out)[0]
    test_idx = np.where(held_out)[0]
    rng = np.random.RandomState(seed)
    perm = rng.permutation(train_idx)
    n_lab = max(int(round(len(perm) * label_fraction)), 1)
    lab_idx, unlab_idx = perm[:n_lab], perm[n_lab:]

    def subset(idx, labelled):
        return ArraySource(
            images=np.asarray(source.images[np.sort(idx)]),
            tabular=source.tabular[np.sort(idx)],
            labels=source.labels[np.sort(idx)],
            labelled=np.full(len(idx), labelled, bool),
            field_lengths=source.field_lengths,
            num_classes=source.num_classes, target=source.target)

    splits = {"train_labelled": subset(lab_idx, True),
              "train_unlabelled": subset(unlab_idx, False),
              "test": subset(test_idx, True)}
    report = shift_report(splits["train_labelled"], splits["test"])
    if out_dir is not None:
        out_dir = Path(out_dir)
        for name, src in splits.items():
            src.save(out_dir / name)
        with open(out_dir / "shift_report.json", "w") as f:
            json.dump({"shift": spec.name,
                       "description": spec.description,
                       "label_fraction": label_fraction,
                       "sizes": {k: len(v) for k, v in splits.items()},
                       "js_divergence": report}, f, indent=2)
    return {"splits": splits, "report": report}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True,
                    help="native-format split dir of the full dataset")
    ap.add_argument("--shift", required=True,
                    choices=["column", "quantile", "labels", "normal"])
    ap.add_argument("--name", required=True)
    ap.add_argument("--column", type=int)
    ap.add_argument("--values", type=float, nargs="*")
    ap.add_argument("--quantile", type=float, default=0.8)
    ap.add_argument("--label-subset", type=int, nargs="*")
    ap.add_argument("--label-fraction", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    source = ArraySource.load(args.source, mmap=True)
    if args.shift == "column":
        spec = make_column_value_shift(args.name, args.column, args.values)
    elif args.shift == "quantile":
        spec = make_quantile_shift(args.name, args.column, args.quantile)
    elif args.shift == "labels":
        spec = make_label_subset_shift(args.name, args.label_subset)
    else:
        spec = make_normal_shift(args.name, seed=args.seed)
    res = build_shifted_splits(source, spec, args.label_fraction,
                               args.seed, Path(args.out))
    print(json.dumps(res["report"], indent=2))


if __name__ == "__main__":
    main()
