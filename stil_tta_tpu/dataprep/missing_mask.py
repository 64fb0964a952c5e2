"""Missing-feature mask generation.

Parity target: ``/root/reference/data/create_missing_mask.ipynb`` and
the ``missing_tabular / missing_strategy / missing_rate`` config keys
(``config_dvm_STiL.yaml:42-45``): boolean (N, F) masks marking tabular
columns as missing, either uniformly at random ("random") or by dropping
whole columns ("feature"), consumed by the tabular transformer's
attention masking (``models/Transformer.py:264-274`` — our
``build_attention_mask``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def random_missing_mask(n: int, num_features: int, rate: float,
                        seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.rand(n, num_features) < rate


def feature_missing_mask(n: int, num_features: int, rate: float,
                         seed: int = 0,
                         importance: np.ndarray | None = None) -> np.ndarray:
    """Drop entire columns; with ``importance`` given, drop the
    most-important columns first (the notebook's value-based strategy)."""
    rng = np.random.RandomState(seed)
    k = int(round(num_features * rate))
    if importance is None:
        cols = rng.choice(num_features, size=k, replace=False)
    else:
        cols = np.argsort(-np.asarray(importance))[:k]
    mask = np.zeros((n, num_features), bool)
    mask[:, cols] = True
    return mask


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--num-features", type=int, required=True)
    ap.add_argument("--rate", type=float, required=True)
    ap.add_argument("--strategy", choices=["random", "feature"],
                    default="random")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    fn = random_missing_mask if args.strategy == "random" \
        else feature_missing_mask
    mask = fn(args.n, args.num_features, args.rate, args.seed)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.save(args.out, mask)
    print(f"wrote {mask.shape} mask ({mask.mean():.3f} missing) -> "
          f"{args.out}")


if __name__ == "__main__":
    main()
