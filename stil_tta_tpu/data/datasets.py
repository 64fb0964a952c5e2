"""Dataset assembly from config.

Maps the reference's dataset-config surface (SURVEY.md §2.2 artifact
contract; ``configs/dataset/*.yaml``) onto :class:`ArraySource` splits.
Two modes:

- native artifact directories (produced by
  ``tools/convert_torch_artifacts.py``): ``{data_base}/train_labelled``,
  ``train_unlabelled``, ``val``, ``test`` or explicit per-split keys
  (``data_train_labelled`` etc.),
- ``synthetic: true`` — class-conditional synthetic data for tests,
  smoke runs and the benchmark harness (sizes via ``synthetic_*`` keys).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

from stil_tta_tpu.data.source import ArraySource, synthetic_source

SPLITS = ("train_labelled", "train_unlabelled", "val", "test")


def load_sources(cfg) -> Dict[str, ArraySource]:
    if cfg.synthetic:
        n_l = int(cfg.synthetic_labelled or 64)
        n_u = int(cfg.synthetic_unlabelled or 448)
        n_v = int(cfg.synthetic_val or 128)
        n_t = int(cfg.synthetic_test or 128)
        nc = int(cfg.num_classes or 8)
        size = int(cfg.synthetic_image_size or cfg.img_size or 64)
        fl = cfg.field_lengths
        target = cfg.target or "dvm"
        mk = lambda n, frac, seed: synthetic_source(
            n, num_classes=nc, field_lengths=fl, image_size=size,
            labelled_frac=frac, target=target, seed=seed)
        return {"train_labelled": mk(n_l, 1.0, 0),
                "train_unlabelled": mk(n_u, 0.0, 1),
                "val": mk(n_v, 1.0, 2), "test": mk(n_t, 1.0, 3)}

    base = Path(cfg.data_base or ".")
    # per-fraction dataset configs (dataset=dvm_..._SemiPseudo_0.05 etc.)
    # name the conventional subdirectory holding that fraction's
    # converted artifacts, mirroring the reference's per-fraction
    # artifact-file suffixes (``configs/dataset/*_SemiPseudo_*.yaml``)
    if cfg.get("fraction_dir"):
        base = base / str(cfg.fraction_dir)
    out = {}
    for split in SPLITS:
        key = f"data_{split}"
        path = cfg.get(key) or (base / split)
        out[split] = ArraySource.load(path)
    return out


def attach_missing_masks(sources: Dict[str, ArraySource],
                         cfg) -> Dict[str, ArraySource]:
    """Populate ``source.missing`` for the ``missing_tabular`` mode
    (``config_dvm_STiL.yaml:43-46`` keys; masks consumed as attention
    masking in the tabular encoder — ``Transformer.py:264-274``).

    Per split, a pre-generated ``missing_mask.npy`` (the
    ``create_missing_mask.ipynb`` artifact, via
    ``stil_tta_tpu.dataprep.missing_mask``) is loaded from the split
    directory when present; otherwise a mask is generated on the fly
    from ``missing_strategy`` / ``missing_rate``. ``feature`` (and the
    notebook's importance-ranked ``MI``/``LI``, which need an external
    importance file) drop the same columns across splits; ``random``
    is i.i.d. per split.
    """
    if not cfg.missing_tabular:
        return sources
    import dataclasses

    import numpy as np

    from stil_tta_tpu.dataprep.missing_mask import (
        feature_missing_mask, random_missing_mask)

    rate = float(cfg.missing_rate or 0.0)
    strategy = str(cfg.missing_strategy or "random")
    base = Path(cfg.data_base or ".")
    out = {}
    for i, (split, src) in enumerate(sources.items()):
        if src.missing is not None:
            out[split] = src
            continue
        mask = None
        key = cfg.get(f"data_{split}")
        split_dir = Path(key) if key else (base / split)
        mask_file = split_dir / "missing_mask.npy"
        if mask_file.exists():
            mask = np.load(mask_file)
        elif strategy in ("feature", "MI", "LI"):
            # same columns across splits (fixed seed)
            mask = feature_missing_mask(len(src), src.tabular.shape[1],
                                        rate, seed=0)
        else:
            mask = random_missing_mask(len(src), src.tabular.shape[1],
                                       rate, seed=1000 + i)
        out[split] = dataclasses.replace(src, missing=mask.astype(bool))
    return out


def apply_sweep_truncation(sources: Dict[str, ArraySource],
                           cfg) -> Dict[str, ArraySource]:
    """``sweep``/``unit_test`` truncation to <= 5000 samples
    (``ContrastiveImagingAndTabularDataset.py:104-111``)."""
    if cfg.sweep or cfg.unit_test:
        sources = {k: v.truncate(5000) for k, v in sources.items()}
    if cfg.delete_segmentation:
        # zero the first channel (cardiac segmentation plane,
        # ``ContrastiveImagingAndTabularDataset.py:64-66``)
        import dataclasses
        import numpy as np
        out = {}
        for k, v in sources.items():
            imgs = np.array(v.images)
            imgs[..., 0] = 0
            out[k] = dataclasses.replace(v, images=imgs)
        sources = out
    return sources
