"""missing_tabular mode: config -> mask attachment -> attention masking.

Parity target: the ``missing_tabular / missing_strategy / missing_rate``
keys (``config_dvm_STiL.yaml:43-46``) and the mask artifacts of
``data/create_missing_mask.ipynb``, consumed as attention masking in the
tabular encoder (``models/Transformer.py:264-274``).
"""

import numpy as np
import pytest

from stil_tta_tpu.config import load_config
from stil_tta_tpu.data.datasets import attach_missing_masks, load_sources
from tests.helpers import FIELD_LENGTHS, NUM_CLASSES, tiny_cfg


def _cfg(**over):
    base = dict(synthetic_image_size=40, synthetic_labelled=8,
                synthetic_unlabelled=24, synthetic_val=16,
                synthetic_test=16, max_epochs=1,
                strict_prototypes="false", test_and_eval="false",
                enable_progress_bar="false", missing_tabular="true")
    base.update(over)
    return tiny_cfg(**base)


def test_attach_random_masks_rate_and_split_independence():
    cfg = _cfg(missing_strategy="random", missing_rate=0.3)
    sources = attach_missing_masks(load_sources(cfg), cfg)
    for src in sources.values():
        assert src.missing is not None
        assert src.missing.shape == src.tabular.shape
        assert src.missing.dtype == bool
        assert abs(src.missing.mean() - 0.3) < 0.15
    a = sources["val"].missing
    b = sources["test"].missing
    assert a.shape == b.shape and not np.array_equal(a, b)


def test_attach_feature_masks_same_columns_across_splits():
    cfg = _cfg(missing_strategy="feature", missing_rate=0.5)
    sources = attach_missing_masks(load_sources(cfg), cfg)
    cols = None
    k = int(round(len(FIELD_LENGTHS) * 0.5))
    for src in sources.values():
        col_mask = src.missing.all(axis=0)
        assert col_mask.sum() == k
        # whole columns, nothing partial
        assert np.array_equal(src.missing.any(axis=0), col_mask)
        if cols is None:
            cols = col_mask
        assert np.array_equal(col_mask, cols)


def test_mask_file_takes_precedence(tmp_path):
    from stil_tta_tpu.data.source import synthetic_source
    src = synthetic_source(6, num_classes=NUM_CLASSES,
                           field_lengths=FIELD_LENGTHS, image_size=40,
                           labelled_frac=1.0, seed=0)
    split = tmp_path / "val"
    src.save(split)
    ref = np.zeros((6, len(FIELD_LENGTHS)), bool)
    ref[:, 2] = True
    np.save(split / "missing_mask.npy", ref)

    cfg = _cfg(missing_strategy="random", missing_rate=0.9)
    cfg.synthetic = False
    cfg.data_base = str(tmp_path)
    for s in ("train_labelled", "train_unlabelled", "test"):
        src.save(tmp_path / s)
    sources = attach_missing_masks(load_sources(cfg), cfg)
    assert np.array_equal(sources["val"].missing, ref)


def test_missing_mask_changes_model_output():
    """The attention mask must actually reach the tabular encoder."""
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.algorithms.registry import get_algorithm

    cfg = _cfg(missing_strategy="random", missing_rate=0.5)
    algo = get_algorithm("STiL")(cfg, FIELD_LENGTHS)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    tab = jnp.ones((2, len(FIELD_LENGTHS)), jnp.float32)
    state = algo.init_state(jax.random.key(0), img, tab)

    mask = jnp.zeros((2, len(FIELD_LENGTHS)), bool).at[:, :3].set(True)
    out_none = algo.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        img, tab, train=False)
    out_mask = algo.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        img, tab, train=False, missing_mask=mask)
    d = float(jnp.max(jnp.abs(out_none["out_m"].astype(jnp.float32)
                              - out_mask["out_m"].astype(jnp.float32))))
    assert d > 1e-4


def test_evaluate_e2e_with_missing(tmp_path):
    from stil_tta_tpu.train.evaluate import evaluate

    cfg = _cfg(missing_strategy="feature", missing_rate=0.34,
               max_epochs=1)
    cfg.logdir = str(tmp_path / "run")
    results = evaluate(cfg)
    assert "best_val" in results and np.isfinite(results["best_val"])
