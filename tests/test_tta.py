"""TTA (Tent / BN-adapt) tests: adaptation changes exactly the intended
state and runs end-to-end through the test driver."""

import numpy as np
import jax
import jax.numpy as jnp

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.data.loader import DeviceCache
from stil_tta_tpu.tta import adapt
from stil_tta_tpu.tta.tent import bn_param_mask, entropy
from tests.helpers import IMG, tiny_cfg, tiny_data


def _setup(strategy):
    cfg = tiny_cfg("config_dvm_STiL", tta="true")
    cfg.tta_strategy = strategy
    cfg.tta_steps = 1
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src, _ = tiny_data(n_l=12)
    cache = DeviceCache(src).as_dict()
    state = algo.init_state(jax.random.key(0),
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            jnp.asarray(src.tabular[:2]))
    return cfg, algo, state, cache


def test_bn_adapt_changes_stats_not_params():
    cfg, algo, state, cache = _setup("bn_adapt")
    new_state = adapt(cfg, algo, state, cache)
    same_params = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params, new_state.params))
    assert same_params
    stats_changed = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.batch_stats, new_state.batch_stats))
    assert stats_changed


def test_tent_changes_only_bn_affine():
    cfg, algo, state, cache = _setup("tent")
    new_state = adapt(cfg, algo, state, cache)
    mask = bn_param_mask(state.params)
    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    changed_nonbn = []
    for (path, old), (_, new), (_, m) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree_util.tree_flatten_with_path(mask)[0]):
        equal = np.array_equal(np.asarray(old), np.asarray(new))
        if not m:
            assert equal, f"non-BN param changed: {path}"
        else:
            changed_nonbn.append(not equal)
    assert any(changed_nonbn), "no BN affine param changed"


def test_entropy_definition():
    p = jnp.asarray([[0.5, 0.5], [1.0, 0.0]])
    e = np.asarray(entropy(p))
    np.testing.assert_allclose(e[0], np.log(2), rtol=1e-5)
    np.testing.assert_allclose(e[1], 0.0, atol=1e-6)


def test_eata_changes_only_bn_affine_and_respects_margin():
    cfg, algo, state, cache = _setup("eata")
    # an untrained model predicts near-uniformly: entropy sits above the
    # paper's 0.4*ln(C) margin and cos-to-mean near 1, so the faithful
    # filters select nothing. Open them up to exercise the update path.
    cfg.tta_e_margin_scale = 2.0
    cfg.tta_d_margin = 2.0
    new_state = adapt(cfg, algo, state, cache)
    mask = bn_param_mask(state.params)
    changed_bn = []
    for (path, old), (_, new), (_, m) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree_util.tree_flatten_with_path(mask)[0]):
        equal = np.array_equal(np.asarray(old), np.asarray(new))
        if not m:
            assert equal, f"non-BN param changed: {path}"
        else:
            changed_bn.append(not equal)
    assert any(changed_bn), "no BN affine param changed"

    # a zero entropy margin selects no samples -> params untouched
    cfg.tta_e_margin_scale = 0.0
    frozen = adapt(cfg, algo, state, cache)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params, frozen.params))
    assert same, "eata updated params with an empty selection"


def test_eata_weight_is_detached_coefficient():
    """The EATA weight exp(E0−e) must not carry gradient: the per-sample
    objective's grad wrt the entropies is exactly the weights themselves.
    An undetached weight gives (1−ent)·exp(E0−ent), which flips sign for
    ent > 1 nat (anti-adaptation on high-entropy selected samples)."""
    from stil_tta_tpu.tta.methods import eata_sample_weights

    e_margin = 2.26  # 0.4 * ln(286), the DVM shape
    ent = jnp.asarray([0.5, 1.5, 2.0, 3.0], jnp.float32)  # last: unselected
    sel = ent < e_margin

    def objective(e):
        return jnp.sum(e * eata_sample_weights(e, e_margin, sel))

    g = jax.grad(objective)(ent)
    w = eata_sample_weights(ent, e_margin, sel)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)
    assert (np.asarray(g)[:3] > 0).all()  # descent always lowers entropy
    assert np.asarray(g)[3] == 0.0


def test_eata_fisher_anchor_shrinks_drift():
    cfg, algo, state, cache = _setup("eata")
    cfg.tta_e_margin_scale = 2.0
    cfg.tta_d_margin = 2.0
    cfg.tta_steps = 2
    free = adapt(cfg, algo, state, cache)
    cfg.tta_fisher_alpha = 1e6  # enormous anchor -> near-frozen params
    anchored = adapt(cfg, algo, state, cache)

    def drift(a, b):
        return float(sum(
            np.sum((np.asarray(x) - np.asarray(y)) ** 2)
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))))

    assert drift(anchored.params, state.params) < drift(free.params,
                                                        state.params)


def test_sar_changes_only_bn_affine():
    cfg, algo, state, cache = _setup("sar")
    cfg.tta_e_margin_scale = 2.0  # see the eata test: open the filter
    new_state = adapt(cfg, algo, state, cache)
    mask = bn_param_mask(state.params)
    changed_bn = []
    for (path, old), (_, new), (_, m) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree_util.tree_flatten_with_path(mask)[0]):
        equal = np.array_equal(np.asarray(old), np.asarray(new))
        if not m:
            assert equal, f"non-BN param changed: {path}"
        else:
            changed_bn.append(not equal)
    assert any(changed_bn), "no BN affine param changed"


def test_sar_reset_on_collapsed_entropy():
    # an enormous reset constant forces the recovery path every batch:
    # adaptation must return the source parameters untouched
    cfg, algo, state, cache = _setup("sar")
    cfg.tta_e_margin_scale = 2.0
    cfg.tta_reset_constant = 1e9
    new_state = adapt(cfg, algo, state, cache)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params, new_state.params))
    assert same, "sar did not reset to source params"


def test_unknown_strategy_raises():
    cfg, algo, state, cache = _setup("tentt")  # typo must not run Tent
    import pytest
    with pytest.raises(ValueError, match="tta_strategy"):
        adapt(cfg, algo, state, cache)


def test_tta_steps_zero_is_bn_adapt_only():
    """tta_steps: 0 under the tent strategy = BN re-estimation only
    (previously `0 or 1` silently ran one full tent epoch)."""
    cfg, algo, state, cache = _setup("tent")
    cfg.tta_steps = 0
    new_state = adapt(cfg, algo, state, cache)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params, new_state.params))
    assert same, "tta_steps=0 still updated params"


def test_bn_reestimation_ignores_pad_rows():
    """EpochSampler pads the final batch with weight-0 copies of its
    first row; the re-estimated BN statistics must be identical whether
    the cache fits one padded batch (n=12 @ batch 32) or exact batches
    (n=12 @ batch 12) - previously the 20 pad duplicates dominated the
    batch statistics."""
    from stil_tta_tpu.tta.tent import estimate_bn_stats
    cfg, algo, state, cache = _setup("bn_adapt")
    cfg.batch_size = 32  # n=12: one padded batch
    padded = estimate_bn_stats(cfg, algo, state, cache)
    cfg.batch_size = 12  # exact single batch, no padding
    exact = estimate_bn_stats(cfg, algo, state, cache)
    flat_p = jax.tree_util.tree_leaves(padded.batch_stats)
    flat_e = jax.tree_util.tree_leaves(exact.batch_stats)
    for a, b in zip(flat_p, flat_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
