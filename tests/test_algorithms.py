"""Two fused train steps per algorithm on tiny shapes: state advances,
finite losses, buffers update (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from stil_tta_tpu.algorithms.registry import get_algorithm
from tests.helpers import run_two_steps, tiny_cfg, tiny_data


def _check(state):
    assert int(state.step) == 2
    for k, v in state.log_sums.items():
        assert np.isfinite(float(v)), f"non-finite log {k}"
    assert float(state.log_count) == 2.0


def test_stil_train_steps():
    cfg = tiny_cfg("config_dvm_STiL")
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)
    # prototype mass accumulated (labeled one-hots always pass th1)
    assert float(np.sum(np.asarray(state.prototypes_count))) > 0
    # EMA diverged from student after updates
    import jax
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                      - np.asarray(b, np.float32)).sum()),
            state.ema_params, state.params["backbone"]))
    assert diff > 0


def test_stil_epoch_end_prototype_normalisation():
    cfg = tiny_cfg("config_dvm_STiL")
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data(n_l=32, n_u=8)
    state = run_two_steps(algo, src_l, src_u, l_batch=16, u_batch=8)
    count = np.asarray(state.prototypes_count)
    if (count >= 1).all():
        state, logs = algo.epoch_end(state)
        assert np.asarray(state.prototypes_sum).sum() == 0
        assert "loss" in logs and "eval.train.acc" in logs
    else:
        with pytest.raises(AssertionError):
            algo.epoch_end(state)


@pytest.mark.parametrize("name,config", [
    ("SimMatch", "config_dvm_SimMatch"),
    ("FreeMatch", "config_dvm_FreeMatch"),
])
def test_imaging_match_algorithms(name, config):
    cfg = tiny_cfg(config)
    algo = get_algorithm(name)(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)


def test_simmatch_multimodal_bank_update():
    cfg = tiny_cfg("config_dvm_MultiSimMatch")
    algo = get_algorithm("SimMatch")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)
    # bank rows at touched indices must hold unit-norm teacher embeddings
    bank = np.asarray(state.extra["bank"])
    norms = np.linalg.norm(bank, axis=0)
    assert np.all(norms > 0.5)


def test_comatch_multimodal():
    cfg = tiny_cfg("config_dvm_MultiCoMatch")
    algo = get_algorithm("CoMatch")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)
    assert int(state.extra["hist_len"]) == 2


def test_freematch_threshold_state_moves():
    cfg = tiny_cfg("config_dvm_FreeMatch")
    algo = get_algorithm("FreeMatch")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    p = np.asarray(state.extra["p_model"])
    assert abs(p.sum() - 1.0) < 0.05  # stays ~ a distribution
    assert float(state.extra["time_p"]) != pytest.approx(1.0 / 4)


def test_mmatch():
    cfg = tiny_cfg("config_dvm_MMatch")
    algo = get_algorithm("MMatch")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)
    assert int(state.extra["ptr"]) == 16  # 2 steps x (2+6) enqueued


def test_cotrain():
    cfg = tiny_cfg("config_dvm_CoTrain")
    algo = get_algorithm("CoTrain_Pseudo")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)


def test_supervised_baseline():
    cfg = tiny_cfg("config_dvm_STiL")
    cfg.algorithm_name = "Supervised"
    algo = get_algorithm("Supervised")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    assert int(state.step) == 2
    assert np.isfinite(float(state.log_sums["loss"]))


def test_stil_saint_train_steps():
    cfg = tiny_cfg("config_dvm_STiL_SAINT")
    algo = get_algorithm("STiL_SAINT")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)


def test_cotrain_saint_train_steps():
    cfg = tiny_cfg("config_dvm_CoTrain_SAINT")
    algo = get_algorithm("CoTrain_Pseudo_SAINT")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)


def test_comatch_imaging():
    cfg = tiny_cfg("config_dvm_CoMatch")
    algo = get_algorithm("CoMatch")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)


def test_freematch_multimodal():
    cfg = tiny_cfg("config_dvm_MultiFreeMatch")
    algo = get_algorithm("FreeMatch")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    _check(state)


def test_stil_binary_tracks_train_auc():
    cfg = tiny_cfg("config_cardiac_STiL", target="CAD")
    cfg.num_classes = 2
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    import stil_tta_tpu.data.source as src_mod
    src_l = src_mod.synthetic_source(16, num_classes=2,
                                     field_lengths=cfg.field_lengths,
                                     image_size=40, seed=0)
    src_u = src_mod.synthetic_source(24, num_classes=2,
                                     field_lengths=cfg.field_lengths,
                                     image_size=40, labelled_frac=0,
                                     seed=1)
    state = run_two_steps(algo, src_l, src_u)
    assert state.auc_train is not None
    assert float(state.auc_train.pos.sum() + state.auc_train.neg.sum()) \
        == 4.0  # 2 steps x 2 labeled samples
    state, logs = None, None
