"""Determinism: identical seeds => bit-identical training trajectories
(the reference *intends* this via a misspelled cudnn flag, run.py:23;
JAX delivers it under explicit PRNG keys — SURVEY.md §5)."""

import jax
import numpy as np

from stil_tta_tpu.algorithms.registry import get_algorithm
from tests.helpers import run_two_steps, tiny_cfg, tiny_data


def test_stil_training_is_deterministic():
    cfg = tiny_cfg("config_dvm_STiL")
    src_l, src_u = tiny_data()

    def run():
        algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
        return run_two_steps(algo, src_l, src_u)

    s1, s2 = run(), run()
    for k in s1.log_sums:
        assert float(s1.log_sums[k]) == float(s2.log_sums[k]), k
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
