"""Tabular-only evaluation path (working version of the reference's
broken eval_datatype=tabular mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.algorithms.registry import get_algorithm
from tests.helpers import run_two_steps, tiny_cfg, tiny_data


def test_tabular_eval_trains_and_evals():
    cfg = tiny_cfg("config_dvm_STiL")
    cfg.algorithm_name = "TabularEval"
    cfg.eval_datatype = "tabular"
    algo = get_algorithm("TabularEval")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data()
    state = run_two_steps(algo, src_l, src_u)
    assert int(state.step) == 2
    assert np.isfinite(float(state.log_sums["loss"]))

    from stil_tta_tpu.data.loader import DeviceCache
    cache = DeviceCache(src_l).as_dict()
    eval_step = algo.make_eval_step()
    out = eval_step(state.params, state.batch_stats, cache,
                    jnp.arange(4, dtype=jnp.int32))
    assert out["prob_m"].shape == (4, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(out["prob_m"]).sum(1), 1.0,
                               rtol=1e-4)
