"""Micro-batched Co-Training step (cotrain.py step_micro; OFF by
default pending its convergence gate). No banks/DA — only ghost BN and
the pre-step EMAN lerp diverge; everything else is per-sample."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_cfg, tiny_data


def _run(micro, steps=2, algo_name="CoTrain_Pseudo",
         config="config_dvm_CoTrain"):
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.data.loader import DeviceCache

    cfg = tiny_cfg(config, micro_batches=micro, start_epoch=0)
    src_l, src_u = tiny_data(16, 24)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    algo = get_algorithm(algo_name)(cfg, src_l.field_lengths)
    st = algo.init_state(jax.random.key(0),
                         jnp.zeros((2,) + src_l.images.shape[1:]),
                         jnp.asarray(src_l.tabular[:2]))
    step = algo.make_train_step()
    rs = np.random.RandomState(0)
    epoch = jnp.asarray(1, jnp.int32)
    for _ in range(steps):
        il = jnp.asarray(rs.randint(0, 16, (4,)), jnp.int32)
        iu = jnp.asarray(rs.randint(0, 24, (12,)), jnp.int32)
        st = step(st, cache_l, cache_u, il, iu, epoch)
    return st, float(cfg.lr_eval)


def test_micro_state_tree_and_counters():
    s1, _ = _run(1)
    s2, _ = _run(2)
    assert (jax.tree_util.tree_structure(s1)
            == jax.tree_util.tree_structure(s2))
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        assert jnp.shape(a) == jnp.shape(b)
        assert jnp.asarray(a).dtype == jnp.asarray(b).dtype
    assert int(s2.step) == 2
    assert float(s2.log_count) == 2.0
    assert int(s2.acc_train.total) == int(s1.acc_train.total) == 8


def test_micro_params_match_single_batch_at_update_scale():
    s1, lr = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        assert d <= 2.5 * lr, d


def test_micro_saint_variant_runs():
    st, _ = _run(2, steps=1, algo_name="CoTrain_Pseudo_SAINT",
                 config="config_dvm_CoTrain_SAINT")
    assert int(st.step) == 1
    for v in st.log_sums.values():
        assert bool(jnp.isfinite(v))
