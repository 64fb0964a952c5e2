"""Micro-batched MMatch step (``micro_batches: m`` —
mmatch.py step_micro; OFF by default pending its convergence gate).

MMatch has no EMA, so the only divergences are ghost BN and per-chunk
DA. Exact and tested here: state-tree identity, per-step counters, the
640-bank enqueue (identical full-batch rows in monolithic order —
labeled one-hot prob rows are BN-independent and bit-equal), DA
pointer/slot, and update-scale parameter agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_cfg, tiny_data


def _run(micro, steps=2):
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.data.loader import DeviceCache

    cfg = tiny_cfg("config_dvm_MMatch", micro_batches=micro,
                   start_epoch=0)
    src_l, src_u = tiny_data(16, 24)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    algo = get_algorithm("MMatch")(cfg, src_l.field_lengths)
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


def test_micro_state_tree_counters_bank_and_da():
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
    # bank pointer advanced by full-batch rows both modes
    assert int(s1.extra["ptr"]) == int(s2.extra["ptr"]) == 32
    # the labeled prob-queue rows are one-hot labels (BN-independent):
    # both modes wrote identical rows at identical slots. Row layout:
    # [labeled(4), unlabeled(12)] per step.
    pq1 = np.asarray(s1.extra["probs_queue"])
    pq2 = np.asarray(s2.extra["probs_queue"])
    for step_i in range(2):
        sl = slice(step_i * 16, step_i * 16 + 4)
        np.testing.assert_array_equal(pq1[:, sl], pq2[:, sl])
        assert (pq1[:, sl].sum(0) == 1.0).all()
    # written embed columns are unit-norm in both modes
    for s in (s1, s2):
        norms = np.linalg.norm(np.asarray(s.extra["embed_queue"][:, :32]),
                               axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # DA: one slot per step, probability vectors
    assert int(s1.da.ptr) == int(s2.da.ptr) == 2
    for s in (s1, s2):
        q = np.asarray(s.da.queue[:2])
        np.testing.assert_allclose(q.sum(1), 1.0, atol=1e-4)


def test_micro_params_match_single_batch_at_update_scale():
    s1, lr = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        assert d <= 2.5 * lr, d
