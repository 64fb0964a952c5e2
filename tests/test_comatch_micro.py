"""Micro-batched CoMatch step (``micro_batches: m`` —
comatch.py step_micro; OFF by default pending a CoMatch-recipe
convergence gate).

Divergences: ghost BN on student AND the train-mode momentum encoder,
per-chunk pseudo-label/embedding graphs (chunked in-batch coupling),
per-chunk DA alignment. Exact and tested here:

- identical state tree to the single-batch step,
- counters advance once per FULL batch; the DA history ring commits
  ONE slot per step (a probability vector) and hist_len/ptr advance
  once,
- both queues advance their pointers by the full-batch row counts and
  hold unit-norm features where the strong queue was written,
- the momentum lerp is params-only from pre-step params, so
  ema_params are BIT-EQUAL to the single-batch step after step 1
  (before BN-stat-driven drift can differ),
- parameters after one step agree with single-batch at update scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_cfg, tiny_data

# heaviest of the micro decomposability suites (two jitted step variants
# x two step counts) — slow tier; the fast tier keeps the lighter
# freematch/mmatch/cotrain micro files
pytestmark = pytest.mark.slow


def _run(micro, steps=2):
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.data.loader import DeviceCache

    cfg = tiny_cfg("config_dvm_MultiCoMatch", micro_batches=micro,
                   start_epoch=0, K=32)
    src_l, src_u = tiny_data(16, 24)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    algo = get_algorithm("CoMatch")(cfg, src_l.field_lengths)
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


def test_micro_state_tree_counters_and_queues():
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
    # queue pointers advanced by full-batch row counts, both modes
    # (ptr_w wraps: 2 steps x (4+12) rows == K=32 -> 0)
    assert int(s1.extra["ptr_s"]) == int(s2.extra["ptr_s"]) == 24
    assert int(s1.extra["ptr_w"]) == int(s2.extra["ptr_w"]) == 0
    # DA ring: one slot per step
    assert int(s1.extra["hist_ptr"]) == int(s2.extra["hist_ptr"]) == 2
    assert int(s2.extra["hist_len"]) == 2
    for s in (s1, s2):
        q = np.asarray(s.extra["hist_prob"][:2])
        np.testing.assert_allclose(q.sum(1), 1.0, atol=1e-4)
    # written strong-queue columns hold unit-norm teacher embeddings
    for s in (s1, s2):
        norms = np.linalg.norm(np.asarray(s.extra["queue_s"][:, :24]),
                               axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_micro_ema_bit_equal_after_one_step():
    s1, _ = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params),
                    jax.tree_util.tree_leaves(s2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_micro_params_match_single_batch_at_update_scale():
    s1, lr = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        assert d <= 2.5 * lr, d
