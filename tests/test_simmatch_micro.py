"""Micro-batched SimMatch step (``micro_batches: m`` —
simmatch.py step_micro; OFF by default pending a SimMatch-recipe
convergence gate).

The documented divergences are ghost BN, the pre-step EMAN lerp, and
per-chunk DA alignment. What IS exact and tested here:

- identical state tree (structure/shapes/dtypes) to the single-batch
  step — checkpoints, resume, mesh sharding unchanged,
- step / log_count / metric counters advance once per FULL batch,
- the bank scatter commits the same ROWS (all labeled dataset
  indices, teacher embeddings in chunk order = batch order) and the
  bank labels are bit-equal to single-batch (labels don't depend on
  BN statistics),
- DA advances its pointer once per step and commits one slot equal to
  the mean of chunk means,
- parameters after one step agree with single-batch at update scale.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_cfg, tiny_data

# heaviest of the micro decomposability suites (two jitted step variants
# x two step counts) — slow tier; the fast tier keeps the lighter
# freematch/mmatch/cotrain micro files
pytestmark = pytest.mark.slow


def _run(micro, steps=2, da=False, collect=False):
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.data.loader import DeviceCache

    cfg = tiny_cfg("config_dvm_MultiSimMatch", micro_batches=micro,
                   start_epoch=0, **({"DA": True} if da else {}))
    src_l, src_u = tiny_data(16, 24)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    algo = get_algorithm("SimMatch")(cfg, src_l.field_lengths)
    st = algo.init_state(jax.random.key(0),
                         jnp.zeros((2,) + src_l.images.shape[1:]),
                         jnp.asarray(src_l.tabular[:2]))
    step = algo.make_train_step()
    rs = np.random.RandomState(0)
    epoch = jnp.asarray(1, jnp.int32)
    idxs = []
    for _ in range(steps):
        il = jnp.asarray(rs.randint(0, 16, (4,)), jnp.int32)
        iu = jnp.asarray(rs.randint(0, 24, (12,)), jnp.int32)
        idxs.append((il, iu))
        st = step(st, cache_l, cache_u, il, iu, epoch)
    if collect:
        return st, idxs, cache_l
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
    assert int(s2.acc_train_u.total) == int(s1.acc_train_u.total) == 24


def test_micro_bank_rows_and_labels():
    s1, idxs, cache_l = _run(1, collect=True)
    s2, _, _ = _run(2, collect=True)
    from stil_tta_tpu.data.loader import dataset_indices
    touched = np.unique(np.concatenate(
        [np.asarray(dataset_indices(cache_l, il)) for il, _ in idxs]))
    # labels are BN-independent -> bit-equal
    np.testing.assert_array_equal(np.asarray(s1.extra["bank_labels"]),
                                  np.asarray(s2.extra["bank_labels"]))
    # untouched bank columns keep their init values bit-for-bit
    k = s1.extra["bank"].shape[1]
    untouched = np.setdiff1d(np.arange(k), touched)
    np.testing.assert_array_equal(
        np.asarray(s1.extra["bank"][:, untouched]),
        np.asarray(s2.extra["bank"][:, untouched]))
    # touched columns hold unit-norm teacher embeddings in both modes
    for s in (s1, s2):
        norms = np.linalg.norm(np.asarray(s.extra["bank"][:, touched]),
                               axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_micro_params_match_single_batch_at_update_scale():
    s1, lr = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    # one optimizer application from a mean-of-chunks gradient: params
    # differ from single-batch by at most ~the Adam step scale
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        assert d <= 2.5 * lr, d


def test_micro_da_pointer_advances_once_per_step():
    s1, _ = _run(1, steps=2, da=True)
    s2, _ = _run(2, steps=2, da=True)
    assert int(s1.da.ptr) == int(s2.da.ptr) == 2
    # committed slots are probability vectors (mean of chunk means)
    for s in (s1, s2):
        q = np.asarray(s.da.queue[:2])
        np.testing.assert_allclose(q.sum(1), 1.0, atol=1e-4)
