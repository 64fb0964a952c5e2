"""Sharded-vs-unsharded equivalence for every algorithm family with
cross-replica mutable state (VERDICT round-2 #2).

The reference's DDP semantics for these buffers are all-gather +
identical replicated update (``simmatch_model.py:140-147``,
``comatch_model.py:116-146,270-284``, ``freematch_model.py:127-143``,
``MMatch.py:101-117``); under GSPMD the same update runs on a logical
global batch, so after N steps on an 8-device mesh every queue, bank,
ring pointer and EMA scalar must equal the single-device run exactly
(ints) or to float tolerance. A per-shard index or pointer would
diverge immediately — this is the silent-divergence site the round-2
verdict flagged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.data.loader import DeviceCache
from stil_tta_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                        replicate)
from tests.helpers import IMG, tiny_cfg, tiny_data

N_STEPS = 2  # >1: ring pointers/banks must advance identically
L_BATCH, U_BATCH = 8, 16


def _run(algo, src_l, src_u, sharded: bool):
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    state = algo.init_state(jax.random.key(0),
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            jnp.asarray(src_l.tabular[:2]))
    if sharded:
        mesh = create_mesh(8)
        bsh = batch_sharding(mesh)
        cache_l = replicate(mesh, cache_l)
        cache_u = replicate(mesh, cache_u)
        state = replicate(mesh, state)
        put = lambda a: jax.device_put(a, bsh)
    else:
        put = lambda a: a
    step = algo.make_train_step()
    rs = np.random.RandomState(3)
    for i in range(N_STEPS):
        idx_l = put(jnp.asarray(rs.randint(0, len(src_l), L_BATCH),
                                jnp.int32))
        idx_u = put(jnp.asarray(rs.randint(0, len(src_u), U_BATCH),
                                jnp.int32))
        state = step(state, cache_l, cache_u, idx_l, idx_u,
                     jnp.asarray(i + 1, jnp.int32))
    return state


def _assert_state_equal(single, sharded):
    # params: float tolerance (collective reduction order)
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(single.params),
            jax.tree_util.tree_leaves(sharded.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-3, atol=5e-3, err_msg=f"params{jax.tree_util.keystr(path)}")
    # cross-replica buffers: ints EXACT (ring pointers, bank labels,
    # histogram fill — a per-shard pointer/index diverges immediately
    # and unboundedly); floats bounded by bf16 reassociation noise
    # (the nets run bf16; GSPMD changes reduce orders — measured up to
    # ~3e-3 abs on bank embeddings). The failure mode under test —
    # a shard-local buffer update — writes embeddings of DIFFERENT
    # samples, i.e. O(0.1-1) differences, far above this bound.
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(single.extra),
            jax.tree_util.tree_leaves(sharded.extra)):
        a, b = np.asarray(a), np.asarray(b)
        name = f"extra{jax.tree_util.keystr(path)}"
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2,
                                       err_msg=name)


CASES = [
    # (algorithm, config, the cross-replica state that must have MOVED
    # — ring pointers are asserted exactly in _assert_state_equal but
    # excluded here: with the tiny K=16 queues they wrap to exactly 0)
    ("SimMatch", "config_dvm_MultiSimMatch",
     ["bank", "bank_labels"]),          # scatter bank at dataset indices
    ("CoMatch", "config_dvm_MultiCoMatch",
     ["queue_s", "queue_w", "hist_prob"]),  # 2 ring queues + DA history
    ("FreeMatch", "config_dvm_FreeMatch",
     ["time_p", "p_model", "label_hist"]),  # EMA scalars
    ("MMatch", "config_dvm_MMatch",
     ["embed_queue", "probs_queue"]),   # deep bank (MMatch.py:57-62)
    ("CoTrain_Pseudo", "config_dvm_CoTrain", []),
]


@pytest.mark.parametrize("name,config,watched", CASES,
                         ids=[c[0] for c in CASES])
def test_sharded_matches_unsharded(name, config, watched):
    assert len(jax.devices()) >= 8
    cfg = tiny_cfg(config)
    # f32: under bf16 the GSPMD-reordered batch reductions shift BN
    # stats by ~bf16 eps, which amplifies to 5-10% on queue embeddings
    # through the network — swamping the per-shard-divergence signal.
    # f32 keeps reassociation noise ~1e-4 while a shard-local update
    # (wrong samples in the queue) stays O(1).
    algo = get_algorithm(name)(cfg, cfg.field_lengths,
                               dtype=jnp.float32)
    src_l, src_u = tiny_data(n_l=16, n_u=32)

    single = _run(algo, src_l, src_u, sharded=False)
    sharded = _run(algo, src_l, src_u, sharded=True)

    # the watched buffers actually moved (otherwise equality is vacuous)
    init = algo.init_state(jax.random.key(0),
                           jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                           jnp.asarray(src_l.tabular[:2]))
    for key in watched:
        assert key in single.extra, (name, key)
        moved = float(np.max(np.abs(
            np.asarray(single.extra[key], np.float32)
            - np.asarray(init.extra[key], np.float32))))
        assert moved > 0, f"{name}.{key} never updated"

    _assert_state_equal(single, sharded)
