"""SPMD correctness: the fused STiL step under an 8-device data-parallel
mesh produces the same result as the unsharded step (GSPMD inserts the
collectives; semantics must not change — SURVEY.md §2.7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.data.loader import DeviceCache
from stil_tta_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                        replicate)
from tests.helpers import IMG, tiny_cfg, tiny_data


def _max_abs_diff(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(
            np.asarray(x, np.float32) - np.asarray(y, np.float32)))),
        a, b)
    return max(jax.tree_util.tree_leaves(leaves))


def test_sharded_step_matches_unsharded():
    assert len(jax.devices()) >= 8
    cfg = tiny_cfg("config_dvm_STiL")
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data(n_l=16, n_u=32)

    def run(sharded: bool):
        cache_l = DeviceCache(src_l).as_dict()
        cache_u = DeviceCache(src_u).as_dict()
        state = algo.init_state(jax.random.key(0),
                                jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                                jnp.asarray(src_l.tabular[:2]))
        idx_l = jnp.arange(8, dtype=jnp.int32)
        idx_u = jnp.arange(16, dtype=jnp.int32)
        if sharded:
            mesh = create_mesh(8)
            bsh = batch_sharding(mesh)
            cache_l = replicate(mesh, cache_l)
            cache_u = replicate(mesh, cache_u)
            state = replicate(mesh, state)
            idx_l = jax.device_put(idx_l, bsh)
            idx_u = jax.device_put(idx_u, bsh)
        step = algo.make_train_step()
        return step(state, cache_l, cache_u, idx_l, idx_u,
                    jnp.asarray(1, jnp.int32))

    single = run(False)
    sharded = run(True)
    assert _max_abs_diff(single.params, sharded.params) < 5e-3
    assert _max_abs_diff(single.prototypes_sum,
                         sharded.prototypes_sum) < 5e-3
    for k in single.log_sums:
        np.testing.assert_allclose(float(single.log_sums[k]),
                                   float(sharded.log_sums[k]),
                                   rtol=2e-2, atol=2e-3)


def test_multislice_hybrid_mesh_matches_unsharded():
    """Multi-slice DP: batch sharded over BOTH mesh axes (DCN outer,
    ICI inner) — same numbers as a single device."""
    from stil_tta_tpu.parallel.mesh import (create_hybrid_mesh,
                                            hierarchical_batch_sharding)

    assert len(jax.devices()) >= 8
    cfg = tiny_cfg("config_dvm_STiL")
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src_l, src_u = tiny_data(n_l=16, n_u=32)

    def run(hybrid: bool):
        cache_l = DeviceCache(src_l).as_dict()
        cache_u = DeviceCache(src_u).as_dict()
        state = algo.init_state(jax.random.key(0),
                                jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                                jnp.asarray(src_l.tabular[:2]))
        idx_l = jnp.arange(8, dtype=jnp.int32)
        idx_u = jnp.arange(16, dtype=jnp.int32)
        if hybrid:
            mesh = create_hybrid_mesh(ici_size=4, dcn_size=2)
            assert mesh.devices.shape == (2, 4)
            bsh = hierarchical_batch_sharding(mesh)
            cache_l = replicate(mesh, cache_l)
            cache_u = replicate(mesh, cache_u)
            state = replicate(mesh, state)
            idx_l = jax.device_put(idx_l, bsh)
            idx_u = jax.device_put(idx_u, bsh)
        step = algo.make_train_step()
        return step(state, cache_l, cache_u, idx_l, idx_u,
                    jnp.asarray(1, jnp.int32))

    single = run(False)
    hybrid = run(True)
    assert _max_abs_diff(single.params, hybrid.params) < 5e-3
    for k in single.log_sums:
        np.testing.assert_allclose(float(single.log_sums[k]),
                                   float(hybrid.log_sums[k]),
                                   rtol=2e-2, atol=2e-3)


def test_saint_intersample_global_under_sharding():
    """SAINT's 'colrow' intersample (row) attention attends over the
    batch axis. Under GSPMD batch sharding the batch is a *logical*
    axis, so the sharded forward must equal the single-device forward —
    i.e. intersample attention is GLOBAL over the batch, not per-shard
    (pins the models/saint.py docstring and PARITY.md claim; the
    reference under DDP would attend per-rank only,
    ``model_util.py:113-121``)."""
    from stil_tta_tpu.models.saint import SAINTEncoder

    assert len(jax.devices()) >= 8
    cats = [4, 3]
    enc = SAINTEncoder(cat_lengths=cats, num_continuous=3, token_dim=16,
                       out_dim=32, depth=1, heads=2,
                       attentiontype="colrow", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    b = 16
    x = np.concatenate([
        np.stack([rng.randint(0, c, b) for c in cats], 1),
        rng.randn(b, 3)], 1).astype(np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(x[:2]))

    single = enc.apply(variables, jnp.asarray(x))

    mesh = create_mesh(8)
    bsh = batch_sharding(mesh)
    xs = jax.device_put(jnp.asarray(x), bsh)
    vs = replicate(mesh, variables)
    sharded = jax.jit(enc.apply)(vs, xs)

    # global semantics: identical tokens for every row; a per-shard
    # intersample attention would mix only 2 rows per device and differ
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-5, atol=2e-5)

    # sanity: intersample attention really mixes across rows (changing
    # one OTHER row changes row 0's tokens) — otherwise "global vs
    # per-shard" would be vacuous
    x2 = x.copy()
    x2[7, len(cats):] += 3.0
    single2 = enc.apply(variables, jnp.asarray(x2))
    assert float(np.abs(np.asarray(single2[0]) -
                        np.asarray(single[0])).max()) > 1e-6
