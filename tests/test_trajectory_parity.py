"""Multi-step torch-twin TRAJECTORY parity for STiL (VERDICT r2 #3).

Extends the single-step golden test (``test_train_step_parity.py``) to a
10-step epoch with distribution alignment ON, the epoch-end prototype
normalisation (``STiLModel.py:408-415``), and 2 post-epoch steps against
the refreshed prototypes — the stateful interactions a single step
cannot see: DA queue fill (``:171-180``), prototype sum accumulation
across steps, EMAN teacher drift, BN running-stat evolution, and the
scheduler-free SGD parameter trajectory itself.

Both sides run in f64 (torch ``.double()``, jax ``jax_enable_x64``) so
reassociation noise cannot mask — or mimic — semantic drift. The only
sub-f64 paths left are our side's deliberate f32 casts inside
``sharpen``/mask bookkeeping; measured drift stays ~1e-6 relative, and
the asserted bounds (1e-4 early-step logs, 1e-3 final
state) would catch any real divergence (a wrong
queue index, a missed stop-gradient, one mis-scaled loss term moves the
trajectory by orders of magnitude more).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from stil_tta_tpu.algorithms.stil import STiL
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_full_model_parity import CATS, NCLS, NCON, PROJ, TSTiL
from tests.test_train_step_parity import (B_L, B_U, IMG, SEED,
                                          _build_cfg, _convert,
                                          torch_train_step)

N_STEPS = 10          # one "epoch"
N_POST = 2            # steps after epoch_end (refreshed prototypes)
TRAJ_LR = 1e-3        # stable multi-step trajectory (1-step test uses
                      # 1.0; 0.05 already diverges to ~1e33 by step 10
                      # on this random init — identically on both
                      # sides, but a diverged trajectory proves nothing)
DA_LEN = 256


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_stil_trajectory_parity_vs_torch(x64, monkeypatch):
    from stil_tta_tpu.models import backbones
    real_layer = backbones.MITransformerLayer

    def dropfree(**kw):
        kw.update(attn_drop=0.0, proj_drop=0.0, drop_path=0.0)
        return real_layer(**kw)

    monkeypatch.setattr(backbones, "MITransformerLayer", dropfree)

    torch.manual_seed(3)
    tm = TSTiL().double()
    torch.manual_seed(7)
    teacher = TSTiL().backbone.double()

    rng = np.random.RandomState(0)
    n_data = 64
    imgs = rng.randint(0, 256, (n_data, IMG, IMG, 3)).astype(np.float64)
    tabs = np.concatenate([
        np.stack([rng.randint(0, c, n_data) for c in CATS], 1),
        rng.randn(n_data, NCON)], 1).astype(np.float64)
    y = rng.randint(0, NCLS, n_data).astype(np.int64)
    prototypes = rng.randn(NCLS, PROJ).astype(np.float64)
    prototypes /= np.linalg.norm(prototypes, axis=1, keepdims=True)

    # ---- our side -----------------------------------------------------
    cfg = _build_cfg()
    cfg["DA"] = True
    cfg["lr_eval"] = TRAJ_LR
    algo = STiL(cfg, CATS + (1,) * NCON, dtype=jnp.float64)
    algo.tx = optax.sgd(TRAJ_LR)
    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(imgs[:2]), jnp.asarray(tabs[:2]))
    f64 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    variables = {"params": f64(state.params),
                 "batch_stats": f64(state.batch_stats)}
    converted, leftovers = convert_torch_state_dict(_convert(tm), variables)
    assert not leftovers, leftovers
    conv_teacher, _ = convert_torch_state_dict(
        _convert(tm, backbone=teacher), variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_teacher["params"]["backbone"],
        ema_batch_stats=conv_teacher["batch_stats"]["backbone"],
        prototypes=jnp.asarray(prototypes),
        prototypes_sum=jnp.zeros((NCLS, PROJ), jnp.float64),
        prototypes_count=jnp.zeros((NCLS, 1), jnp.float64),
        da=dataclasses.replace(
            state.da, queue=jnp.zeros((DA_LEN, NCLS), jnp.float64)),
        rng=jax.random.key(SEED))

    cache_l = {"images": jnp.asarray(imgs), "tabular": jnp.asarray(tabs),
               "labels": jnp.asarray(y),
               "labelled": jnp.ones((n_data,), bool)}
    cache_u = dict(cache_l)
    step = algo.make_train_step()

    # ---- torch twin state --------------------------------------------
    t_protos = torch.tensor(prototypes)
    t_da = {"queue": torch.zeros(DA_LEN, NCLS, dtype=torch.float64),
            "ptr": 0}
    acc_sum = torch.zeros(NCLS, PROJ, dtype=torch.float64)
    acc_cnt = torch.zeros(NCLS, 1, dtype=torch.float64)

    def replay_mask_rand(key):
        ks = jax.random.split(key, 4)
        return ks[0], np.asarray(
            jax.random.uniform(ks[3], (B_U,)) >= 0.5).astype(np.float64)

    idx_rs = np.random.RandomState(11)
    jkey = jax.random.key(SEED)
    prev_sums = {k: 0.0 for k in state.log_sums}

    def tol(step_no):
        """Tight for the first steps (any semantic bug — wrong term,
        missing stop-gradient, mis-ordered EMAN — shows as O(0.1-1)
        error immediately), geometric growth later: the trajectory is
        chaotic through DISCRETE routers (CGPL argmax cases), so once
        two teacher logits drift within ~1e-6 of a tie a case flips and
        the losses jump (~1e-4 observed at step 9). Bounded growth
        still catches systematic divergence."""
        rel = min(1e-4 * 3.0 ** max(0, step_no - 4), 3e-2)
        return rel, rel / 10.0

    def run_epoch(n_steps, epoch, state, jkey, t_protos, step0=0):
        nonlocal prev_sums
        for i in range(n_steps):
            idx_l = idx_rs.randint(0, n_data, B_L).astype(np.int32)
            idx_u = idx_rs.randint(0, n_data, B_U).astype(np.int32)
            state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                         jnp.asarray(idx_u),
                         jnp.asarray(epoch, jnp.int32))
            jkey, mask_rand = replay_mask_rand(jkey)

            timg = torch.tensor(
                np.concatenate([imgs[idx_l], imgs[idx_u]]).transpose(
                    0, 3, 1, 2) / 255.0)
            ttab = torch.tensor(np.concatenate([tabs[idx_l], tabs[idx_u]]))
            logs, ps, pc = torch_train_step(
                tm, teacher, timg, ttab, torch.tensor(y[idx_l]),
                t_protos, torch.tensor(mask_rand), epoch,
                start_epoch=0, lr=TRAJ_LR, da=t_da)
            acc_sum.add_(torch.tensor(ps))
            acc_cnt.add_(torch.tensor(pc))

            # per-step log parity (diff of our accumulating sums);
            # atol floor for losses that cross zero (the CLUB bound
            # reaches ~-5e-3 where relative error is meaningless)
            rtol_i, atol_i = tol(step0 + i)
            for k, v in logs.items():
                ours = float(state.log_sums[k]) - prev_sums[k]
                np.testing.assert_allclose(
                    ours, v, rtol=rtol_i, atol=atol_i,
                    err_msg=f"step {i} (epoch {epoch}) log {k}")
            prev_sums = {k: float(v) for k, v in state.log_sums.items()}
        return state, jkey

    state, jkey = run_epoch(N_STEPS, 1, state, jkey, t_protos)

    # DA queue: first N_STEPS slots filled identically, ptr advanced
    # (late slots carry the chaotic drift of the trajectory itself)
    np.testing.assert_allclose(np.asarray(state.da.queue),
                               t_da["queue"].numpy(), rtol=2e-3,
                               atol=1e-6)
    assert int(state.da.ptr) == t_da["ptr"] == N_STEPS

    # ---- epoch end: prototype normalisation (``STiLModel.py:408-415``)
    assert (np.asarray(state.prototypes_count) >= 1).all(), \
        "test setup must feed every class (reference asserts this)"
    np.testing.assert_allclose(np.asarray(state.prototypes_sum),
                               acc_sum.numpy(), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.prototypes_count),
                               acc_cnt.numpy(), rtol=0, atol=1e-9)
    state, epoch_logs = algo.epoch_end(state)
    prev_sums = {k: 0.0 for k in state.log_sums}  # epoch_end resets
    with torch.no_grad():
        assert (acc_cnt >= 1).all()
        t_protos = acc_sum / acc_cnt
        acc_sum.zero_()
        acc_cnt.zero_()
    np.testing.assert_allclose(np.asarray(state.prototypes),
                               t_protos.numpy(), rtol=2e-3, atol=1e-6)

    # ---- post-epoch steps against the refreshed prototypes ----------
    state, jkey = run_epoch(N_POST, 2, state, jkey, t_protos,
                            step0=N_STEPS)

    # ---- end-of-trajectory state parity ------------------------------
    def rel_l2_tree(a, b, bound, what):
        fa = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree_util.tree_leaves(a)])
        fb = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree_util.tree_leaves(b)])
        rel = np.linalg.norm(fa - fb) / max(np.linalg.norm(fb), 1e-12)
        assert rel < bound, (what, rel)

    conv_student, _ = convert_torch_state_dict(_convert(tm), variables)
    rel_l2_tree(state.params, conv_student["params"], 1e-3,
                "params after 12 steps")
    rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 1e-3,
                "BN running stats")
    conv_post, _ = convert_torch_state_dict(
        _convert(tm, backbone=teacher), variables)
    rel_l2_tree(state.ema_params, conv_post["params"]["backbone"], 1e-3,
                "EMAN teacher params")
    rel_l2_tree(state.ema_batch_stats,
                conv_post["batch_stats"]["backbone"], 1e-3,
                "EMAN teacher BN stats")
