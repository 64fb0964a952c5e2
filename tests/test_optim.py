"""Optimizer/scheduler semantics: torch-Adam parity, epoch schedules,
plateau behavior, frozen-encoder masking, multistep chunking."""

import numpy as np
import optax
import jax
import jax.numpy as jnp
import torch

from stil_tta_tpu.train.multistep import chunk_indices
from stil_tta_tpu.train.optim import (PlateauScheduler, build_optimizer,
                                      cosine_lr, encoder_freeze_fn,
                                      set_learning_rate, warmup_cosine_lr)


def test_adam_matches_torch_with_weight_decay():
    """torch.optim.Adam folds L2 into the gradient before the moment
    update (reference ``configure_optimizers``); our chain must match."""
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)
    lr, wd = 1e-2, 1e-2

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx = build_optimizer(lr, wd)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_schedules():
    # torch CosineAnnealingLR closed form
    for e in (0, 3, 10):
        expected = 0.5 * 1e-3 * (1 + np.cos(np.pi * e / 10))
        np.testing.assert_allclose(cosine_lr(1e-3, e, 10), expected,
                                   rtol=1e-6)
    assert warmup_cosine_lr(1e-3, 0, 5, 20) == 0.0
    assert warmup_cosine_lr(1e-3, 4, 5, 20) == 1e-3
    mid = warmup_cosine_lr(1e-3, 12, 5, 20)
    assert 0 < mid < 1e-3


def test_plateau_scheduler():
    p = PlateauScheduler(1e-3, patience=1, min_lr=1e-6, mode="max")
    assert p.step(0.5) == 1e-3
    assert p.step(0.4) == 1e-3       # one bad epoch tolerated
    assert p.step(0.4) == 1e-4       # dropped by factor 10
    assert p.step(0.9) == 1e-4       # improvement resets counter


def test_frozen_encoder_mask_and_updates():
    params = {"backbone": {"encoder_imaging": {"conv1": {"kernel":
                                                         jnp.ones(3)}},
                           "reduce": {"kernel": jnp.ones(3)}},
              "club_imaging": {"fc1": {"kernel": jnp.ones(3)}}}
    mask = encoder_freeze_fn(params)
    assert mask["backbone"]["encoder_imaging"]["conv1"]["kernel"] is True
    assert mask["backbone"]["reduce"]["kernel"] is False
    tx = build_optimizer(1e-2, freeze_fn=encoder_freeze_fn)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(
        updates["backbone"]["encoder_imaging"]["conv1"]["kernel"]).sum()) \
        == 0.0
    assert float(jnp.abs(
        updates["backbone"]["reduce"]["kernel"]).sum()) > 0.0


def test_set_learning_rate_strong_type():
    tx = build_optimizer(1e-3)
    state = tx.init({"w": jnp.ones(2)})
    set_learning_rate(state, 5e-4)
    lr = state.hyperparams["learning_rate"]
    assert lr.dtype == jnp.float32 and not getattr(lr, "weak_type", False)


def test_chunk_indices():
    pairs = [(np.full(2, i), np.full(3, i)) for i in range(7)]
    blocks, tail = chunk_indices(pairs, 3)
    assert len(blocks) == 2 and len(tail) == 1
    il, iu = blocks[0]
    assert il.shape == (3, 2) and iu.shape == (3, 3)
    assert (blocks[1][0][0] == 3).all()
