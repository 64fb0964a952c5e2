"""FreeMatch train-step golden parity vs an independent torch twin —
the EMA-scalar family (time_p / p_model / label_hist), completing the
per-family torch-twin coverage (STiL, SimMatch, CoMatch done).

Twin semantics from the reference:
``freematch_model.py:168-201`` (student on cat(x, u_s); EMAN state-dict
lerp AFTER the student's train-mode forward; eval-mode teacher on u_w
only; ``masking`` updates time_p/p_model/label_hist at m=0.999 and THEN
thresholds with the freshly-updated state ``:128-166``; hard one-hot
pseudo-labels; entropy loss guarded on mask.sum()>0),
``freematch_utils.py:17-45`` (self-adaptive fairness: masked-select
strong logits, bincount histogram, 1/inf->0 modulation) and
``FreeMatch.py:34-35,88-98`` (criterion_consistency is a plain
*unmasked* CrossEntropyLoss over all unlabeled samples — the mask feeds
only the fairness loss and logging; gate ``epoch <= start_epoch`` keeps
sup only).

Views are identity (augmentation bypassed on both sides); ResNet +
linear heads have no dropout, so both sides are deterministic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.freematch import FreeMatch
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_simmatch_step_parity import TSimMatchNet, _Cfg, _to_sd

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
LAMBDA_U, LAMBDA_E = 1.0, 0.5
MOMENTUM = 0.9
M_SELF = 0.999    # freematch_model.py:48
LR = 1.0          # SGD twin: the post-step param delta IS the gradient


def torch_entropy_loss(mask, logits_s, prob_model, label_hist):
    """Reference ``freematch_utils.entropy_loss`` re-derived."""
    sel = logits_s[mask.bool()]
    prob_s = sel.softmax(dim=-1)
    pred = prob_s.argmax(dim=-1)
    hist_s = torch.bincount(pred, minlength=logits_s.shape[1]).float()
    hist_s = hist_s / hist_s.sum()
    inv0 = lambda v: torch.where(torch.isinf(1 / v),
                                 torch.zeros_like(v), 1 / v)
    mod_prob = prob_model * inv0(label_hist)
    mod_prob = mod_prob / mod_prob.sum()
    mod_mean = prob_s.mean(dim=0) * inv0(hist_s)
    mod_mean = mod_mean / mod_mean.sum()
    return (mod_prob * torch.log(mod_mean + 1e-12)).sum()


def torch_freematch_step(tm, ema, img_x, img_u, y_l, time_p, p_model,
                         label_hist, lr=LR):
    """One reference FreeMatch training step + SGD(lr) update. Returns
    (logs, time_p, p_model, label_hist); mutates tm/ema in place."""
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=lr)

    # student on cat(x, u_s) — identity views: u_s = u_w = img_u
    logits_q, _ = tm(torch.cat([img_x, img_u]))
    logits_x, logits_us = logits_q[:B_L], logits_q[B_L:]

    with torch.no_grad():
        sd_s, sd_t = tm.state_dict(), ema.state_dict()
        for k in sd_t:
            if "num_batches_tracked" in k:
                sd_t[k].copy_(sd_s[k])
            else:
                sd_t[k].mul_(MOMENTUM).add_((1 - MOMENTUM) * sd_s[k])
        ema.eval()
        logits_uw, _ = ema(img_u)
        probs_uw = torch.softmax(logits_uw, dim=-1)
        max_probs, max_idx = probs_uw.max(dim=-1)

        # self.update(): EMA state FIRST, then threshold with it
        time_p = time_p * M_SELF + (1 - M_SELF) * max_probs.mean()
        p_model = p_model * M_SELF + (1 - M_SELF) * probs_uw.mean(dim=0)
        hist = torch.bincount(max_idx, minlength=NCLS).float()
        label_hist = label_hist * M_SELF + (1 - M_SELF) * hist / hist.sum()

        mod = p_model / p_model.max()
        mask = max_probs.ge(time_p * mod[max_idx]).float()
        pseudo_label = F.one_hot(max_idx, NCLS).float()

    if mask.sum() > 0:
        ent_loss = torch_entropy_loss(mask, logits_us, p_model, label_hist)
    else:
        ent_loss = torch.zeros(())
    sup_loss = F.cross_entropy(logits_x, y_l)
    # the consistency CE is UNMASKED (FreeMatch.py:93)
    unsup_loss = F.cross_entropy(logits_us, pseudo_label)
    loss = sup_loss + LAMBDA_U * unsup_loss + LAMBDA_E * ent_loss

    opt.zero_grad()
    loss.backward()
    opt.step()

    f = lambda t: float(t.detach())
    return ({"loss": f(loss), "loss_x": f(sup_loss),
             "loss_u": f(unsup_loss), "loss_e": f(ent_loss),
             "threshold1_ratio": float(mask.mean())},
            time_p, p_model, label_hist)


def test_freematch_train_step_golden_vs_torch():
    torch.manual_seed(7)
    tm = TSimMatchNet()
    torch.manual_seed(11)
    ema = TSimMatchNet()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(1)
    img_x = rng.rand(B_L, IMG, IMG, 3).astype(np.float32)
    y_l = rng.randint(0, NCLS, B_L).astype(np.int64)
    img_u = rng.rand(B_U, IMG, IMG, 3).astype(np.float32)
    # pre-warmed self-adaptive state so the threshold actually splits
    # the batch: the fresh teacher's max-probs span 0.26201-0.26326
    # (all argmax class 0), so a uniform p_model (mod ~= 1) with
    # time_p0 = 0.2627 puts the post-update cut at ~0.26270 — 8 below /
    # 4 above, with a >=8e-5 gap at the boundary (far above f32
    # cross-impl noise)
    time_p0 = np.float32(0.2627)
    p_model0 = np.full((NCLS,), 1.0 / NCLS, np.float32)
    label_hist0 = rng.dirichlet(np.ones(NCLS)).astype(np.float32)

    # ---- our side -----------------------------------------------------
    cfg = _Cfg(
        algorithm_name="FreeMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=16,
        lambda_u=LAMBDA_U, lambda_e=LAMBDA_E, start_epoch=0,
        ema_momentum=MOMENTUM, use_ema=True, eman=True,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = FreeMatch(cfg, [1], dtype=jnp.float32)
    ident = lambda k, im, apply_rate=1.0: im.astype(jnp.float32)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    algo.aug_strong = ident
    algo.tx = optax.sgd(LR)

    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(img_x[:2]),
                            jnp.zeros((2, 1), jnp.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    converted, leftovers = convert_torch_state_dict(_to_sd(tm), variables)
    assert not leftovers, leftovers
    conv_ema, _ = convert_torch_state_dict(_to_sd(ema), variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"p_model": jnp.asarray(p_model0),
               "label_hist": jnp.asarray(label_hist0),
               "time_p": jnp.asarray(time_p0)})

    cache_l = {"images": jnp.asarray(img_x),
               "tabular": jnp.zeros((B_L, 1), jnp.float32),
               "labels": jnp.asarray(y_l),
               "labelled": jnp.ones((B_L,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.zeros((B_U, 1), jnp.float32),
               "labels": jnp.zeros((B_U,), jnp.int32),
               "labelled": jnp.zeros((B_U,), bool)}
    step = algo.make_train_step()
    new_state = step(state, cache_l, cache_u,
                     jnp.arange(B_L, dtype=jnp.int32),
                     jnp.arange(B_U, dtype=jnp.int32),
                     jnp.asarray(1, jnp.int32))

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    logs, time_p_t, p_model_t, label_hist_t = torch_freematch_step(
        tm, ema, t(img_x.transpose(0, 3, 1, 2)),
        t(img_u.transpose(0, 3, 1, 2)), t(y_l),
        t(time_p0), t(p_model0), t(label_hist0))

    # the threshold must actually split the batch for the test to bite
    assert 0.0 < logs["threshold1_ratio"] < 1.0

    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    # self-adaptive EMA scalars
    np.testing.assert_allclose(float(new_state.extra["time_p"]),
                               float(time_p_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.extra["p_model"]),
                               p_model_t.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.extra["label_hist"]),
                               label_hist_t.numpy(), rtol=1e-4, atol=1e-6)

    # EMAN teacher (params + post-forward BN stats) and student stats
    conv_post, _ = convert_torch_state_dict(_to_sd(ema), variables)
    for ours_t, ref_t, tol in (
            (new_state.ema_params, conv_post["params"], 1e-4),
            (new_state.ema_batch_stats, conv_post["batch_stats"], 1e-3)):
        jax.tree_util.tree_map(
            lambda a, b, tol=tol: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=tol, atol=1e-5),
            ours_t, ref_t)
    conv_student, _ = convert_torch_state_dict(_to_sd(tm), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        new_state.batch_stats, conv_student["batch_stats"])

    # gradients via the SGD delta — whole-model relative L2
    ga = np.concatenate([
        np.asarray(n - o, np.float64).ravel() for n, o in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(converted["params"]))])
    gb = np.concatenate([
        np.asarray(n - o, np.float64).ravel() for n, o in zip(
            jax.tree_util.tree_leaves(conv_student["params"]),
            jax.tree_util.tree_leaves(converted["params"]))])
    rel = np.linalg.norm(ga - gb) / max(np.linalg.norm(gb), 1e-8)
    assert np.linalg.norm(gb) > 1e-3
    assert rel < 0.02, rel


def test_freematch_three_step_state_trajectory_vs_torch():
    """3-step state trajectory at lr=0: the self-adaptive EMA scalars
    (time_p / p_model / label_hist at m=0.999) compound across steps on
    fresh unlabeled batches, together with EMAN teacher compounding and
    BN running-stat accumulation — completing the cross-step threading
    trio (SimMatch bank, CoMatch rings, FreeMatch scalars)."""
    steps = 3
    torch.manual_seed(7)
    tm = TSimMatchNet()
    torch.manual_seed(11)
    ema = TSimMatchNet()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(41)
    img_x = rng.rand(steps * B_L, IMG, IMG, 3).astype(np.float32)
    y_l = rng.randint(0, NCLS, steps * B_L).astype(np.int64)
    img_u = rng.rand(steps * B_U, IMG, IMG, 3).astype(np.float32)
    time_p0 = np.float32(0.2627)
    p_model0 = np.full((NCLS,), 1.0 / NCLS, np.float32)
    label_hist0 = rng.dirichlet(np.ones(NCLS)).astype(np.float32)

    cfg = _Cfg(
        algorithm_name="FreeMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=16,
        lambda_u=LAMBDA_U, lambda_e=LAMBDA_E, start_epoch=0,
        ema_momentum=MOMENTUM, use_ema=True, eman=True,
        lr_eval=0.0, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = FreeMatch(cfg, [1], dtype=jnp.float32)
    ident = lambda k, im, apply_rate=1.0: im.astype(jnp.float32)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    algo.aug_strong = ident
    algo.tx = optax.sgd(0.0)

    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(img_x[:2]),
                            jnp.zeros((2, 1), jnp.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    converted, leftovers = convert_torch_state_dict(_to_sd(tm), variables)
    assert not leftovers, leftovers
    conv_ema, _ = convert_torch_state_dict(_to_sd(ema), variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"p_model": jnp.asarray(p_model0),
               "label_hist": jnp.asarray(label_hist0),
               "time_p": jnp.asarray(time_p0)})

    cache_l = {"images": jnp.asarray(img_x),
               "tabular": jnp.zeros((steps * B_L, 1), jnp.float32),
               "labels": jnp.asarray(y_l),
               "labelled": jnp.ones((steps * B_L,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.zeros((steps * B_U, 1), jnp.float32),
               "labels": jnp.zeros((steps * B_U,), jnp.int32),
               "labelled": jnp.zeros((steps * B_U,), bool)}
    step = algo.make_train_step()
    our_step_logs = []
    prev = {k: 0.0 for k in algo.LOG_KEYS}
    for s in range(steps):
        state = step(state, cache_l, cache_u,
                     jnp.arange(s * B_L, (s + 1) * B_L, dtype=jnp.int32),
                     jnp.arange(s * B_U, (s + 1) * B_U, dtype=jnp.int32),
                     jnp.asarray(1, jnp.int32))
        sums = {k: float(v) for k, v in state.log_sums.items()}
        our_step_logs.append({k: sums[k] - prev[k] for k in sums})
        prev = sums

    t = lambda a: torch.tensor(np.asarray(a))
    tp, pm, lh = t(time_p0), t(p_model0), t(label_hist0)
    for s in range(steps):
        logs, tp, pm, lh = torch_freematch_step(
            tm, ema,
            t(img_x[s * B_L:(s + 1) * B_L].transpose(0, 3, 1, 2)),
            t(img_u[s * B_U:(s + 1) * B_U].transpose(0, 3, 1, 2)),
            t(y_l[s * B_L:(s + 1) * B_L]), tp, pm, lh, lr=0.0)
        for k, v in logs.items():
            np.testing.assert_allclose(
                our_step_logs[s][k], v, rtol=2e-3, atol=2e-4,
                err_msg=f"step {s} log {k}")

    np.testing.assert_allclose(float(state.extra["time_p"]),
                               float(tp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.extra["p_model"]),
                               pm.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.extra["label_hist"]),
                               lh.numpy(), rtol=1e-4, atol=1e-6)

    conv_post, _ = convert_torch_state_dict(_to_sd(ema), variables)
    for ours_t, ref_t, tol in (
            (state.ema_params, conv_post["params"], 1e-4),
            (state.ema_batch_stats, conv_post["batch_stats"], 1e-3)):
        jax.tree_util.tree_map(
            lambda a, b, tol=tol: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=tol, atol=1e-5),
            ours_t, ref_t)
    conv_student, _ = convert_torch_state_dict(_to_sd(tm), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        state.batch_stats, conv_student["batch_stats"])
