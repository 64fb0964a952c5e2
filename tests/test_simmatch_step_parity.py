"""SimMatch train-step golden parity vs an independent torch twin
(VERDICT r2 #3: a 1-step twin for a queue/bank algorithm — the
likeliest silent-divergence site).

Twin semantics from the reference:
``simmatch_model.py:226-292`` (student on cat(x, u_s); EMAN state-dict
lerp AFTER the student's train-mode forward, i.e. post-forward BN
running stats; eval-mode teacher on cat(x, u_w); semantic/instance
pseudo-labels; bank scatter at dataset indices ``:140-147``) and
``SimMatch.py:86-97`` (masked soft CE + instance loss, start_unlabel
gating).

Views are identity (augmentation bypassed on both sides) so the only
stochastic element left — student dropout — is absent from both models
(ResNet + linear heads have none).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.simmatch import SimMatch
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_convert_parity import TResNet18

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
DIM = 16          # projection dim
K = 10            # bank size (= len(labeled set))
TT, ST = 0.1, 0.1
C_SMOOTH = 0.9
THRESHOLD = 0.3
LAMBDA_U, LAMBDA_IN = 1.0, 0.5
MOMENTUM = 0.9
LR = 1.0          # SGD twin: the post-step param delta IS the gradient


class TSimMatchNet(nn.Module):
    """Reference ``ResNet`` wrapper (``simmatch_model.py:14-37``):
    backbone + linear classifier + 2-layer projection head, returning
    (logits, normalized embedding)."""

    def __init__(self):
        super().__init__()
        self.backbone = TResNet18()
        self.classifier = nn.Linear(512, NCLS)
        self.head = nn.Sequential(nn.Linear(512, 512),
                                  nn.ReLU(inplace=True),
                                  nn.Linear(512, DIM))

    def forward(self, x):
        x = self.backbone(x)
        return self.classifier(x), F.normalize(self.head(x))


def _to_sd(net):
    """Torch state dict in the reference's native imaging-net layout
    (``backbone.*`` / ``classifier.*`` / ``head.{0,2}.*`` —
    ``simmatch_model.py:20-30``); the converter maps it onto our
    ImagingNet tree (auto-named ``ResNet_0``, MLPHead fc1/fc2)."""
    return {k: v.numpy() for k, v in net.state_dict().items()}


class _Cfg(dict):
    __getattr__ = dict.get


def torch_simmatch_step(tm, ema, img_x, img_u, y_l, idx_l, bank,
                        bank_labels, lr=LR):
    """One reference SimMatch training step + SGD(lr) update. Returns
    (logs, new bank, new bank_labels); mutates tm/ema in place."""
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=lr)

    # student on cat(x, u_s) — identity views: u_s = u_w = img_u
    logits_q, feat_q = tm(torch.cat([img_x, img_u]))
    logits_qx, logits_qu = logits_q[:B_L], logits_q[B_L:]
    feat_qu = feat_q[B_L:]

    with torch.no_grad():
        # EMAN state-dict lerp from POST-forward student state
        sd_s, sd_t = tm.state_dict(), ema.state_dict()
        for k in sd_t:
            if "num_batches_tracked" in k:
                sd_t[k].copy_(sd_s[k])
            else:
                sd_t[k].mul_(MOMENTUM).add_((1 - MOMENTUM) * sd_s[k])
        ema.eval()
        logits_k, feat_k = ema(torch.cat([img_x, img_u]))
        feat_kx, feat_ku = feat_k[:B_L], feat_k[B_L:]
        prob_ku_orig = torch.softmax(logits_k[B_L:], dim=1)

        # semantic/instance teacher distributions (:268-282)
        teacher_logits = feat_ku @ bank
        teacher_prob_orig = torch.softmax(teacher_logits / TT, dim=1)
        lbl = bank_labels.unsqueeze(0).expand([B_U, -1])
        factor = prob_ku_orig.gather(1, lbl)
        teacher_prob = teacher_prob_orig * factor
        teacher_prob = teacher_prob / teacher_prob.sum(1, keepdim=True)
        aggregated = torch.zeros(B_U, NCLS).scatter_add(
            1, lbl, teacher_prob_orig)
        prob_ku = C_SMOOTH * prob_ku_orig + (1 - C_SMOOTH) * aggregated
        mask = prob_ku.max(1).values.ge(THRESHOLD).float()

    loss_x = F.cross_entropy(logits_qx, y_l)
    loss_u = (torch.sum(-F.log_softmax(logits_qu, dim=1)
                        * prob_ku.detach(), dim=1) * mask).mean()
    student_prob = torch.softmax((feat_qu @ bank) / ST, dim=1)
    loss_in = torch.sum(-teacher_prob.detach()
                        * torch.log(student_prob + 1e-12), dim=1).mean()
    loss = loss_x + LAMBDA_U * loss_u + LAMBDA_IN * loss_in

    opt.zero_grad()
    loss.backward()
    opt.step()

    with torch.no_grad():
        bank = bank.clone()
        bank_labels = bank_labels.clone()
        bank[:, idx_l] = feat_kx.T
        bank_labels[idx_l] = y_l

    f = lambda t: float(t.detach())
    return ({"loss": f(loss), "loss_x": f(loss_x), "loss_u": f(loss_u),
             "loss_in": f(loss_in),
             "threshold1_ratio": float(mask.mean())},
            bank, bank_labels)


def test_simmatch_train_step_golden_vs_torch():
    torch.manual_seed(5)
    tm = TSimMatchNet()
    torch.manual_seed(9)
    ema = TSimMatchNet()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(0)
    # the labeled cache holds the FULL labeled set (K rows — the bank
    # has one slot per labeled sample); idx_l are dataset indices
    imgs_l = rng.rand(K, IMG, IMG, 3).astype(np.float32)
    ys_l = rng.randint(0, NCLS, K).astype(np.int64)
    img_u = rng.rand(B_U, IMG, IMG, 3).astype(np.float32)
    idx_l = rng.choice(K, B_L, replace=False).astype(np.int64)
    img_x = imgs_l[idx_l]
    y_l = ys_l[idx_l]
    bank0 = rng.randn(DIM, K).astype(np.float32)
    bank0 /= np.linalg.norm(bank0, axis=0, keepdims=True)
    bank_labels0 = rng.randint(0, NCLS, K).astype(np.int64)

    # ---- our side -----------------------------------------------------
    cfg = _Cfg(
        algorithm_name="SimMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM, K=K,
        sim_threshold=THRESHOLD, lambda_u=LAMBDA_U, lambda_in=LAMBDA_IN,
        tt=TT, st=ST, c_smooth=C_SMOOTH, start_epoch=0,
        ema_momentum=MOMENTUM, DA=False, use_ema=True, eman=True,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = SimMatch(cfg, [1], dtype=jnp.float32)
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
        extra={"bank": jnp.asarray(bank0),
               "bank_labels": jnp.asarray(bank_labels0, jnp.int32)})

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.zeros((K, 1), jnp.float32),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((K,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.zeros((B_U, 1), jnp.float32),
               "labels": jnp.zeros((B_U,), jnp.int32),
               "labelled": jnp.zeros((B_U,), bool)}
    step = algo.make_train_step()
    new_state = step(state, cache_l, cache_u,
                     jnp.asarray(idx_l, jnp.int32),
                     jnp.arange(B_U, dtype=jnp.int32),
                     jnp.asarray(1, jnp.int32))

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    logs, bank_t, bank_labels_t = torch_simmatch_step(
        tm, ema, t(img_x.transpose(0, 3, 1, 2)),
        t(img_u.transpose(0, 3, 1, 2)), t(y_l), t(idx_l),
        t(bank0), t(bank_labels0))

    # losses / mask ratio
    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    # instance bank scatter (teacher embeddings at dataset indices)
    np.testing.assert_allclose(np.asarray(new_state.extra["bank"]),
                               bank_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(new_state.extra["bank_labels"]),
        bank_labels_t.numpy())

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

    # gradients via the SGD delta — whole-model relative L2 (same
    # yardstick + rationale as test_train_step_parity)
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


def test_simmatch_three_step_state_trajectory_vs_torch():
    """3-step state-machine trajectory vs the torch twin at lr=0:
    params frozen, isolating exactly the cross-step threading — the
    instance-bank scatter at (different) dataset indices each step,
    bank-label overwrites, the EMAN lerp compounding (params + BN
    stats), and the student's BN running-stat accumulation. The 1-step
    test above covers losses/gradients."""
    steps = 3
    torch.manual_seed(5)
    tm = TSimMatchNet()
    torch.manual_seed(9)
    ema = TSimMatchNet()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(33)
    imgs_l = rng.rand(K, IMG, IMG, 3).astype(np.float32)
    ys_l = rng.randint(0, NCLS, K).astype(np.int64)
    img_u = rng.rand(steps * B_U, IMG, IMG, 3).astype(np.float32)
    idx_steps = [rng.choice(K, B_L, replace=False).astype(np.int64)
                 for _ in range(steps)]
    bank0 = rng.randn(DIM, K).astype(np.float32)
    bank0 /= np.linalg.norm(bank0, axis=0, keepdims=True)
    bank_labels0 = rng.randint(0, NCLS, K).astype(np.int64)

    # ---- our side -----------------------------------------------------
    cfg = _Cfg(
        algorithm_name="SimMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM, K=K,
        sim_threshold=THRESHOLD, lambda_u=LAMBDA_U, lambda_in=LAMBDA_IN,
        tt=TT, st=ST, c_smooth=C_SMOOTH, start_epoch=0,
        ema_momentum=MOMENTUM, DA=False, use_ema=True, eman=True,
        lr_eval=0.0, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = SimMatch(cfg, [1], dtype=jnp.float32)
    ident = lambda k, im, apply_rate=1.0: im.astype(jnp.float32)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    algo.aug_strong = ident
    algo.tx = optax.sgd(0.0)

    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(imgs_l[:2]),
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
        extra={"bank": jnp.asarray(bank0),
               "bank_labels": jnp.asarray(bank_labels0, jnp.int32)})

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.zeros((K, 1), jnp.float32),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((K,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.zeros((steps * B_U, 1), jnp.float32),
               "labels": jnp.zeros((steps * B_U,), jnp.int32),
               "labelled": jnp.zeros((steps * B_U,), bool)}
    step = algo.make_train_step()
    our_step_logs = []
    prev = {k: 0.0 for k in algo.LOG_KEYS}
    for s in range(steps):
        state = step(state, cache_l, cache_u,
                     jnp.asarray(idx_steps[s], jnp.int32),
                     jnp.arange(s * B_U, (s + 1) * B_U, dtype=jnp.int32),
                     jnp.asarray(1, jnp.int32))
        sums = {k: float(v) for k, v in state.log_sums.items()}
        our_step_logs.append({k: sums[k] - prev[k] for k in sums})
        prev = sums

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    bank_t, bank_labels_t = t(bank0), t(bank_labels0)
    for s in range(steps):
        logs, bank_t, bank_labels_t = torch_simmatch_step(
            tm, ema, t(imgs_l[idx_steps[s]].transpose(0, 3, 1, 2)),
            t(img_u[s * B_U:(s + 1) * B_U].transpose(0, 3, 1, 2)),
            t(ys_l[idx_steps[s]]), t(idx_steps[s]),
            bank_t, bank_labels_t, lr=0.0)
        for k, v in logs.items():
            np.testing.assert_allclose(
                our_step_logs[s][k], v, rtol=2e-3, atol=2e-4,
                err_msg=f"step {s} log {k}")

    # bank contents + labels after 3 scatters at distinct index sets
    np.testing.assert_allclose(np.asarray(state.extra["bank"]),
                               bank_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(state.extra["bank_labels"]), bank_labels_t.numpy())

    # EMAN teacher after 3 compounding lerps; student BN stats after 3
    # train-mode forwards
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
