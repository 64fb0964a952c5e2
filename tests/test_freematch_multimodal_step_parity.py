"""Multimodal FreeMatch train-step golden parity vs a torch twin —
covers the MatchModel ``MultimodalBackbone`` (single-head concat fusion
with projection head, ``multimodal_backbone.py:37-124``) inside a full
train step; the imaging variant and the FreeMatch state machine are
twinned in test_freematch_step_parity, and the 3-head SemiMultimodal
backbone in the MMatch/CoTrain twins — this closes the remaining
backbone x step cell.

Reference forward (``freematch_model.py:168-188`` multimodal branch):
student on tuple-cat (im, tab) of labeled + strong views; EMAN
state-dict lerp after the student forward; eval-mode teacher on the
weak view only. Views are identity (augmentation and tabular
corruption at rate 0), dropout rates 0 — deterministic on both sides.
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
from tests.test_convert_parity import TResNet18
from tests.test_full_model_parity import CATS, DIM, NCON, TTabEnc
from tests.test_freematch_step_parity import (M_SELF,
                                              torch_entropy_loss)
from tests.test_simmatch_step_parity import _Cfg

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
PROJ = 16
LAMBDA_U, LAMBDA_E = 1.0, 0.5
MOMENTUM = 0.9
LR = 1.0


class TMatchMMBackbone(nn.Module):
    """Reference MatchModel ``MultimodalBackbone``: concat fusion,
    2-layer projection head, single classifier on the concat;
    tabular_proj is Identity (tabular dim == multimodal dim)."""

    def __init__(self):
        super().__init__()
        self.encoder_imaging = TResNet18()
        self.encoder_tabular = TTabEnc()
        self.image_proj = nn.Linear(512, DIM)
        self.head = nn.Sequential(nn.Linear(DIM * 2, DIM),
                                  nn.ReLU(inplace=True),
                                  nn.Linear(DIM, PROJ))
        self.classifier_multimodal = nn.Linear(DIM * 2, NCLS)

    def forward(self, img, tab):
        x_i = self.encoder_imaging(img)
        x_t = self.encoder_tabular(tab)
        x_m = torch.cat([self.image_proj(x_i), x_t[:, 0, :]], dim=1)
        return (self.classifier_multimodal(x_m),
                F.normalize(self.head(x_m)))


def _to_sd(net):
    """Reference-native multimodal layout: all attrs under ``model.``,
    head as a plain Sequential (``multimodal_backbone.py:56-60``)."""
    return {"model." + k: v.numpy() for k, v in net.state_dict().items()}


def torch_freematch_mm_step(tm, ema, img_x, tab_x, img_u, tab_u, y_l,
                            time_p, p_model, label_hist):
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=LR)

    logits_q, _ = tm(torch.cat([img_x, img_u]),
                     torch.cat([tab_x, tab_u]))
    logits_x, logits_us = logits_q[:B_L], logits_q[B_L:]

    with torch.no_grad():
        sd_s, sd_t = tm.state_dict(), ema.state_dict()
        for k in sd_t:
            if "num_batches_tracked" in k:
                sd_t[k].copy_(sd_s[k])
            else:
                sd_t[k].mul_(MOMENTUM).add_((1 - MOMENTUM) * sd_s[k])
        ema.eval()
        logits_uw, _ = ema(img_u, tab_u)
        probs_uw = torch.softmax(logits_uw, dim=-1)
        max_probs, max_idx = probs_uw.max(dim=-1)

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


def test_freematch_multimodal_train_step_golden_vs_torch():
    torch.manual_seed(29)
    tm = TMatchMMBackbone()
    torch.manual_seed(31)
    ema = TMatchMMBackbone()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(8)
    img_l = rng.rand(B_L, IMG, IMG, 3).astype(np.float32)
    img_u = rng.rand(B_U, IMG, IMG, 3).astype(np.float32)
    mk_tab = lambda n: np.concatenate(
        [np.stack([rng.randint(0, c, n) for c in CATS], 1),
         rng.randn(n, NCON)], 1).astype(np.float32)
    tab_l, tab_u = mk_tab(B_L), mk_tab(B_U)
    y_l = rng.randint(0, NCLS, B_L).astype(np.int64)
    y_u = rng.randint(0, NCLS, B_U).astype(np.int64)
    # threshold placement: probed teacher max-probs span
    # 0.29819-0.30717 (argmax classes 0/1); uniform p_model keeps both
    # per-class thresholds within ~1e-6 of time_p, so
    # time_p0 = 0.3014 puts the post-update cut mid-batch (6 below /
    # 6 above, >=5e-4 boundary gaps)
    time_p0 = np.float32(0.3014)
    p_model0 = np.full((NCLS,), 1.0 / NCLS, np.float32)
    label_hist0 = rng.dirichlet(np.ones(NCLS)).astype(np.float32)

    # ---- our side -----------------------------------------------------
    field_lengths = list(CATS) + [1] * NCON
    cfg = _Cfg(
        algorithm_name="FreeMatch", eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=PROJ,
        tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
        tabular_transformer_num_layers=1,
        lambda_u=LAMBDA_U, lambda_e=LAMBDA_E, start_epoch=0,
        ema_momentum=MOMENTUM, use_ema=True, eman=True,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = FreeMatch(cfg, field_lengths, dtype=jnp.float32)
    ident = lambda k, im, apply_rate=1.0: im.astype(jnp.float32)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    algo.aug_strong = ident
    algo.tx = optax.sgd(LR)

    state = algo.init_state(jax.random.key(0), jnp.asarray(img_l[:2]),
                            jnp.asarray(tab_l[:2]))
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

    cache_l = {"images": jnp.asarray(img_l),
               "tabular": jnp.asarray(tab_l),
               "labels": jnp.asarray(y_l),
               "labelled": jnp.ones((B_L,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.asarray(tab_u),
               "labels": jnp.asarray(y_u),
               "labelled": jnp.zeros((B_U,), bool)}
    step = algo.make_train_step()
    new_state = step(state, cache_l, cache_u,
                     jnp.arange(B_L, dtype=jnp.int32),
                     jnp.arange(B_U, dtype=jnp.int32),
                     jnp.asarray(1, jnp.int32))

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    logs, time_p_t, p_model_t, label_hist_t = torch_freematch_mm_step(
        tm, ema, t(img_l.transpose(0, 3, 1, 2)), t(tab_l),
        t(img_u.transpose(0, 3, 1, 2)), t(tab_u), t(y_l),
        t(time_p0), t(p_model0), t(label_hist0))

    assert 0.0 < logs["threshold1_ratio"] < 1.0, logs

    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    np.testing.assert_allclose(float(new_state.extra["time_p"]),
                               float(time_p_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.extra["p_model"]),
                               p_model_t.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.extra["label_hist"]),
                               label_hist_t.numpy(), rtol=1e-4, atol=1e-6)

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
