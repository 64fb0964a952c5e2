"""Train-step golden parity: one full STiL TRAINING step against a torch
twin implementing the reference semantics end to end —
student train-mode forward (BN batch stats), EMAN teacher update from the
student's post-forward state dict, teacher forward, CGPL case routing,
PGLS prototype blending, all six loss terms, the warmup gate, prototype
sum/count accumulation with repeat_ratio, BN running-stat updates, and
the parameter gradients (via an SGD step so the update IS the gradient).

Parity target: ``/root/reference/models/Disentangle/STiLModel.py:228-386``
(training_step), ``:150-168`` (momentum_update_ema), ``:199-226``
(cal_prototypes/cal_prototypes_separate). This is the single test that
fails if any of those ~160 riskiest ported lines drifts.

RNG handling: augmentation and dropout are disabled (rate 0 -> identity
on same-size images / clean tabular); the one remaining random draw —
the case-3 Bernoulli routing mask (``STiLModel.py:299``) — is recomputed
here from the same jax key stream our step derives it from and fed to
the torch twin as data (the reference uses ``torch.rand``; the mask is
data, not semantics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.stil import STiL
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_full_model_parity import (CATS, DIM, NCLS, NCON, PROJ,
                                          TSTiL)
from tests.test_convert_parity import TResNet18


B_L, B_U = 4, 12
IMG = 64
SEED = 123
TH1 = 0.18          # low threshold -> mixed confidence mask on random init
TEMP = 0.1
LAM0 = 0.5
RATE_PSEUDO = 0.9
ALPHA, BETA, GAMMA = 0.2, 3.0, 0.5
RATE_PT, RATE_UCE = 1.0, 0.2
MOMENTUM = 0.9      # ema_momentum (low so one lerp moves visibly)
REPEAT_RATIO = 3.0
LR = 1.0            # SGD twin: the post-step param delta IS the gradient


def _feature_map(self, x):
    x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
    for s in range(4):
        x = getattr(self, f"layer{s + 1}")(x)
    return x


TResNet18.feature_map = _feature_map


def t_forward_all(tb, img, tab):
    """Reference ``forward_all`` (``STiLModel_backbone.py:150-156``):
    returns (out_m, out_i, out_t, x_si_enhance, x_si_pooled, x_ai,
    x_st_enhance, x_st_pooled, x_at, x_c_pooled)."""
    fm = tb.encoder_imaging.feature_map(img)
    b, c, h, w = fm.shape
    xi = fm.reshape(b, c, h * w).permute(0, 2, 1)
    xt = tb.encoder_tabular(tab)
    x_si = tb.projection_si(xi)
    x_ai = tb.projection_ai(xi.mean(1))
    x_st = tb.projection_st(xt[:, 1:, :])
    x_at = tb.projection_at(xt[:, 0, :])
    x_c = tb.reduce(torch.cat([x_ai, x_at], 1)).unsqueeze(1)
    si, st, xc = x_si, x_st, x_c
    for blk in tb.transformer:
        si, st, xc = blk(si, st, xc)
    si_m, st_m, xc_m = si.mean(1), st.mean(1), xc.mean(1)
    out_m = tb.classifier_multimodal(torch.cat([si_m, xc_m, st_m], 1))
    out_i = tb.classifier_imaging(torch.cat([si_m, x_ai], 1))
    out_t = tb.classifier_tabular(torch.cat([st_m, x_at], 1))
    return (out_m, out_i, out_t, si_m, x_si.mean(1), x_ai, st_m,
            x_st.mean(1), x_at, xc_m)


def t_club(club, x, y):
    """``club.py:105-130``: MI upper bound + learning loss."""
    mu = club.p_mu(x)
    positive = (-(mu - y) ** 2 / 2.0).sum(-1)
    negative = (-((y.unsqueeze(0) - mu.unsqueeze(1)) ** 2).mean(1)
                / 2.0).sum(-1)
    bound = (positive - negative).mean()
    learning = ((mu - y) ** 2).sum(1).mean()
    return bound, learning


def t_clip(feat_i, feat_t):
    """``clip_loss.py:28-40``."""
    f0 = F.normalize(feat_i, dim=1)
    f1 = F.normalize(feat_t, dim=1)
    logits = f0 @ f1.t() / TEMP
    labels = torch.arange(len(f0))
    return (LAM0 * F.cross_entropy(logits, labels)
            + (1 - LAM0) * F.cross_entropy(logits.t(), labels))


def t_prototype_loss(label, prototypes, feat):
    """``prototype_loss.py:24-39``."""
    sim = torch.softmax(feat @ prototypes.t() / TEMP, dim=1)
    log_sim = torch.log(sim + 1e-7)
    max_prob, max_id = torch.max(label, dim=1)
    conf = max_prob.ge(TH1).float()
    hard = torch.zeros_like(label)
    hard[torch.arange(len(label)), max_id] = 1
    return (-(log_sim * hard).sum(1) * conf).mean()


def t_cal_prototypes(label, feat):
    """``STiLModel.py:199-214``."""
    max_prob, max_id = torch.max(label, dim=1)
    conf = max_prob.ge(TH1)
    hard = torch.zeros_like(label)
    hard[torch.arange(len(label)), max_id] = 1
    hard, feat = hard[conf], feat[conf]
    return hard.t() @ feat, hard.sum(0, keepdim=True).t()


def torch_train_step(tm, teacher, img, tab, y_l, prototypes, mask_random,
                     epoch, start_epoch, lr=LR, da=None):
    """The reference training_step (``STiLModel.py:228-386``),
    multiclass, use_ema/eman on, followed by an SGD(lr) update.

    ``da``: optional ``{"queue": (256, C) tensor, "ptr": int}`` dict —
    the reference's distribution-alignment buffer
    (``STiLModel.py:100-104,171-180``), mutated in place. None = DA off
    (prediction = sharpened multimodal probs)."""
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=lr)
    mlp = tm.projector_multimodal.layers
    (yhm, yhi, yht, x_si_e, x_si, x_ai, x_st_e, x_st, x_at,
     x_c) = t_forward_all(tm.backbone, img, tab)
    feat_m = F.normalize(mlp(torch.cat([x_si_e, x_c, x_st_e], 1)), dim=1)
    feat_i = F.normalize(tm.projector_imaging(x_ai), dim=1)
    feat_t = F.normalize(tm.projector_tabular(x_at), dim=1)

    with torch.no_grad():
        # EMAN update from the student's POST-forward state dict
        # (``:150-162``: lerp everything, copy num_batches_tracked)
        sd_s = tm.backbone.state_dict()
        sd_t = teacher.state_dict()
        for k in sd_t:
            if "num_batches_tracked" in k:
                sd_t[k].copy_(sd_s[k])
            else:
                sd_t[k].mul_(MOMENTUM).add_((1 - MOMENTUM) * sd_s[k])
        teacher.eval()
        (yhm_e, yhi_e, yht_e, x_si_ee, _, _, x_st_ee, _, _,
         x_c_e) = t_forward_all(teacher, img, tab)
        feat_m_e = F.normalize(
            mlp(torch.cat([x_si_ee, x_c_e, x_st_ee], 1)), dim=1)
        feat_m_le, feat_m_ue = feat_m_e[:B_L], feat_m_e[B_L:]
        yhm_ue, yhi_ue, yht_ue = yhm_e[B_L:], yhi_e[B_L:], yht_e[B_L:]
        top_m = yhm_ue.argmax(1)
        top_i = yhi_ue.argmax(1)
        top_t = yht_ue.argmax(1)
        case1 = (top_m == top_i) & (top_m == top_t)
        case2_i = (top_m == top_i) & (top_m != top_t)
        case2_t = (top_m == top_t) & (top_m != top_i)
        case3 = ~(case1 | case2_i | case2_t)
        sharpen = lambda z: torch.softmax(z.detach(), dim=1)
        pl_orig = (case1[:, None] * sharpen((yhm_ue + yhi_ue + yht_ue) / 3)
                   + case2_i[:, None] * sharpen((yhm_ue + yhi_ue) / 2)
                   + case2_t[:, None] * sharpen((yhm_ue + yht_ue) / 2)
                   + case3[:, None] * sharpen(yhm_ue))
        if da is None:
            prediction = sharpen(yhm_ue)  # DA off
        else:
            # ``STiLModel.py:171-180``: enqueue the batch mean, divide
            # by the queue mean, renormalise
            probs = torch.softmax(yhm_ue.detach(), dim=1)
            da["queue"][da["ptr"]] = probs.mean(0)
            da["ptr"] = (da["ptr"] + 1) % da["queue"].shape[0]
            prediction = probs / da["queue"].mean(0)
            prediction = prediction / prediction.sum(1, keepdim=True)
        teacher_probs = torch.softmax(feat_m_ue @ prototypes.t() / TEMP, 1)
        pseudo_label = (RATE_PSEUDO * pl_orig
                        + (1 - RATE_PSEUDO) * teacher_probs)
        prediction = (RATE_PSEUDO * prediction
                      + (1 - RATE_PSEUDO) * teacher_probs)
        mask1 = prediction.max(1).values.ge(TH1)

    loss_ce = (F.cross_entropy(yhm[:B_L], y_l)
               + F.cross_entropy(yhi[:B_L], y_l)
               + F.cross_entropy(yht[:B_L], y_l))
    loss_m_u = (F.cross_entropy(yhm[B_L:], pseudo_label, reduction="none")
                * mask1 * case1).mean()
    loss_i_u = (F.cross_entropy(yhi[B_L:], pseudo_label, reduction="none")
                * mask1 * (case1.float() + case2_t
                           + case3 * mask_random)).mean()
    loss_t_u = (F.cross_entropy(yht[B_L:], pseudo_label, reduction="none")
                * mask1 * (case1.float() + case2_i
                           + case3 * (1 - mask_random))).mean()
    # warmup gate (``:317-321``): prediction zeroed before start_epoch
    pred_gated = prediction if epoch > start_epoch \
        else torch.zeros_like(prediction)
    pseudo_label_all = torch.cat(
        [F.one_hot(y_l, NCLS).float(), pred_gated], 0)
    loss_itc = t_clip(feat_i, feat_t)
    club_i, club_i_est = t_club(tm.CLUB_imaging, x_si, x_ai)
    club_t, club_t_est = t_club(tm.CLUB_tabular, x_st, x_at)
    loss_pt = t_prototype_loss(pseudo_label_all, prototypes, feat_m)
    base = (ALPHA * loss_ce + BETA * loss_itc
            + GAMMA * (club_i + club_i_est + club_t + club_t_est))
    if epoch > start_epoch:
        total = base + RATE_PT * loss_pt \
            + RATE_UCE * (loss_m_u + loss_i_u + loss_t_u)
    else:
        total = base

    with torch.no_grad():
        sum_l, cnt_l = t_cal_prototypes(pseudo_label_all[:B_L], feat_m_le)
        sum_u, cnt_u = t_cal_prototypes(pseudo_label_all[B_L:], feat_m_ue)
        proto_sum = sum_l / REPEAT_RATIO + sum_u
        proto_cnt = cnt_l / REPEAT_RATIO + cnt_u

    opt.zero_grad()
    total.backward()
    opt.step()

    f = lambda t: float(t.detach())
    logs = {
        "CEloss": f(loss_ce), "CEloss_unlabelled_m": f(loss_m_u),
        "CEloss_unlabelled_i": f(loss_i_u),
        "CEloss_unlabelled_t": f(loss_t_u),
        "threshold1_ratio": float(mask1.float().mean()),
        "case1_ratio": float(case1.float().mean()),
        "case2_i_ratio": float(case2_i.float().mean()),
        "case2_t_ratio": float(case2_t.float().mean()),
        "case3_ratio": float(case3.float().mean()),
        "ITCloss": f(loss_itc),
        "CLUBloss_imaging": f(club_i), "CLUBloss_imaging_est": f(club_i_est),
        "CLUBloss_tabular": f(club_t), "CLUBloss_tabular_est": f(club_t_est),
        "PTloss": f(loss_pt), "loss": f(total),
    }
    return logs, proto_sum.numpy(), proto_cnt.numpy()


class _Cfg(dict):
    __getattr__ = dict.get


def _build_cfg():
    return _Cfg(
        model="resnet18", num_classes=NCLS, target="dvm",
        projection_dim=PROJ, tabular_embedding_dim=DIM,
        multimodal_embedding_dim=DIM, tabular_transformer_num_layers=1,
        multimodal_transformer_num_layers=1, embedding_dropout=0.0,
        drop_rate=0.0, finetune_strategy=None, checkpoint=None,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        crop_scale_lower=0.08, use_ema=True, eman=True,
        ema_momentum=MOMENTUM, DA=False, augmentation_rate=0.0,
        corruption_rate=0.0, alpha=ALPHA, beta=BETA, gamma=GAMMA,
        rate_pt=RATE_PT, rate_uce=RATE_UCE, th1=TH1, temperature=TEMP,
        lambda_0=LAM0, rate_pseudo=RATE_PSEUDO, start_epoch=0,
        repeat_ratio=REPEAT_RATIO, strict_prototypes=False)


def _convert(tm, backbone=None):
    """Full-model torch state dict with reference key names; if
    ``backbone`` is given its weights replace the student's backbone
    (for converting the EMA teacher through the same mapping)."""
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    sd = {("model." + k[len("backbone."):]
           if k.startswith("backbone.") else k): v for k, v in sd.items()}
    if backbone is not None:
        for k, v in backbone.state_dict().items():
            sd["model." + k] = v.numpy()
    return sd


@pytest.mark.parametrize("epoch", [0, 1])
def test_stil_train_step_golden_vs_torch(epoch, monkeypatch):
    # The fusion layer hardcodes attn/proj/drop-path dropout 0.1
    # (``STiLModel_backbone.py:60``, mirrored in backbones.py); dropout
    # masks cannot align across frameworks, so the golden step runs the
    # fusion dropout-free on both sides (the twin has no dropout).
    from stil_tta_tpu.models import backbones
    real_layer = backbones.MITransformerLayer

    def dropfree(**kw):
        kw.update(attn_drop=0.0, proj_drop=0.0, drop_path=0.0)
        return real_layer(**kw)

    monkeypatch.setattr(backbones, "MITransformerLayer", dropfree)
    torch.manual_seed(3)
    tm = TSTiL()
    # non-trivial BN running stats on the student
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    # independent teacher backbone (a real EMAN lerp, not a no-op copy)
    torch.manual_seed(7)
    teacher = TSTiL().backbone
    with torch.no_grad():
        for m in teacher.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (B_L + B_U, IMG, IMG, 3)).astype(np.float32)
    tabs = np.concatenate([
        np.stack([rng.randint(0, c, B_L + B_U) for c in CATS], 1),
        rng.randn(B_L + B_U, NCON)], 1).astype(np.float32)
    y = rng.randint(0, NCLS, B_L + B_U).astype(np.int64)
    prototypes = rng.randn(NCLS, PROJ).astype(np.float32)
    prototypes /= np.linalg.norm(prototypes, axis=1, keepdims=True)

    # ---- our side -----------------------------------------------------
    cfg = _build_cfg()
    algo = STiL(cfg, CATS + (1,) * NCON, dtype=jnp.float32)
    algo.tx = optax.sgd(LR)  # twin uses SGD: param delta == gradient
    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(imgs[:2]), jnp.asarray(tabs[:2]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
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
        rng=jax.random.key(SEED))

    cache_l = {"images": jnp.asarray(imgs[:B_L]),
               "tabular": jnp.asarray(tabs[:B_L]),
               "labels": jnp.asarray(y[:B_L]),
               "labelled": jnp.ones((B_L,), bool)}
    cache_u = {"images": jnp.asarray(imgs[B_L:]),
               "tabular": jnp.asarray(tabs[B_L:]),
               "labels": jnp.asarray(y[B_L:]),
               "labelled": jnp.zeros((B_U,), bool)}
    step = algo.make_train_step()
    new_state = step(state, cache_l, cache_u,
                     jnp.arange(B_L, dtype=jnp.int32),
                     jnp.arange(B_U, dtype=jnp.int32),
                     jnp.asarray(epoch, jnp.int32))

    # the case-3 routing Bernoulli our step drew (see module docstring)
    k_case3 = jax.random.split(jax.random.key(SEED), 4)[3]
    mask_rand = np.asarray(
        jax.random.uniform(k_case3, (B_U,)) >= 0.5).astype(np.float32)

    # ---- torch twin ---------------------------------------------------
    timg = torch.tensor(imgs.transpose(0, 3, 1, 2) / 255.0)
    logs, proto_sum, proto_cnt = torch_train_step(
        tm, teacher, timg, torch.tensor(tabs), torch.tensor(y[:B_L]),
        torch.tensor(prototypes), torch.tensor(mask_rand), epoch,
        start_epoch=0)

    # ---- every logged loss component / ratio --------------------------
    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log key {k}")

    # ---- prototype sums / counts (incl. repeat_ratio scaling) ---------
    np.testing.assert_allclose(np.asarray(new_state.prototypes_sum),
                               proto_sum, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_state.prototypes_count),
                               proto_cnt, rtol=0, atol=1e-5)

    # ---- EMAN-updated teacher (params + BN running stats) -------------
    conv_post, _ = convert_torch_state_dict(
        _convert(tm, backbone=teacher), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        new_state.ema_params, conv_post["params"]["backbone"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        new_state.ema_batch_stats, conv_post["batch_stats"]["backbone"])

    # ---- student BN running stats (torch Bessel-corrected update) -----
    conv_student, _ = convert_torch_state_dict(_convert(tm), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        new_state.batch_stats, conv_student["batch_stats"])

    # ---- gradients, via the SGD update (new = old - grad) -------------
    # Per-leaf RELATIVE L2, not per-entry allclose: f32 forward noise
    # (~1e-4 on activations) flips ReLU gates for units within noise of
    # zero, changing each framework's gradient *discretely* — measured
    # ~1% disagreement along random directions with the torch-f64 finite
    # difference sitting between the two autodiff values. Semantic drift
    # (a wrong loss term, sign, or missing stop-gradient) produces
    # 10-100% errors on specific leaves, far above this bound.
    def rel_l2(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(np.linalg.norm(a - b)
                     / max(np.linalg.norm(b), 1e-8))
    ga = jax.tree_util.tree_map(lambda new, old: new - old,
                                new_state.params, converted["params"])
    gb = jax.tree_util.tree_map(lambda new, old: new - old,
                                conv_student["params"],
                                converted["params"])
    flat_a = jax.tree_util.tree_flatten_with_path(ga)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(gb)[0]
    total_a = np.concatenate([np.asarray(a, np.float64).ravel()
                              for _, a in flat_a])
    total_b = np.concatenate([np.asarray(b, np.float64).ravel()
                              for _, b in flat_b])
    # whole-model gradient agreement
    assert rel_l2(total_a, total_b) < 0.02, rel_l2(total_a, total_b)
    assert np.linalg.norm(total_b) > 1e-3  # gradients are nonzero
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        nb = float(np.linalg.norm(np.asarray(b, np.float64)))
        if nb < 1e-5:       # leaf with (near-)zero reference gradient
            assert float(np.linalg.norm(np.asarray(a, np.float64))) < 1e-4
            continue
        assert rel_l2(a, b) < 0.06, \
            f"gradient drift {rel_l2(a, b):.3f} at {jax.tree_util.keystr(pa)}"

