"""CoTrain_Pseudo train-step golden parity vs an independent torch twin
— the cross-modal pseudo-label family, run WITH the optional EMAN
teacher so the multimodal-backbone EMA path is golden-covered too.

Twin semantics from the reference:
``CoTraining.py:110-160`` (single student forward on the cat of labeled
+ unlabeled augmented views; EMAN state-dict lerp AFTER the student's
train-mode forward ``:94-109, 127-131``; eval-mode teacher on the SAME
views; cross-modal soft pseudo-labels — imaging head learns from the
tabular teacher masked at ``co_threshold`` and vice versa ``:139-148``;
gate ``epoch <= start_epoch`` keeps α·CE only).

Views are identity (augmentation + corruption bypassed on both sides);
dropout rates are 0, so both sides are deterministic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.cotrain import CoTrain
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_full_model_parity import CATS, NCON
from tests.test_mmatch_step_parity import TSemiBackbone
from tests.test_simmatch_step_parity import _Cfg

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
PROJ = 16
DIM = 32
ALPHA = 1.0
RATE_UCE = 0.5
THRESHOLD = 0.539  # teacher max-probs: imaging spans 0.2600-0.2615
                   # (all masked out -> loss_t_u = 0, the empty-mask
                   # edge), tabular spans 0.5282-0.5553 with a >=1.7e-4
                   # gap around 0.539: 4 below / 8 above
MOMENTUM = 0.9
LR = 1.0          # SGD twin: the post-step param delta IS the gradient
EPOCH = 1         # > start_epoch=0: full loss


def torch_cotrain_step(tm, ema, img, tab, y_l):
    """One reference CoTraining step + SGD(LR) update. Returns logs;
    mutates tm/ema in place."""
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=LR)

    om, oi, ot, _ = tm(img, tab)

    with torch.no_grad():
        sd_s, sd_t = tm.state_dict(), ema.state_dict()
        for k in sd_t:
            if "num_batches_tracked" in k:
                sd_t[k].copy_(sd_s[k])
            else:
                sd_t[k].mul_(MOMENTUM).add_((1 - MOMENTUM) * sd_s[k])
        ema.eval()
        _, oi_e, ot_e, _ = ema(img, tab)
        pseudo_i = torch.softmax(oi_e[B_L:], dim=1)
        pseudo_t = torch.softmax(ot_e[B_L:], dim=1)
        mask_i = pseudo_i.max(dim=1).values.ge(THRESHOLD)
        mask_t = pseudo_t.max(dim=1).values.ge(THRESHOLD)

    loss_ce = (F.cross_entropy(om[:B_L], y_l)
               + F.cross_entropy(oi[:B_L], y_l)
               + F.cross_entropy(ot[:B_L], y_l))
    loss_i_u = (F.cross_entropy(oi[B_L:], pseudo_t, reduction="none")
                * mask_t).mean()
    loss_t_u = (F.cross_entropy(ot[B_L:], pseudo_i, reduction="none")
                * mask_i).mean()
    loss = ALPHA * loss_ce + RATE_UCE * (loss_i_u + loss_t_u)

    opt.zero_grad()
    loss.backward()
    opt.step()

    f = lambda t: float(t.detach())
    return {"loss": f(loss), "CEloss": f(loss_ce),
            "CEloss_unlabelled_i": f(loss_i_u),
            "CEloss_unlabelled_t": f(loss_t_u),
            "threshold_i_ratio": float(mask_i.float().mean()),
            "threshold_t_ratio": float(mask_t.float().mean())}


def test_cotrain_train_step_golden_vs_torch():
    torch.manual_seed(13)
    tm = TSemiBackbone()
    torch.manual_seed(17)
    ema = TSemiBackbone()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(4)
    img_l = rng.rand(B_L, IMG, IMG, 3).astype(np.float32)
    img_u = rng.rand(B_U, IMG, IMG, 3).astype(np.float32)
    mk_tab = lambda n: np.concatenate(
        [np.stack([rng.randint(0, c, n) for c in CATS], 1),
         rng.randn(n, NCON)], 1).astype(np.float32)
    tab_l, tab_u = mk_tab(B_L), mk_tab(B_U)
    y_l = rng.randint(0, NCLS, B_L).astype(np.int64)
    y_u = rng.randint(0, NCLS, B_U).astype(np.int64)

    # ---- our side -----------------------------------------------------
    field_lengths = list(CATS) + [1] * NCON
    cfg = _Cfg(
        algorithm_name="CoTrain_Pseudo",
        eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=PROJ,
        tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
        tabular_transformer_num_layers=1, alpha=ALPHA,
        rate_uce=RATE_UCE, co_threshold=THRESHOLD, start_epoch=0,
        DA=False, use_ema=True, eman=True, ema_momentum=MOMENTUM,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, crop_scale_lower=0.08, target="dvm",
        embedding_dropout=0.0, drop_rate=0.0)
    algo = CoTrain(cfg, field_lengths, dtype=jnp.float32)
    algo.contrastive_views = lambda key, images, tabular, marginal: (
        images.astype(jnp.float32), tabular)
    algo.tx = optax.sgd(LR)

    state = algo.init_state(jax.random.key(0), jnp.asarray(img_l[:2]),
                            jnp.asarray(tab_l[:2]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    to_sd = lambda net: {"model." + k: v.numpy()
                         for k, v in net.state_dict().items()}
    converted, leftovers = convert_torch_state_dict(to_sd(tm), variables)
    assert not leftovers, leftovers
    conv_ema, _ = convert_torch_state_dict(to_sd(ema), variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"])

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
                     jnp.asarray(EPOCH, jnp.int32))

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    logs = torch_cotrain_step(
        tm, ema, t(np.concatenate([img_l, img_u]).transpose(0, 3, 1, 2)),
        t(np.concatenate([tab_l, tab_u])), t(y_l))

    # both cross-modal thresholds must actually split the batch
    assert 0.0 < logs["threshold_i_ratio"] < 1.0 \
        or 0.0 < logs["threshold_t_ratio"] < 1.0

    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    # EMAN teacher (params + post-forward BN stats) and student stats
    conv_post, _ = convert_torch_state_dict(to_sd(ema), variables)
    for ours_t, ref_t, tol in (
            (new_state.ema_params, conv_post["params"], 1e-4),
            (new_state.ema_batch_stats, conv_post["batch_stats"], 1e-3)):
        jax.tree_util.tree_map(
            lambda a, b, tol=tol: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=tol, atol=1e-5),
            ours_t, ref_t)
    conv_student, _ = convert_torch_state_dict(to_sd(tm), variables)
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
