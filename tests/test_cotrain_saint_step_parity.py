"""CoTrain_Pseudo_SAINT train-step golden parity vs an independent
torch twin — covers the SAINT tabular encoder inside a full train step
(the last backbone variant without step-level golden coverage; the
SAINT encoder itself is eval-parity-tested in test_saint_parity).

Twin semantics: identical step logic to ``CoTraining.py:110-160`` (the
SAINT file differs only in the backbone import — SURVEY.md §2.5), with
the backbone of ``Multimodal_model_SAINT.py:160-195``: SAINT forward
(CLS prepend + category offsets + per-continuous MLPs + cat-only
pos-enc + colrow transformer), CLS token (dim 32) feeding the tabular
classifier and — via Identity, since tabular dim == multimodal dim
here — the concat fusion.

SAINT's hard-coded 0.8 FF dropout is switched off through the
``saint_ff_dropout`` knob so both sides are deterministic (the torch
twin carries no dropout modules); everything else runs the production
path. No EMA here (CoTrain's EMAN path is twinned in
test_cotrain_step_parity) — the no-EMA branch pseudo-labels from the
student's own detached heads, covering ``CoTraining.py:133-134``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.cotrain import CoTrainSAINT
from stil_tta_tpu.train.convert import (convert_torch_state_dict,
                                        load_saint_state_dict)
from tests.test_convert_parity import TResNet18
from tests.test_saint_parity import CATS, NCON, DIM, TSaintEncoder
from tests.test_simmatch_step_parity import _Cfg

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
PROJ = 16
ALPHA = 1.0
RATE_UCE = 0.5
THRESHOLD = 0.553  # probed teacher max-probs: imaging spans
                   # 0.3662-0.6028 (10 below / 2 above), tabular
                   # 0.5412-0.5983 (3 below / 9 above) — both split,
                   # with >=2e-3 boundary gaps
LR = 1.0
EPOCH = 1


class TSemiSAINTBackbone(nn.Module):
    """Reference ``Multimodal_model_SAINT.MultimodalBackbone``: ResNet +
    SAINT, concat fusion, three classifiers; tabular_proj is Identity
    (SAINT CLS dim 32 == multimodal dim 32 here)."""

    def __init__(self):
        super().__init__()
        self.encoder_imaging = TResNet18()
        self.encoder_tabular = TSaintEncoder()
        self.image_proj = nn.Linear(512, DIM)
        self.multimodal_proj = nn.Linear(DIM * 2, PROJ)
        self.classifier_multimodal = nn.Linear(PROJ, NCLS)
        self.classifier_imaging = nn.Linear(512, NCLS)
        self.classifier_tabular = nn.Linear(DIM, NCLS)

    def forward(self, img, tab):
        x_i = self.encoder_imaging(img)
        x_t = self.encoder_tabular(tab)
        t_cls = x_t[:, 0, :]
        x_m = self.multimodal_proj(
            torch.cat([self.image_proj(x_i), t_cls], dim=1))
        return (self.classifier_multimodal(x_m),
                self.classifier_imaging(x_i),
                self.classifier_tabular(t_cls), x_m)


def torch_cotrain_noema_step(tm, img, tab, y_l):
    """One reference CoTraining step (use_ema=False: pseudo-labels from
    the student's own detached heads) + SGD(LR); mutates tm."""
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=LR)

    om, oi, ot, _ = tm(img, tab)
    with torch.no_grad():
        pseudo_i = torch.softmax(oi[B_L:], dim=1)
        pseudo_t = torch.softmax(ot[B_L:], dim=1)
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


def test_cotrain_saint_train_step_golden_vs_torch():
    torch.manual_seed(23)
    tm = TSemiSAINTBackbone()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(6)
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
        algorithm_name="CoTrain_Pseudo_SAINT",
        eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=PROJ,
        tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
        tabular_transformer_num_layers=1, alpha=ALPHA,
        rate_uce=RATE_UCE, co_threshold=THRESHOLD, start_epoch=0,
        DA=False, use_ema=False, eman=False, ema_momentum=0.99,
        saint_ff_dropout=0.0,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, crop_scale_lower=0.08, target="dvm",
        embedding_dropout=0.0, drop_rate=0.0)
    algo = CoTrainSAINT(cfg, field_lengths, dtype=jnp.float32)
    algo.contrastive_views = lambda key, images, tabular, marginal: (
        images.astype(jnp.float32), tabular)
    algo.tx = optax.sgd(LR)

    state = algo.init_state(jax.random.key(0), jnp.asarray(img_l[:2]),
                            jnp.asarray(tab_l[:2]))

    # conversion: SAINT subtree via load_saint_state_dict, the rest via
    # convert_torch_state_dict (the reference itself loads SAINT from a
    # separate .pth — ``STiLModel_SAINT_backbone.py:144-146``)
    saint_sub = {"params": state.params["backbone"]["encoder_tabular"]}
    saint_sd = {k[len("encoder_tabular."):]: v.numpy()
                for k, v in tm.state_dict().items()
                if k.startswith("encoder_tabular.")}
    saint_conv, n_used = load_saint_state_dict(saint_sub, saint_sd)
    assert n_used >= 20

    rest_params = {
        "backbone": {k: v
                     for k, v in state.params["backbone"].items()
                     if k != "encoder_tabular"}}
    rest_vars = {"params": rest_params, "batch_stats": state.batch_stats}
    rest_sd = {"model." + k: v.numpy()
               for k, v in tm.state_dict().items()
               if not k.startswith("encoder_tabular.")}
    conv_rest, leftovers = convert_torch_state_dict(rest_sd, rest_vars)
    assert not leftovers, leftovers

    full_params = dict(conv_rest["params"]["backbone"])
    full_params["encoder_tabular"] = saint_conv["params"]
    converted = {"params": {"backbone": full_params},
                 "batch_stats": conv_rest["batch_stats"]}
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]))

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
    logs = torch_cotrain_noema_step(
        tm, t(np.concatenate([img_l, img_u]).transpose(0, 3, 1, 2)),
        t(np.concatenate([tab_l, tab_u])), t(y_l))

    # at least one modality's threshold must actually split the batch
    assert 0.0 < logs["threshold_i_ratio"] < 1.0 \
        or 0.0 < logs["threshold_t_ratio"] < 1.0, logs

    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    # student BN stats after the train-mode forward (SAINT itself is
    # LayerNorm-only — stats live in the ResNet)
    rest_vars_post = {"params": rest_params,
                      "batch_stats": state.batch_stats}
    conv_student, _ = convert_torch_state_dict(
        {"model." + k: v.numpy() for k, v in tm.state_dict().items()
         if not k.startswith("encoder_tabular.")}, rest_vars_post)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        new_state.batch_stats, conv_student["batch_stats"])

    # gradients via the SGD delta — whole-model relative L2 (includes
    # every SAINT parameter: embeds, per-column MLP stacks, col+row
    # attention, GEGLU FFs)
    ga = np.concatenate([
        np.asarray(n - o, np.float64).ravel() for n, o in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(converted["params"]))])
    # rebuild the converted-torch params tree post-step for the twin
    saint_post, _ = load_saint_state_dict(
        saint_sub, {k[len("encoder_tabular."):]: v.numpy()
                    for k, v in tm.state_dict().items()
                    if k.startswith("encoder_tabular.")})
    rest_post, _ = convert_torch_state_dict(
        {"model." + k: v.numpy() for k, v in tm.state_dict().items()
         if not k.startswith("encoder_tabular.")}, rest_vars_post)
    full_post = dict(rest_post["params"]["backbone"])
    full_post["encoder_tabular"] = saint_post["params"]
    gb = np.concatenate([
        np.asarray(n - o, np.float64).ravel() for n, o in zip(
            jax.tree_util.tree_leaves({"backbone": full_post}),
            jax.tree_util.tree_leaves(converted["params"]))])
    rel = np.linalg.norm(ga - gb) / max(np.linalg.norm(gb), 1e-8)
    assert np.linalg.norm(gb) > 1e-3
    assert rel < 0.02, rel
