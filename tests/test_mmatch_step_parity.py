"""MMatch train-step golden parity vs an independent torch twin — the
three-head multimodal family (no EMA; 640-deep memory bank in the
reference, shrunk here so one batch wraps the ring).

Twin semantics from the reference:
``MMatch.py:191-262`` (single student forward on the cat of labeled +
unlabeled *augmented* views; labeled CE on all three heads; DA THEN
memory-smoothing ``0.9·DA + 0.1·A@probs_bank`` after epoch 0
``:215-223``; hard-label masked CE on the imaging and tabular heads
only ``:225-230``; gate ``epoch <= start_epoch`` keeps α·CE;
``_dequeue_and_enqueue(feat_m, cat(one_hot(y_l), pseudo))`` over the
FULL batch with boundary truncation ``:101-117``) and
``MMatch.py:135-148`` (DA ring of batch-mean probs, 256 deep).

Views are identity (augmentation + corruption bypassed on both sides);
the tabular transformer's dropout rate is 0, so both sides are
deterministic. The bank pointer is pre-advanced so the enqueue crosses
the K boundary (the truncation path).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.base import DAState
from stil_tta_tpu.algorithms.mmatch import MMatch
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_convert_parity import TResNet18
from tests.test_full_model_parity import TTabEnc, CATS, NCON, DIM
from tests.test_simmatch_step_parity import _Cfg

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
PROJ = 16         # projection_dim = x_m dim = bank row dim
K = 16            # bank size (reference: 640); B_L+B_U wraps it
TEMP = 0.1
ALPHA = 1.0
LAM = 0.5
TH1 = 0.40   # the twin's smoothed pseudo maxes span 0.3627-0.4527 with
             # a >=2e-3 gap around 0.40: 4 below / 8 above
DA_LEN = 256
HIST_FILL = 3     # DA ring rows already present
PTR0 = 10         # bank pointer pre-advanced: enqueue truncates at K
LR = 1.0          # SGD twin: the post-step param delta IS the gradient
EPOCH = 1         # > start_epoch=0 and > 0: smoothing + full loss


class TSemiBackbone(nn.Module):
    """Reference SemiMultimodal ``MultimodalBackbone``
    (``Multimodal_model.py:36-122``): ResNet + tabular transformer,
    concat fusion, three classifiers. tabular_proj is Identity here
    (tabular dim == multimodal dim)."""

    def __init__(self):
        super().__init__()
        self.encoder_imaging = TResNet18()
        self.encoder_tabular = TTabEnc()
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


def torch_mmatch_step(tm, img, tab, y_l, bank, probs_bank, ptr,
                      da_queue, da_ptr, k=K, lr=LR):
    """One reference MMatch training step + SGD(lr) update. Returns
    (logs, bank, probs_bank, ptr, da_queue, da_ptr); mutates tm."""
    tm.train()
    opt = torch.optim.SGD(tm.parameters(), lr=lr)

    om, oi, ot, x_m = tm(img, tab)
    feat_m = F.normalize(x_m.detach(), dim=1)
    feat_m_u = feat_m[B_L:]

    loss_ce = (F.cross_entropy(om[:B_L], y_l)
               + F.cross_entropy(oi[:B_L], y_l)
               + F.cross_entropy(ot[:B_L], y_l))

    with torch.no_grad():
        # distribution_alignment (MMatch.py:135-148)
        probs = torch.softmax(om[B_L:].detach(), dim=1)
        da_queue = da_queue.clone()
        da_queue[int(da_ptr)] = probs.mean(0)
        da_ptr = (int(da_ptr) + 1) % DA_LEN
        pseudo = probs / da_queue.mean(0)
        pseudo = pseudo / pseudo.sum(dim=1, keepdim=True)
        # memory smoothing after epoch 0 (:215-223)
        if EPOCH > 0:
            a = torch.exp(feat_m_u @ bank / TEMP)
            a = a / a.sum(dim=1, keepdim=True)
            pseudo = 0.9 * pseudo + 0.1 * (a @ probs_bank.t())
        max_prob, max_idx = pseudo.max(dim=1)
        mask1 = max_prob.ge(TH1)
        hard = F.one_hot(max_idx, NCLS).float()

    loss_i_u = (F.cross_entropy(oi[B_L:], hard, reduction="none")
                * mask1).mean()
    loss_t_u = (F.cross_entropy(ot[B_L:], hard, reduction="none")
                * mask1).mean()
    loss = ALPHA * loss_ce + LAM * (loss_i_u + loss_t_u)

    opt.zero_grad()
    loss.backward()
    opt.step()

    with torch.no_grad():
        # _dequeue_and_enqueue over the FULL batch, boundary-truncating
        pseudo_all = torch.cat([F.one_hot(y_l, NCLS).float(), pseudo])
        bank, probs_bank = bank.clone(), probs_bank.clone()
        bs = feat_m.shape[0]
        p = int(ptr)
        if p + bs > k:
            bs = k - p
        bank[:, p:p + bs] = feat_m[:bs].t()
        probs_bank[:, p:p + bs] = pseudo_all[:bs].t()
        ptr = (p + bs) % k

    f = lambda t: float(t.detach())
    return ({"loss": f(loss), "CEloss": f(loss_ce),
             "CEloss_unlabelled_i": f(loss_i_u),
             "CEloss_unlabelled_t": f(loss_t_u),
             "threshold1_ratio": float(mask1.float().mean())},
            bank, probs_bank, ptr, da_queue, da_ptr)


def test_mmatch_train_step_golden_vs_torch():
    torch.manual_seed(3)
    tm = TSemiBackbone()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(2)
    img_l = rng.rand(B_L, IMG, IMG, 3).astype(np.float32)
    img_u = rng.rand(B_U, IMG, IMG, 3).astype(np.float32)
    mk_tab = lambda n: np.concatenate(
        [np.stack([rng.randint(0, c, n) for c in CATS], 1),
         rng.randn(n, NCON)], 1).astype(np.float32)
    tab_l, tab_u = mk_tab(B_L), mk_tab(B_U)
    y_l = rng.randint(0, NCLS, B_L).astype(np.int64)
    y_u = rng.randint(0, NCLS, B_U).astype(np.int64)

    bank0 = rng.randn(PROJ, K).astype(np.float32)
    bank0 /= np.linalg.norm(bank0, axis=0, keepdims=True)
    probs_bank0 = rng.dirichlet(np.ones(NCLS), K).astype(np.float32).T
    da_queue0 = np.zeros((DA_LEN, NCLS), np.float32)
    da_queue0[:HIST_FILL] = rng.dirichlet(np.ones(NCLS), HIST_FILL)
    da_ptr0 = HIST_FILL

    # ---- our side -----------------------------------------------------
    field_lengths = list(CATS) + [1] * NCON
    cfg = _Cfg(
        algorithm_name="MMatch", eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=PROJ,
        tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
        tabular_transformer_num_layers=1, alpha=ALPHA, mmatch_lambda=LAM,
        th1=TH1, temperature=TEMP, start_epoch=0, DA=True,
        use_ema=False, eman=False, ema_momentum=0.99,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, crop_scale_lower=0.08, target="dvm",
        embedding_dropout=0.0, drop_rate=0.0)
    algo = MMatch(cfg, field_lengths, dtype=jnp.float32)
    algo.contrastive_views = lambda key, images, tabular, marginal: (
        images.astype(jnp.float32), tabular)
    algo.tx = optax.sgd(LR)

    state = algo.init_state(jax.random.key(0), jnp.asarray(img_l[:2]),
                            jnp.asarray(tab_l[:2]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sd = {"model." + k: v.numpy() for k, v in tm.state_dict().items()}
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers, leftovers
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        da=DAState(jnp.asarray(da_queue0),
                   jnp.asarray(da_ptr0, jnp.int32)),
        extra={"embed_queue": jnp.asarray(bank0),
               "probs_queue": jnp.asarray(probs_bank0),
               "ptr": jnp.asarray(PTR0, jnp.int32)})

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
    logs, bank_t, probs_bank_t, ptr_t, da_q_t, da_ptr_t = \
        torch_mmatch_step(
            tm, t(np.concatenate([img_l, img_u]).transpose(0, 3, 1, 2)),
            t(np.concatenate([tab_l, tab_u])), t(y_l),
            t(bank0), t(probs_bank0), PTR0,
            t(da_queue0), da_ptr0)

    # the threshold must actually split the batch for the test to bite
    assert 0.0 < logs["threshold1_ratio"] < 1.0

    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    # DA ring
    np.testing.assert_allclose(np.asarray(new_state.da.queue),
                               da_q_t.numpy(), rtol=1e-4, atol=1e-6)
    assert int(new_state.da.ptr) == da_ptr_t

    # memory bank: truncated ring write + pointer
    assert int(new_state.extra["ptr"]) == ptr_t
    np.testing.assert_allclose(np.asarray(new_state.extra["embed_queue"]),
                               bank_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.extra["probs_queue"]),
                               probs_bank_t.numpy(), rtol=1e-3, atol=1e-4)

    # student BN stats after the train-mode forward
    conv_student, _ = convert_torch_state_dict(
        {"model." + k: v.numpy() for k, v in tm.state_dict().items()},
        variables)
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


def test_mmatch_three_step_state_trajectory_vs_torch():
    """3-step state-machine trajectory vs the torch twin at lr=0 —
    completes the cross-step threading quartet (SimMatch bank / CoMatch
    rings / FreeMatch scalars / MMatch bank+DA). MMatch has no EMA: its
    cross-step state IS the memory-bank ring + the DA history, and the
    memory smoothing reads the *evolving* bank each step. K=24 with a
    full-batch enqueue of 16 exercises both ring paths over the run:
    boundary truncation (step 1: 10->24 writes 14 rows, step 3: 16->24
    writes 8) and a clean interior write (step 2: 0->16). BN running
    stats accumulate over 3 train-mode forwards on both sides."""
    steps = 3
    kq = 24          # bank size for this test (reference: 640)
    n_l = 12
    torch.manual_seed(7)
    tm = TSemiBackbone()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(44)
    imgs_l = rng.rand(n_l, IMG, IMG, 3).astype(np.float32)
    img_u = rng.rand(steps * B_U, IMG, IMG, 3).astype(np.float32)
    mk_tab = lambda n: np.concatenate(
        [np.stack([rng.randint(0, c, n) for c in CATS], 1),
         rng.randn(n, NCON)], 1).astype(np.float32)
    tabs_l, tab_u = mk_tab(n_l), mk_tab(steps * B_U)
    ys_l = rng.randint(0, NCLS, n_l).astype(np.int64)
    idx_steps = [rng.choice(n_l, B_L, replace=False).astype(np.int64)
                 for _ in range(steps)]

    bank0 = rng.randn(PROJ, kq).astype(np.float32)
    bank0 /= np.linalg.norm(bank0, axis=0, keepdims=True)
    probs_bank0 = rng.dirichlet(np.ones(NCLS), kq).astype(np.float32).T
    da_queue0 = np.zeros((DA_LEN, NCLS), np.float32)
    da_queue0[:HIST_FILL] = rng.dirichlet(np.ones(NCLS), HIST_FILL)
    da_ptr0 = HIST_FILL

    # ---- our side -----------------------------------------------------
    field_lengths = list(CATS) + [1] * NCON
    cfg = _Cfg(
        algorithm_name="MMatch", eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=PROJ,
        tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
        tabular_transformer_num_layers=1, alpha=ALPHA, mmatch_lambda=LAM,
        th1=TH1, temperature=TEMP, start_epoch=0, DA=True,
        use_ema=False, eman=False, ema_momentum=0.99,
        lr_eval=0.0, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, crop_scale_lower=0.08, target="dvm",
        embedding_dropout=0.0, drop_rate=0.0)
    algo = MMatch(cfg, field_lengths, dtype=jnp.float32)
    algo.contrastive_views = lambda key, images, tabular, marginal: (
        images.astype(jnp.float32), tabular)
    algo.tx = optax.sgd(0.0)

    state = algo.init_state(jax.random.key(0), jnp.asarray(imgs_l[:2]),
                            jnp.asarray(tabs_l[:2]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sd = {"model." + k: v.numpy() for k, v in tm.state_dict().items()}
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers, leftovers
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        da=DAState(jnp.asarray(da_queue0),
                   jnp.asarray(da_ptr0, jnp.int32)),
        extra={"embed_queue": jnp.asarray(bank0),
               "probs_queue": jnp.asarray(probs_bank0),
               "ptr": jnp.asarray(PTR0, jnp.int32)})

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.asarray(tabs_l),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((n_l,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.asarray(tab_u),
               "labels": jnp.zeros((steps * B_U,), jnp.int32),
               "labelled": jnp.zeros((steps * B_U,), bool)}
    step = algo.make_train_step()
    our_step_logs = []
    prev = {}
    for s in range(steps):
        state = step(state, cache_l, cache_u,
                     jnp.asarray(idx_steps[s], jnp.int32),
                     jnp.arange(s * B_U, (s + 1) * B_U, dtype=jnp.int32),
                     jnp.asarray(EPOCH, jnp.int32))
        sums = {k: float(v) for k, v in state.log_sums.items()}
        our_step_logs.append({k: sums[k] - prev.get(k, 0.0)
                              for k in sums})
        prev = sums

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    bank_t, probs_bank_t = t(bank0), t(probs_bank0)
    da_q_t, da_ptr_t, ptr_t = t(da_queue0), da_ptr0, PTR0
    ptr_trace, split_steps = [], 0
    for s in range(steps):
        u = slice(s * B_U, (s + 1) * B_U)
        logs, bank_t, probs_bank_t, ptr_t, da_q_t, da_ptr_t = \
            torch_mmatch_step(
                tm,
                t(np.concatenate([imgs_l[idx_steps[s]], img_u[u]]
                                 ).transpose(0, 3, 1, 2)),
                t(np.concatenate([tabs_l[idx_steps[s]], tab_u[u]])),
                t(ys_l[idx_steps[s]]), bank_t, probs_bank_t, ptr_t,
                da_q_t, da_ptr_t, k=kq, lr=0.0)
        ptr_trace.append(ptr_t)
        split_steps += 0.0 < logs["threshold1_ratio"] < 1.0
        for k, v in logs.items():
            np.testing.assert_allclose(
                our_step_logs[s][k], v, rtol=2e-3, atol=2e-4,
                err_msg=f"step {s} log {k}")
    # the trajectory must actually exercise both ring paths and a real
    # threshold split, or the test doesn't bite
    assert ptr_trace == [0, B_L + B_U, 0]
    assert split_steps >= 1

    # DA ring after 3 appended batch means
    np.testing.assert_allclose(np.asarray(state.da.queue),
                               da_q_t.numpy(), rtol=1e-4, atol=1e-6)
    assert int(state.da.ptr) == da_ptr_t

    # bank after truncation / interior / truncation writes
    assert int(state.extra["ptr"]) == ptr_t
    np.testing.assert_allclose(np.asarray(state.extra["embed_queue"]),
                               bank_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.extra["probs_queue"]),
                               probs_bank_t.numpy(), rtol=2e-3, atol=2e-4)

    # student BN stats after 3 train-mode forwards
    conv_student, _ = convert_torch_state_dict(
        {"model." + k: v.numpy() for k, v in tm.state_dict().items()},
        variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        state.batch_stats, conv_student["batch_stats"])
