"""Golden TRAIN-STEP parity for the Match/SemiMultimodal families
against the reference's OWN Lightning modules.

Companion to ``test_reference_train_golden.py`` (STiL): each test here
runs a REAL reference pl module — its ``training_step``,
``configure_optimizers`` (the actual torch.optim.Adam), and the
stateful machinery inside the model's ``forward`` (EMAN lerp, DA
queues, instance banks, memory queues) — for a multi-step f64
trajectory, and asserts our production step + optimizer reproduce the
logged losses per step, the bank/queue states, and the final
parameter / BN / EMAN state.

Unlike STiL, the Match-family forwards draw NO randomness at world
size 1 (no dropout in the imaging nets; the MoCo batch-shuffle is
commented out in the reference; DDP branches are dead on one
process), so no RNG replay is needed — augmentation is bypassed with
identity views on both sides and the steps are exactly comparable.

Parity targets:
- SimMatch: ``models/MatchModel/SimMatch.py:74-124`` (training_step)
  + ``simmatch_model.py:226-292`` (bank, DA, EMAN inside forward)
- CoMatch: ``models/MatchModel/CoMatch.py`` + ``comatch_model.py``
  (ring queues, hist_prob DA, memory-smoothed refinement)
- FreeMatch: ``models/MatchModel/FreeMatchFolder/*`` (SAT thresholds)
"""

import dataclasses
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stil_tta_tpu.train.convert import convert_torch_state_dict  # noqa: E402
from tests.test_reference_golden import _install_shims  # noqa: E402
from tests.test_reference_train_golden import _install_train_shims  # noqa: E402

pytestmark = pytest.mark.slow

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
DIM = 16
LR = 1e-3
WD = 1e-3
N_STEPS = 5
N_DATA = 24     # labeled-set size (= SimMatch bank K)


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    # reference forwards materialize fresh tensors at torch's DEFAULT
    # dtype (e.g. ``simmatch_model.py:278`` torch.zeros for the
    # c_smooth scatter_add) — raise it so .double() modules run
    # end-to-end f64
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)
    jax.config.update("jax_enable_x64", False)


def _identity_views(algo):
    ident = lambda k, im, apply_rate=1.0: im.astype(im.dtype)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    algo.aug_strong = ident


def _f64_tree(t):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)


def _sub_sd(tm, prefix):
    return {k[len(prefix):]: v.numpy() for k, v in tm.state_dict().items()
            if k.startswith(prefix)}


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)


def _rel_l2_tree(a, b, bound, what):
    fa = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree_util.tree_leaves(a)])
    fb = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree_util.tree_leaves(b)])
    rel = np.linalg.norm(fa - fb) / max(np.linalg.norm(fb), 1e-12)
    assert rel < bound, (what, rel)


def _tol(step_no):
    """Same rationale as test_reference_train_golden.tol: tight early
    steps pin semantics; Adam trajectories drift faster than SGD twins
    for tiny-gradient params."""
    if step_no <= 2:
        return 1e-4, 1e-4
    rel = min(3e-3 * 2.0 ** (step_no - 3), 3e-2)
    return rel, rel


class _Cfg(dict):
    __getattr__ = dict.get


def _synth_data(seed=0):
    rng = np.random.RandomState(seed)
    imgs_l = rng.rand(N_DATA, IMG, IMG, 3).astype(np.float64)
    ys_l = (np.arange(N_DATA) % NCLS).astype(np.int64)
    imgs_u = rng.rand(N_DATA, IMG, IMG, 3).astype(np.float64)
    ys_u = rng.randint(0, NCLS, N_DATA).astype(np.int64)
    return imgs_l, ys_l, imgs_u, ys_u


def test_simmatch_training_step_golden_trajectory(x64, tmp_path):
    _install_shims()
    _install_train_shims()
    from models.MatchModel.SimMatch import SimMatch as RefSimMatch
    from models.MatchModel.simmatch_model import ResNet as RefResNet
    from models.pieces import DotDict
    from stil_tta_tpu.algorithms.simmatch import SimMatch

    hp = DotDict({
        "model": "resnet18", "num_classes": NCLS, "embedding_dim": 512,
        "projection_dim": DIM, "K": N_DATA, "eval_datatype": "imaging",
        "ema_momentum": 0.9, "DA": True, "tt": 0.1, "st": 0.1,
        "c_smooth": 0.9, "sim_threshold": 0.3, "lambda_u": 1.0,
        "lambda_in": 0.5, "start_epoch": 0, "checkpoint": None,
        "finetune_strategy": "trainable", "lr_eval": LR,
        "weight_decay_eval": WD, "scheduler": "cosine",
        "dataset_length": 100, "cosine_anneal_mult": 1.0,
    })
    torch.manual_seed(4)
    tm = RefSimMatch(hp).double()
    # independent teacher (constructor copies student -> ema)
    torch.manual_seed(11)
    ref_teacher = RefResNet(hp, NCLS, out_channels=512, dim=DIM).double()
    tm.model.ema.load_state_dict(ref_teacher.state_dict())
    _randomize_bn(tm.model.main)
    _randomize_bn(tm.model.ema)

    imgs_l, ys_l, imgs_u, ys_u = _synth_data(0)
    rng = np.random.RandomState(1)
    bank0 = rng.randn(DIM, N_DATA).astype(np.float64)
    bank0 /= np.linalg.norm(bank0, axis=0, keepdims=True)
    bank_labels0 = rng.randint(0, NCLS, N_DATA).astype(np.int64)
    with torch.no_grad():
        tm.model.bank.copy_(torch.tensor(bank0))
        tm.model.labels.copy_(torch.tensor(bank_labels0))

    # ---- our side: production algorithm + production Adam ------------
    cfg = _Cfg(
        algorithm_name="SimMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM, K=N_DATA,
        sim_threshold=0.3, lambda_u=1.0, lambda_in=0.5, tt=0.1, st=0.1,
        c_smooth=0.9, start_epoch=0, ema_momentum=0.9, DA=True,
        use_ema=True, eman=True, lr_eval=LR, weight_decay_eval=WD,
        img_size=IMG, eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = SimMatch(cfg, [1], dtype=jnp.float64)
    _identity_views(algo)
    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(imgs_l[:2]),
                            jnp.zeros((2, 1), jnp.float64))
    variables = {"params": _f64_tree(state.params),
                 "batch_stats": _f64_tree(state.batch_stats)}
    converted, leftovers = convert_torch_state_dict(
        _sub_sd(tm, "model.main."), variables)
    assert not leftovers, leftovers[:5]
    conv_ema, _ = convert_torch_state_dict(_sub_sd(tm, "model.ema."),
                                           variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"bank": jnp.asarray(bank0),
               "bank_labels": jnp.asarray(bank_labels0, jnp.int32)},
        da=dataclasses.replace(
            state.da, queue=jnp.zeros((256, NCLS), jnp.float64)))

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.zeros((N_DATA, 1), jnp.float64),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((N_DATA,), bool)}
    cache_u = {"images": jnp.asarray(imgs_u),
               "tabular": jnp.zeros((N_DATA, 1), jnp.float64),
               "labels": jnp.asarray(ys_u),
               "labelled": jnp.zeros((N_DATA,), bool)}
    step = algo.make_train_step()

    # ---- the REAL Lightning optimization loop -------------------------
    opt = tm.configure_optimizers()["optimizer"]
    assert isinstance(opt, torch.optim.Adam)
    tm.current_epoch = 1

    idx_rs = np.random.RandomState(7)
    prev = {"loss": 0.0, "threshold1_ratio": 0.0}
    for i in range(N_STEPS):
        idx_l = idx_rs.choice(N_DATA, B_L, replace=False).astype(np.int32)
        idx_u = idx_rs.randint(0, N_DATA, B_U).astype(np.int32)
        state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                     jnp.asarray(idx_u), jnp.asarray(1, jnp.int32))

        t = lambda a: torch.tensor(np.asarray(a))
        img_x = t(imgs_l[idx_l].transpose(0, 3, 1, 2))
        img_u = t(imgs_u[idx_u].transpose(0, 3, 1, 2))
        batch = {"l": (img_x, t(ys_l[idx_l]), t(idx_l.astype(np.int64))),
                 "u": ((img_u, img_u), t(ys_u[idx_u]))}
        tm.logged.clear()
        opt.zero_grad()
        loss = tm.training_step(batch, 0)
        loss.backward()
        opt.step()

        rtol_i, atol_i = _tol(i)
        for ours_key, ref_key in (("loss", "multimodal.train.loss"),
                                  ("threshold1_ratio",
                                   "multimodal.train.threshold1_ratio")):
            ours = float(state.log_sums[ours_key]) - prev[ours_key]
            np.testing.assert_allclose(
                ours, tm.logged[ref_key], rtol=rtol_i, atol=atol_i,
                err_msg=f"step {i} log {ours_key}")
        prev = {k: float(state.log_sums[k]) for k in prev}

        # instance bank scatter at dataset indices, every step
        np.testing.assert_allclose(
            np.asarray(state.extra["bank"]), tm.model.bank.numpy(),
            rtol=rtol_i, atol=atol_i, err_msg=f"step {i} bank")
        np.testing.assert_array_equal(
            np.asarray(state.extra["bank_labels"]),
            tm.model.labels.numpy(), err_msg=f"step {i} bank labels")

    # DA queue (``simmatch_model.py:151-163``)
    np.testing.assert_allclose(np.asarray(state.da.queue),
                               tm.model.DA_queue.numpy(), rtol=2e-3,
                               atol=1e-6)
    assert int(state.da.ptr) == int(tm.model.DA_ptr) == N_STEPS

    conv_student, _ = convert_torch_state_dict(
        _sub_sd(tm, "model.main."), variables)
    _rel_l2_tree(state.params, conv_student["params"], 3e-3,
                 f"params after {N_STEPS} Adam steps")
    _rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 3e-3,
                 "BN running stats")
    conv_post, _ = convert_torch_state_dict(_sub_sd(tm, "model.ema."),
                                            variables)
    _rel_l2_tree(state.ema_params, conv_post["params"], 3e-3,
                 "EMAN teacher params")
    _rel_l2_tree(state.ema_batch_stats, conv_post["batch_stats"], 3e-3,
                 "EMAN teacher BN stats")


def test_comatch_training_step_golden_trajectory(x64, tmp_path):
    """5-step f64 trajectory against the REAL ``CoMatch`` pl module
    (``models/MatchModel/CoMatch.py`` training_step +
    ``comatch_model.py`` forward): params-only momentum lerp (:111-115),
    train-mode teacher BN (never eval()'d), DA over the hist_prob list
    (:270-284), memory-smoothed refinement (:287-293, epoch=1 >
    start_epoch=0 so it is LIVE from step 1), both circular queues with
    boundary truncation (:116-146; pointers seeded so BOTH queues
    truncate and wrap inside the 5 steps), and the real torch Adam.

    Teacher BN running stats are asserted on neither side: the
    reference's train-mode m_encoder mutates buffers it never reads
    (our step discards them, ``algorithms/comatch.py:107-117``), so the
    two implementations legitimately diverge on that dead state.
    """
    _install_shims()
    _install_train_shims()
    from models.MatchModel.CoMatch import CoMatch as RefCoMatch
    from models.MatchModel.comatch_model import ResNet as RefResNet
    from models.pieces import DotDict
    from stil_tta_tpu.algorithms.comatch import CoMatch

    K = 24
    THR, CONTRAST_TH = 0.25, 0.3
    LAM_U, LAM_C_MAX = 1.0, 5.0     # lam_c ramp: min(epoch+1, 5) = 2
    ALPHA, TEMP, MOM = 0.9, 0.1, 0.9

    hp = DotDict({
        "model": "resnet18", "num_classes": NCLS, "embedding_dim": 512,
        "projection_dim": DIM, "K": K, "eval_datatype": "imaging",
        "ema_momentum": MOM, "co_temperature": TEMP, "alpha": ALPHA,
        "co_threshold": THR, "contrast_th": CONTRAST_TH,
        "lam_c": LAM_C_MAX, "lam_u": LAM_U, "start_epoch": 0,
        "checkpoint": None, "finetune_strategy": "trainable",
        "lr_eval": LR, "weight_decay_eval": WD, "scheduler": "cosine",
        "dataset_length": 100, "cosine_anneal_mult": 1.0,
    })
    torch.manual_seed(5)
    tm = RefCoMatch(hp).double()
    # independent teacher (constructor copies student -> m_encoder)
    torch.manual_seed(12)
    ref_teacher = RefResNet(hp, NCLS, out_channels=512, dim=DIM).double()
    tm.model.m_encoder.load_state_dict(ref_teacher.state_dict())
    for p in tm.model.m_encoder.parameters():
        p.requires_grad = False
    _randomize_bn(tm.model.encoder)
    _randomize_bn(tm.model.m_encoder)

    imgs_l, ys_l, imgs_u, ys_u = _synth_data(3)
    rng = np.random.RandomState(2)
    norm_cols = lambda m: m / np.linalg.norm(m, axis=0, keepdims=True)
    qs0 = norm_cols(rng.randn(DIM, K))
    qw0 = rng.randn(DIM, K)
    pu0 = rng.rand(NCLS, K)
    pu0 /= pu0.sum(0, keepdims=True)
    pxu0 = rng.rand(NCLS, K)
    pxu0 /= pxu0.sum(0, keepdims=True)
    # 's' enqueues B_U=12/step, 'w' B_L+B_U=16/step: these starts make
    # both queues hit the ptr+batch > K truncation AND wrap to 0
    PTR_S, PTR_W = 8, 6
    with torch.no_grad():
        tm.model.queue_s.copy_(torch.tensor(qs0))
        tm.model.probs_u.copy_(torch.tensor(pu0))
        tm.model.queue_w.copy_(torch.tensor(qw0))
        tm.model.probs_xu.copy_(torch.tensor(pxu0))
        tm.model.queue_ptr_s[0] = PTR_S
        tm.model.queue_ptr_w[0] = PTR_W

    # ---- our side: production algorithm + production Adam ------------
    cfg = _Cfg(
        algorithm_name="CoMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM, K=K,
        co_threshold=THR, contrast_th=CONTRAST_TH, lam_u=LAM_U,
        lam_c=LAM_C_MAX, alpha=ALPHA, co_temperature=TEMP,
        start_epoch=0, ema_momentum=MOM, use_ema=True,
        lr_eval=LR, weight_decay_eval=WD, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = CoMatch(cfg, [1], dtype=jnp.float64)
    _identity_views(algo)
    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(imgs_l[:2]),
                            jnp.zeros((2, 1), jnp.float64))
    variables = {"params": _f64_tree(state.params),
                 "batch_stats": _f64_tree(state.batch_stats)}
    converted, leftovers = convert_torch_state_dict(
        _sub_sd(tm, "model.encoder."), variables)
    assert not leftovers, leftovers[:5]
    conv_ema, _ = convert_torch_state_dict(
        _sub_sd(tm, "model.m_encoder."), variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"queue_s": jnp.asarray(qs0), "probs_u": jnp.asarray(pu0),
               "queue_w": jnp.asarray(qw0), "probs_xu": jnp.asarray(pxu0),
               "ptr_s": jnp.asarray(PTR_S, jnp.int32),
               "ptr_w": jnp.asarray(PTR_W, jnp.int32),
               "hist_prob": jnp.zeros((128, NCLS), jnp.float64),
               "hist_len": jnp.asarray(0, jnp.int32),
               "hist_ptr": jnp.asarray(0, jnp.int32)})

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.zeros((N_DATA, 1), jnp.float64),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((N_DATA,), bool)}
    cache_u = {"images": jnp.asarray(imgs_u),
               "tabular": jnp.zeros((N_DATA, 1), jnp.float64),
               "labels": jnp.asarray(ys_u),
               "labelled": jnp.zeros((N_DATA,), bool)}
    step = algo.make_train_step()

    # ---- the REAL Lightning optimization loop -------------------------
    opt = tm.configure_optimizers()["optimizer"]
    assert isinstance(opt, torch.optim.Adam)
    tm.current_epoch = 1   # > start_epoch: full loss + live smoothing

    idx_rs = np.random.RandomState(9)
    prev = {"loss": 0.0, "threshold1_ratio": 0.0}
    for i in range(N_STEPS):
        idx_l = idx_rs.choice(N_DATA, B_L, replace=False).astype(np.int32)
        idx_u = idx_rs.randint(0, N_DATA, B_U).astype(np.int32)
        state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                     jnp.asarray(idx_u), jnp.asarray(1, jnp.int32))

        t = lambda a: torch.tensor(np.asarray(a))
        img_x = t(imgs_l[idx_l].transpose(0, 3, 1, 2))
        img_u = t(imgs_u[idx_u].transpose(0, 3, 1, 2))
        batch = {"l": (img_x, t(ys_l[idx_l]), t(idx_l.astype(np.int64))),
                 "u": ((img_u, img_u, img_u), t(ys_u[idx_u]))}
        tm.logged.clear()
        opt.zero_grad()
        loss = tm.training_step(batch, 0)
        loss.backward()
        opt.step()

        rtol_i, atol_i = _tol(i)
        for ours_key, ref_key in (("loss", "multimodal.train.loss"),
                                  ("threshold1_ratio",
                                   "multimodal.train.threshold1_ratio")):
            ours = float(state.log_sums[ours_key]) - prev[ours_key]
            np.testing.assert_allclose(
                ours, tm.logged[ref_key], rtol=rtol_i, atol=atol_i,
                err_msg=f"step {i} log {ours_key}")
        prev = {k: float(state.log_sums[k]) for k in prev}

        ex = state.extra
        assert int(ex["ptr_s"]) == int(tm.model.queue_ptr_s), f"step {i}"
        assert int(ex["ptr_w"]) == int(tm.model.queue_ptr_w), f"step {i}"
        for ours_key, buf in (("queue_s", tm.model.queue_s),
                              ("probs_u", tm.model.probs_u),
                              ("queue_w", tm.model.queue_w),
                              ("probs_xu", tm.model.probs_xu)):
            np.testing.assert_allclose(
                np.asarray(ex[ours_key]), buf.numpy(), rtol=rtol_i,
                atol=atol_i, err_msg=f"step {i} {ours_key}")

    # DA history: ring slots 0..N-1 == the reference's list entries
    assert int(state.extra["hist_len"]) == len(tm.model.hist_prob) \
        == N_STEPS
    np.testing.assert_allclose(
        np.asarray(state.extra["hist_prob"][:N_STEPS]),
        torch.stack(tm.model.hist_prob).numpy(), rtol=3e-3, atol=1e-6)

    conv_student, _ = convert_torch_state_dict(
        _sub_sd(tm, "model.encoder."), variables)
    _rel_l2_tree(state.params, conv_student["params"], 3e-3,
                 f"params after {N_STEPS} Adam steps")
    _rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 3e-3,
                 "student BN running stats")
    conv_post, _ = convert_torch_state_dict(
        _sub_sd(tm, "model.m_encoder."), variables)
    _rel_l2_tree(state.ema_params, conv_post["params"], 3e-3,
                 "momentum teacher params")


def test_freematch_training_step_golden_trajectory(x64, tmp_path):
    """5-step f64 trajectory against the REAL ``FreeMatch`` pl module
    (``FreeMatchFolder/FreeMatch.py`` training_step +
    ``freematch_model.py``): state-dict EMA teacher run in eval mode
    (:107-118, :185-190), the three self-adaptive scalars updated at
    the hardcoded m=0.999 inside ``masking`` (:127-165), SAT mask
    ``max_prob >= time_p * p_model[argmax]/max(p_model)``, hard one-hot
    pseudo-labels, the fairness entropy loss on the masked subset
    (``freematch_utils.entropy_loss``), and the real torch Adam.
    Scalars are seeded to a non-uniform state so the m=0.999 EMA
    compounding is visible within 5 steps.

    Weight decay is 0 in THIS family's golden run (the others pin
    torch's coupled L2): FreeMatch is the one reference family whose
    projection head is dead in the train graph — ``forward`` discards
    the student's embedding (``freematch_model.py:181`` ``logits_q, _ =
    self.main(...)``) and never uses the teacher's ``feat_k`` — so
    torch autograd leaves those params with ``grad=None`` and torch
    Adam SKIPS them (no decay, no moments), while our uniform optimizer
    applies coupled L2 to their zero gradients. Under wd>0 the dead
    head drifts by lr·wd-scale per step on our side only; functionally
    irrelevant (the head influences no output), ledgered in PARITY.md.
    """
    _install_shims()
    _install_train_shims()
    from models.MatchModel.FreeMatchFolder.FreeMatch import \
        FreeMatch as RefFreeMatch
    from models.MatchModel.FreeMatchFolder.freematch_model import \
        ResNet as RefResNet
    from models.pieces import DotDict
    from stil_tta_tpu.algorithms.freematch import FreeMatch

    LAMBDA_U, LAMBDA_E = 1.0, 0.1
    MOM = 0.9

    hp = DotDict({
        "model": "resnet18", "num_classes": NCLS, "embedding_dim": 512,
        "projection_dim": DIM, "eval_datatype": "imaging",
        "ema_momentum": MOM, "lambda_u": LAMBDA_U, "lambda_e": LAMBDA_E,
        "start_epoch": 0, "checkpoint": None,
        "finetune_strategy": "trainable", "lr_eval": LR,
        "weight_decay_eval": 0.0, "scheduler": "cosine",
        "dataset_length": 100, "cosine_anneal_mult": 1.0,
    })
    torch.manual_seed(6)
    tm = RefFreeMatch(hp).double()
    torch.manual_seed(13)
    ref_teacher = RefResNet(hp, NCLS, out_channels=512, dim=DIM).double()
    tm.model.ema.load_state_dict(ref_teacher.state_dict())
    for p in tm.model.ema.parameters():
        p.requires_grad = False
    _randomize_bn(tm.model.main)
    _randomize_bn(tm.model.ema)

    rng = np.random.RandomState(4)
    p_model0 = rng.rand(NCLS) + 0.2
    p_model0 /= p_model0.sum()
    label_hist0 = rng.rand(NCLS) + 0.2
    label_hist0 /= label_hist0.sum()
    time_p0 = 0.3
    tm.model.p_model = torch.tensor(p_model0)
    tm.model.label_hist = torch.tensor(label_hist0)
    tm.model.time_p = torch.tensor(time_p0)

    imgs_l, ys_l, imgs_u, ys_u = _synth_data(5)

    # ---- our side: production algorithm + production Adam ------------
    cfg = _Cfg(
        algorithm_name="FreeMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM,
        lambda_u=LAMBDA_U, lambda_e=LAMBDA_E, start_epoch=0,
        ema_momentum=MOM, use_ema=True, eman=True,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = FreeMatch(cfg, [1], dtype=jnp.float64)
    _identity_views(algo)
    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(imgs_l[:2]),
                            jnp.zeros((2, 1), jnp.float64))
    variables = {"params": _f64_tree(state.params),
                 "batch_stats": _f64_tree(state.batch_stats)}
    converted, leftovers = convert_torch_state_dict(
        _sub_sd(tm, "model.main."), variables)
    assert not leftovers, leftovers[:5]
    conv_ema, _ = convert_torch_state_dict(_sub_sd(tm, "model.ema."),
                                           variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"p_model": jnp.asarray(p_model0),
               "label_hist": jnp.asarray(label_hist0),
               "time_p": jnp.asarray(time_p0, jnp.float64)})

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.zeros((N_DATA, 1), jnp.float64),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((N_DATA,), bool)}
    cache_u = {"images": jnp.asarray(imgs_u),
               "tabular": jnp.zeros((N_DATA, 1), jnp.float64),
               "labels": jnp.asarray(ys_u),
               "labelled": jnp.zeros((N_DATA,), bool)}
    step = algo.make_train_step()

    # ---- the REAL Lightning optimization loop -------------------------
    opt = tm.configure_optimizers()["optimizer"]
    assert isinstance(opt, torch.optim.Adam)
    tm.current_epoch = 1

    idx_rs = np.random.RandomState(8)
    prev = {"loss": 0.0, "threshold1_ratio": 0.0}
    for i in range(N_STEPS):
        idx_l = idx_rs.choice(N_DATA, B_L, replace=False).astype(np.int32)
        idx_u = idx_rs.randint(0, N_DATA, B_U).astype(np.int32)
        state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                     jnp.asarray(idx_u), jnp.asarray(1, jnp.int32))

        t = lambda a: torch.tensor(np.asarray(a))
        img_x = t(imgs_l[idx_l].transpose(0, 3, 1, 2))
        img_u = t(imgs_u[idx_u].transpose(0, 3, 1, 2))
        batch = {"l": (img_x, t(ys_l[idx_l]), t(idx_l.astype(np.int64))),
                 "u": ((img_u, img_u), t(ys_u[idx_u]))}
        tm.logged.clear()
        opt.zero_grad()
        loss = tm.training_step(batch, 0)
        loss.backward()
        opt.step()

        rtol_i, atol_i = _tol(i)
        for ours_key, ref_key in (("loss", "multimodal.train.loss"),
                                  ("threshold1_ratio",
                                   "multimodal.train.threshold1_ratio")):
            ours = float(state.log_sums[ours_key]) - prev[ours_key]
            np.testing.assert_allclose(
                ours, tm.logged[ref_key], rtol=rtol_i, atol=atol_i,
                err_msg=f"step {i} log {ours_key}")
        prev = {k: float(state.log_sums[k]) for k in prev}

        # the three self-adaptive scalars, every step
        for ours_key, ref_val in (
                ("p_model", tm.model.p_model),
                ("label_hist", tm.model.label_hist),
                ("time_p", tm.model.time_p)):
            np.testing.assert_allclose(
                np.asarray(state.extra[ours_key]), ref_val.numpy(),
                rtol=rtol_i, atol=atol_i,
                err_msg=f"step {i} {ours_key}")

    conv_student, _ = convert_torch_state_dict(
        _sub_sd(tm, "model.main."), variables)
    _rel_l2_tree(state.params, conv_student["params"], 3e-3,
                 f"params after {N_STEPS} Adam steps")
    _rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 3e-3,
                 "student BN running stats")
    conv_post, _ = convert_torch_state_dict(_sub_sd(tm, "model.ema."),
                                            variables)
    _rel_l2_tree(state.ema_params, conv_post["params"], 3e-3,
                 "EMA teacher params")
    _rel_l2_tree(state.ema_batch_stats, conv_post["batch_stats"], 3e-3,
                 "EMA teacher BN stats (state-dict lerp)")


def test_mmatch_training_step_golden_trajectory(x64, tmp_path):
    """5-step f64 trajectory against the REAL ``MMatch`` pl module
    (``models/SemiMultimodal/MMatch.py`` training_step :191-262 on the
    real 3-head ``Multimodal_model.MultimodalBackbone``): labeled CE on
    all three heads, DA ring (:135-148), memory-smoothed pseudo-labels
    after epoch 0 (:215-223), masked hard-label CE on the imaging +
    tabular heads, the K=640 bank enqueue over the FULL batch with
    boundary truncation (:101-117; pointer seeded at 630 so step 1
    truncates and wraps), and the real torch Adam. No teacher in this
    family (``self.ema`` is never constructed; ``momentum_update_ema``
    is dead code).
    """
    _install_shims()
    _install_train_shims()
    from models.SemiMultimodal.MMatch import MMatch as RefMMatch
    from models.pieces import DotDict
    from stil_tta_tpu.algorithms.mmatch import MMatch

    CATS, NCON = (5, 4, 2), 3
    FIELD_LENGTHS = list(CATS) + [1] * NCON
    K = 640           # hardcoded in the reference (MMatch.py:52)
    PTR0 = 630        # 630+16 > 640: step-1 enqueue truncates + wraps
    TH1, TEMP, MM_ALPHA, LAM = 0.3, 0.1, 1.0, 0.5
    DA_LEN = 256

    fl_path = tmp_path / "field_lengths.pt"
    torch.save(torch.tensor(FIELD_LENGTHS), str(fl_path))
    hp = DotDict({
        "model": "resnet18", "num_classes": NCLS, "embedding_dim": 512,
        "projection_dim": DIM, "multimodal_embedding_dim": DIM,
        "tabular_embedding_dim": DIM, "tabular_transformer_num_layers": 1,
        "embedding_dropout": 0.0, "drop_rate": 0.0, "pretrain": False,
        "checkpoint": None, "field_lengths_tabular": str(fl_path),
        "alpha": MM_ALPHA, "beta": 0.0, "gamma": 0.0, "rate_uce": 1.0,
        "mmatch_lambda": LAM, "th1": TH1, "th2": 0.5,
        "temperature": TEMP, "prototype_momentum": 0.99,
        "rate_pseudo": 0.5, "start_epoch": 0, "th_contrast": 0.8,
        "DA": True, "img_size": IMG, "finetune_strategy": "trainable",
        "pretrained_model": "TIP", "lr_eval": LR,
        "weight_decay_eval": WD, "scheduler": "cosine",
        "dataset_length": 100, "cosine_anneal_mult": 1.0,
    })
    torch.manual_seed(7)
    tm = RefMMatch(hp).double()
    _randomize_bn(tm.model)

    rng = np.random.RandomState(6)
    imgs_l = rng.rand(N_DATA, IMG, IMG, 3).astype(np.float64)
    imgs_u = rng.rand(N_DATA, IMG, IMG, 3).astype(np.float64)
    mk_tab = lambda n: np.concatenate(
        [np.stack([rng.randint(0, c, n) for c in CATS], 1),
         rng.randn(n, NCON)], 1).astype(np.float64)
    tabs_l, tabs_u = mk_tab(N_DATA), mk_tab(N_DATA)
    ys_l = (np.arange(N_DATA) % NCLS).astype(np.int64)
    ys_u = rng.randint(0, NCLS, N_DATA).astype(np.int64)

    bank0 = rng.randn(DIM, K)
    bank0 /= np.linalg.norm(bank0, axis=0, keepdims=True)
    probs_bank0 = rng.dirichlet(np.ones(NCLS), K).T
    with torch.no_grad():
        tm.embed_queue.copy_(torch.tensor(bank0))
        tm.probs_queue.copy_(torch.tensor(probs_bank0))
        tm.embed_queue_ptr[0] = PTR0

    # ---- our side: production algorithm + production Adam ------------
    cfg = _Cfg(
        algorithm_name="MMatch", eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=DIM,
        tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
        tabular_transformer_num_layers=1, alpha=MM_ALPHA,
        mmatch_lambda=LAM, th1=TH1, temperature=TEMP, start_epoch=0,
        DA=True, use_ema=False, eman=False, ema_momentum=0.99,
        lr_eval=LR, weight_decay_eval=WD, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, crop_scale_lower=0.08, target="dvm",
        embedding_dropout=0.0, drop_rate=0.0)
    algo = MMatch(cfg, FIELD_LENGTHS, dtype=jnp.float64)
    algo.contrastive_views = lambda key, images, tabular, marginal: (
        images.astype(jnp.float64), tabular)
    state = algo.init_state(jax.random.key(0), jnp.asarray(imgs_l[:2]),
                            jnp.asarray(tabs_l[:2]))
    variables = {"params": _f64_tree(state.params),
                 "batch_stats": _f64_tree(state.batch_stats)}
    sd = {"model." + k: v.numpy() for k, v in tm.model.state_dict().items()}
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers, leftovers[:5]
    from stil_tta_tpu.algorithms.base import DAState
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        da=DAState(jnp.zeros((DA_LEN, NCLS), jnp.float64),
                   jnp.asarray(0, jnp.int32)),
        extra={"embed_queue": jnp.asarray(bank0),
               "probs_queue": jnp.asarray(probs_bank0),
               "ptr": jnp.asarray(PTR0, jnp.int32)})

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.asarray(tabs_l),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((N_DATA,), bool)}
    cache_u = {"images": jnp.asarray(imgs_u),
               "tabular": jnp.asarray(tabs_u),
               "labels": jnp.asarray(ys_u),
               "labelled": jnp.zeros((N_DATA,), bool)}
    step = algo.make_train_step()

    # ---- the REAL Lightning optimization loop -------------------------
    opt = tm.configure_optimizers()["optimizer"]
    assert isinstance(opt, torch.optim.Adam)
    tm.current_epoch = 1

    idx_rs = np.random.RandomState(10)
    prev = {"loss": 0.0, "CEloss_unlabelled_i": 0.0,
            "CEloss_unlabelled_t": 0.0, "threshold1_ratio": 0.0}
    for i in range(N_STEPS):
        idx_l = idx_rs.choice(N_DATA, B_L, replace=False).astype(np.int32)
        idx_u = idx_rs.randint(0, N_DATA, B_U).astype(np.int32)
        state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                     jnp.asarray(idx_u), jnp.asarray(1, jnp.int32))

        t = lambda a: torch.tensor(np.asarray(a))
        im_l = t(imgs_l[idx_l].transpose(0, 3, 1, 2))
        im_u = t(imgs_u[idx_u].transpose(0, 3, 1, 2))
        # views[1] is the augmented view the step consumes (:203)
        batch = {"l": ([im_l, im_l], [t(tabs_l[idx_l])] * 2,
                       t(ys_l[idx_l]), None, torch.ones(B_L)),
                 "u": ([im_u, im_u], [t(tabs_u[idx_u])] * 2,
                       t(ys_u[idx_u]), None, torch.zeros(B_U))}
        tm.logged.clear()
        opt.zero_grad()
        loss = tm.training_step(batch, 0)
        loss.backward()
        opt.step()

        rtol_i, atol_i = _tol(i)
        for key in prev:
            ours = float(state.log_sums[key]) - prev[key]
            np.testing.assert_allclose(
                ours, tm.logged[f"multimodal.train.{key}"
                                if key != "threshold1_ratio"
                                else "multimodal.train.threshold1_ratio"],
                rtol=rtol_i, atol=atol_i, err_msg=f"step {i} log {key}")
        prev = {k: float(state.log_sums[k]) for k in prev}

        ex = state.extra
        assert int(ex["ptr"]) == int(tm.embed_queue_ptr), f"step {i}"
        np.testing.assert_allclose(
            np.asarray(ex["embed_queue"]), tm.embed_queue.numpy(),
            rtol=rtol_i, atol=atol_i, err_msg=f"step {i} embed_queue")
        np.testing.assert_allclose(
            np.asarray(ex["probs_queue"]), tm.probs_queue.numpy(),
            rtol=rtol_i, atol=atol_i, err_msg=f"step {i} probs_queue")

    # DA ring
    np.testing.assert_allclose(np.asarray(state.da.queue),
                               tm.DA_queue.numpy(), rtol=3e-3, atol=1e-6)
    assert int(state.da.ptr) == int(tm.DA_ptr) == N_STEPS

    conv_student, _ = convert_torch_state_dict(sd, variables)
    _rel_l2_tree(state.params, conv_student["params"], 3e-3,
                 f"params after {N_STEPS} Adam steps")
    _rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 3e-3,
                 "BN running stats")


def _run_cotrain_golden_trajectory(saint, tmp_path):
    """5-step f64 trajectory against the REAL ``CoTraining`` pl module
    (``models/SemiMultimodal/CoTraining.py`` training_step :112-174 on
    the real 3-head backbone): EMAN teacher (state-dict lerp incl. BN
    running stats, :91-108) run in EVAL mode, cross-modal pseudo-labels
    (imaging head supervises tabular and vice versa) soft-CE masked at
    ``co_threshold``, and the real torch Adam.

    ``saint=True`` runs the diff-identical ``CoTraining_SAINT.py``
    (backbone import swap only, SURVEY.md §2.5) on the real
    ``Multimodal_model_SAINT.MultimodalBackbone`` — SAINT's intersample
    attention inside the TRAIN graph, the 32-wide CLS feeding the
    tabular classifier through an Identity tabular_proj, and the EMAN
    state-dict lerp over the SAINT parameter set; SAINT's hard-coded
    0.8 dropouts run disabled on both sides (``_disable_dropout`` /
    ``saint_ff_dropout=0``)."""
    _install_shims()
    _install_train_shims()
    if saint:
        from models.SemiMultimodal.CoTraining_SAINT import (
            CoTraining as RefCoTrain)
        from models.SemiMultimodal.Multimodal_model_SAINT import (
            MultimodalBackbone)
        from stil_tta_tpu.algorithms.cotrain import CoTrainSAINT as CoTrain
    else:
        from models.SemiMultimodal.CoTraining import (
            CoTraining as RefCoTrain)
        from models.SemiMultimodal.Multimodal_model import (
            MultimodalBackbone)
        from stil_tta_tpu.algorithms.cotrain import CoTrain
    from models.pieces import DotDict
    from tests.test_reference_train_golden import _disable_dropout
    # SAINT hardcodes its token dim to 32; Identity tabular_proj needs
    # multimodal dim == 32 on both sides (the transformer variant keeps
    # the file-level DIM)
    EMB = 32 if saint else DIM

    CATS, NCON = (5, 4, 2), 3
    FIELD_LENGTHS = list(CATS) + [1] * NCON
    THRESHOLD, CT_ALPHA, RATE_UCE, MOM = 0.3, 1.0, 1.0, 0.9

    fl_path = tmp_path / "field_lengths.pt"
    torch.save(torch.tensor(FIELD_LENGTHS), str(fl_path))
    hp = DotDict({
        "model": "resnet18", "num_classes": NCLS, "embedding_dim": 512,
        "projection_dim": DIM, "multimodal_embedding_dim": EMB,
        "tabular_embedding_dim": EMB, "tabular_transformer_num_layers": 1,
        "embedding_dropout": 0.0, "drop_rate": 0.0, "pretrain": False,
        "checkpoint": None, "checkpoint_SAINT": None,
        "field_lengths_tabular": str(fl_path),
        "alpha": CT_ALPHA, "rate_uce": RATE_UCE,
        "co_threshold": THRESHOLD, "start_epoch": 0,
        "use_ema": True, "eman": True, "ema_momentum": MOM,
        "img_size": IMG, "finetune_strategy": "trainable",
        "pretrained_model": "TIP", "lr_eval": LR,
        "weight_decay_eval": WD, "scheduler": "cosine",
        "dataset_length": 100, "cosine_anneal_mult": 1.0,
    })
    torch.manual_seed(8)
    tm = RefCoTrain(hp).double()
    torch.manual_seed(15)
    ref_teacher = MultimodalBackbone(hp).double()
    tm.ema.load_state_dict(ref_teacher.state_dict())
    for p in tm.ema.parameters():
        p.requires_grad = False
    _randomize_bn(tm.model)
    _randomize_bn(tm.ema)
    _disable_dropout(tm)

    rng = np.random.RandomState(7)
    imgs_l = rng.rand(N_DATA, IMG, IMG, 3).astype(np.float64)
    imgs_u = rng.rand(N_DATA, IMG, IMG, 3).astype(np.float64)
    mk_tab = lambda n: np.concatenate(
        [np.stack([rng.randint(0, c, n) for c in CATS], 1),
         rng.randn(n, NCON)], 1).astype(np.float64)
    tabs_l, tabs_u = mk_tab(N_DATA), mk_tab(N_DATA)
    ys_l = (np.arange(N_DATA) % NCLS).astype(np.int64)
    ys_u = rng.randint(0, NCLS, N_DATA).astype(np.int64)

    # ---- our side: production algorithm + production Adam ------------
    cfg = _Cfg(
        algorithm_name="CoTrain_Pseudo_SAINT" if saint
        else "CoTrain_Pseudo",
        eval_datatype="imaging_and_tabular",
        model="resnet18", num_classes=NCLS, projection_dim=DIM,
        tabular_embedding_dim=EMB, multimodal_embedding_dim=EMB,
        tabular_transformer_num_layers=1, alpha=CT_ALPHA,
        rate_uce=RATE_UCE, co_threshold=THRESHOLD, start_epoch=0,
        DA=False, use_ema=True, eman=True, ema_momentum=MOM,
        lr_eval=LR, weight_decay_eval=WD, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, crop_scale_lower=0.08, target="dvm",
        embedding_dropout=0.0, drop_rate=0.0, saint_ff_dropout=0.0)
    algo = CoTrain(cfg, FIELD_LENGTHS, dtype=jnp.float64)
    algo.contrastive_views = lambda key, images, tabular, marginal: (
        images.astype(jnp.float64), tabular)
    state = algo.init_state(jax.random.key(0), jnp.asarray(imgs_l[:2]),
                            jnp.asarray(tabs_l[:2]))
    variables = {"params": _f64_tree(state.params),
                 "batch_stats": _f64_tree(state.batch_stats)}
    sd = {"model." + k: v.numpy() for k, v in tm.model.state_dict().items()}
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers, leftovers[:5]
    sd_ema = {"model." + k: v.numpy() for k, v in tm.ema.state_dict().items()}
    conv_ema, _ = convert_torch_state_dict(sd_ema, variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"])

    cache_l = {"images": jnp.asarray(imgs_l),
               "tabular": jnp.asarray(tabs_l),
               "labels": jnp.asarray(ys_l),
               "labelled": jnp.ones((N_DATA,), bool)}
    cache_u = {"images": jnp.asarray(imgs_u),
               "tabular": jnp.asarray(tabs_u),
               "labels": jnp.asarray(ys_u),
               "labelled": jnp.zeros((N_DATA,), bool)}
    step = algo.make_train_step()

    # ---- the REAL Lightning optimization loop -------------------------
    opt = tm.configure_optimizers()["optimizer"]
    assert isinstance(opt, torch.optim.Adam)
    tm.current_epoch = 1

    idx_rs = np.random.RandomState(11)
    LOGS = ("loss", "CEloss_unlabelled_i", "CEloss_unlabelled_t",
            "threshold_i_ratio", "threshold_t_ratio")
    prev = {k: 0.0 for k in LOGS}
    for i in range(N_STEPS):
        idx_l = idx_rs.choice(N_DATA, B_L, replace=False).astype(np.int32)
        idx_u = idx_rs.randint(0, N_DATA, B_U).astype(np.int32)
        state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                     jnp.asarray(idx_u), jnp.asarray(1, jnp.int32))

        t = lambda a: torch.tensor(np.asarray(a))
        im_l = t(imgs_l[idx_l].transpose(0, 3, 1, 2))
        im_u = t(imgs_u[idx_u].transpose(0, 3, 1, 2))
        batch = {"l": ([im_l, im_l], [t(tabs_l[idx_l])] * 2,
                       t(ys_l[idx_l]), None, torch.ones(B_L)),
                 "u": ([im_u, im_u], [t(tabs_u[idx_u])] * 2,
                       t(ys_u[idx_u]), None, torch.zeros(B_U))}
        tm.logged.clear()
        opt.zero_grad()
        loss = tm.training_step(batch, 0)
        loss.backward()
        opt.step()

        rtol_i, atol_i = _tol(i)
        for key in LOGS:
            ours = float(state.log_sums[key]) - prev[key]
            np.testing.assert_allclose(
                ours, tm.logged[f"multimodal.train.{key}"],
                rtol=rtol_i, atol=atol_i, err_msg=f"step {i} log {key}")
        prev = {k: float(state.log_sums[k]) for k in prev}

    conv_student, _ = convert_torch_state_dict(sd, variables)
    _rel_l2_tree(state.params, conv_student["params"], 3e-3,
                 f"params after {N_STEPS} Adam steps")
    _rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 3e-3,
                 "BN running stats")
    conv_post, _ = convert_torch_state_dict(
        {"model." + k: v.numpy() for k, v in tm.ema.state_dict().items()},
        variables)
    _rel_l2_tree(state.ema_params, conv_post["params"], 3e-3,
                 "EMAN teacher params")
    _rel_l2_tree(state.ema_batch_stats, conv_post["batch_stats"], 3e-3,
                 "EMAN teacher BN stats (state-dict lerp)")


def test_cotrain_training_step_golden_trajectory(x64, tmp_path):
    _run_cotrain_golden_trajectory(False, tmp_path)


def test_cotrain_saint_training_step_golden_trajectory(x64, tmp_path):
    """CoTrain_Pseudo_SAINT against the reference's own
    ``CoTraining_SAINT.py`` + ``Multimodal_model_SAINT`` backbone."""
    _run_cotrain_golden_trajectory(True, tmp_path)
