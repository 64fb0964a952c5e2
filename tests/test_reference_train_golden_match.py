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
