"""Golden TRAIN-STEP parity against the reference's OWN training code.

``tests/test_reference_golden.py`` removed the twin-fidelity trust
assumption for eval forwards; this file removes it for the training
step itself: it runs the REAL ``STiLModel`` from
``/root/reference/models/Disentangle/STiLModel.py`` — its
``training_step`` (:228-386), ``momentum_update_ema`` (:150-168),
``distribution_alignment`` (:171-180), ``configure_optimizers``
(:557-578, the actual torch.optim.Adam), and ``training_epoch_end``
(:389-421, prototype refresh) — for a multi-step trajectory with DA on,
and asserts our production step + optimizer reproduce every logged loss
per step, the DA queue, the prototype accumulators, and the final
parameter / BN / EMAN-teacher state.

The reference is import-blocked only by packages absent from this
container; each gets a minimal stand-in pinned to the version the
reference's ``environment.yaml`` declares:

- ``pytorch_lightning`` (1.6.4): ``LightningModule`` reduced to an
  ``nn.Module`` with ``save_hyperparameters`` / ``log`` (captured into
  a dict so the test can read every logged loss) / ``print`` /
  ``current_epoch``. Lightning's automatic optimization —
  ``zero_grad(); loss = training_step(...); loss.backward();
  opt.step()`` — is replayed literally in the loop below.
- ``torchmetrics`` (0.11.0): inert ``Accuracy``/``AUROC`` (their values
  are asserted elsewhere, ``tests/test_metrics.py``); they carry no
  state_dict entries, so weight conversion is unaffected.
- ``lightly`` (1.2.22): ``SimCLRProjectionHead`` — in 1.2.22 this is
  ``ProjectionHead([(in, hidden, None, ReLU), (hidden, out, None,
  None)])`` = ``layers`` Sequential(Linear, ReLU, Linear), both
  Linears with bias (no batch norm; BN arrived in later lightly).
- ``pl_bolts``: only the 'anneal' scheduler branch imports it; the
  test uses the reference's 'cosine' branch (torch-native).
- ``torch.distributed``: ``distribution_alignment`` calls
  ``all_reduce``/``get_world_size`` unconditionally; a single-process
  gloo group makes those real (identity at world size 1); if gloo is
  unavailable they are patched to the world-size-1 identity.

Harness-level divergences (same policy as every other parity test):
dropout is disabled on BOTH sides (the fusion layer hardcodes 0.1,
``STiLModel_backbone.py:60``; masks cannot align across frameworks),
and the case-3 routing draw (``STiLModel.py:299`` ``torch.rand_like``)
is replayed from the jax key stream our step derives it from — the
mask is data, not semantics.
"""

import dataclasses
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stil_tta_tpu.algorithms.stil import STiL  # noqa: E402
from stil_tta_tpu.train.convert import convert_torch_state_dict  # noqa: E402
from tests.test_reference_golden import _install_shims  # noqa: E402
from tests.test_train_step_parity import (  # noqa: E402
    ALPHA, B_L, B_U, BETA, GAMMA, IMG, LAM0, MOMENTUM, RATE_PSEUDO,
    RATE_PT, RATE_UCE, REPEAT_RATIO, SEED, TEMP, TH1, _build_cfg)
from tests.test_full_model_parity import CATS, DIM, NCLS, NCON, PROJ  # noqa: E402

pytestmark = pytest.mark.slow

FIELD_LENGTHS = CATS + (1,) * NCON
LR = 1e-3           # Adam on both sides (the reference's real optimizer)
WD = 1e-3           # exercises torch Adam's coupled L2 (grad += wd*p)
N_STEPS = 6         # one "epoch"
N_POST = 2          # steps after training_epoch_end's prototype refresh
DA_LEN = 256        # reference hardcodes 256 (``STiLModel.py:100``)
N_DATA = 64

LOG_KEYS = [
    "CEloss", "CEloss_unlabelled_m", "CEloss_unlabelled_i",
    "CEloss_unlabelled_t", "threshold1_ratio", "case1_ratio",
    "case2_i_ratio", "case2_t_ratio", "case3_ratio", "ITCloss",
    "CLUBloss_imaging", "CLUBloss_imaging_est", "CLUBloss_tabular",
    "CLUBloss_tabular_est", "loss",
]


def _install_train_shims():
    """Stand-ins for the training-stack packages (see module docstring).
    Idempotent; extends the model-stack shims from
    ``test_reference_golden._install_shims``."""
    if "torchmetrics" not in sys.modules:
        tmx = types.ModuleType("torchmetrics")

        class _Metric(nn.Module):
            """Inert metric: callable, computable, resettable; registers
            no parameters/buffers so state_dicts stay clean."""

            def __init__(self, *a, **kw):
                super().__init__()

            def forward(self, *a, **kw):
                return None

            def compute(self):
                return torch.zeros(())

            def reset(self):
                pass

        tmx.Accuracy = _Metric
        tmx.AUROC = _Metric
        sys.modules["torchmetrics"] = tmx

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(nn.Module):
            def __init__(self):
                super().__init__()
                self.current_epoch = 0
                self.logged = {}

            def save_hyperparameters(self, hparams):
                self._hparams_shim = hparams

            @property
            def hparams(self):
                return self._hparams_shim

            def log(self, name, value, **kw):
                if torch.is_tensor(value):
                    self.logged[name] = float(value.detach())

            def log_dict(self, d, **kw):
                for k, v in d.items():
                    self.log(k, v)

            def print(self, *a, **kw):
                pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl

    if "lightly" not in sys.modules:
        lightly = types.ModuleType("lightly")
        lmodels = types.ModuleType("lightly.models")
        lmodules = types.ModuleType("lightly.models.modules")

        class SimCLRProjectionHead(nn.Module):
            """lightly 1.2.22 heads.py: blocks [(in, hidden, None,
            ReLU), (hidden, out, None, None)]; ``use_bias = not
            bool(batch_norm)`` -> both Linears biased, no BN."""

            def __init__(self, input_dim, hidden_dim, output_dim):
                super().__init__()
                self.layers = nn.Sequential(
                    nn.Linear(input_dim, hidden_dim),
                    nn.ReLU(),
                    nn.Linear(hidden_dim, output_dim))

            def forward(self, x):
                return self.layers(x)

        lmodules.SimCLRProjectionHead = SimCLRProjectionHead
        lightly.models = lmodels
        lmodels.modules = lmodules
        sys.modules["lightly"] = lightly
        sys.modules["lightly.models"] = lmodels
        sys.modules["lightly.models.modules"] = lmodules

    # pl_bolts: test_reference_golden's shim already provides
    # pl_bolts.utils.self_supervised; add the optimizers submodule the
    # STiLModel import line touches (only the unused 'anneal' branch
    # instantiates it)
    pl_bolts = sys.modules["pl_bolts"]
    if not hasattr(pl_bolts, "optimizers"):
        opt_mod = types.ModuleType("pl_bolts.optimizers")
        sched_mod = types.ModuleType("pl_bolts.optimizers.lr_scheduler")

        class LinearWarmupCosineAnnealingLR:
            def __init__(self, *a, **kw):
                raise NotImplementedError(
                    "test uses the reference's 'cosine' branch")

        sched_mod.LinearWarmupCosineAnnealingLR = LinearWarmupCosineAnnealingLR
        opt_mod.lr_scheduler = sched_mod
        pl_bolts.optimizers = opt_mod
        sys.modules["pl_bolts.optimizers"] = opt_mod
        sys.modules["pl_bolts.optimizers.lr_scheduler"] = sched_mod


def _single_process_dist(tmp_path, monkeypatch):
    """Make ``torch.distributed`` work at world size 1 (gloo if built
    in, else the mathematically identical identity patch)."""
    import torch.distributed as dist
    if dist.is_available() and not dist.is_initialized():
        try:
            dist.init_process_group(
                "gloo", init_method=f"file://{tmp_path}/pg_stil_golden",
                rank=0, world_size=1)
            return
        except Exception:
            pass
    if not (dist.is_available() and dist.is_initialized()):
        monkeypatch.setattr(torch.distributed, "all_reduce",
                            lambda t, *a, **kw: t, raising=False)
        monkeypatch.setattr(torch.distributed, "get_world_size",
                            lambda *a, **kw: 1, raising=False)


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _hparams(tmp_path):
    from models.pieces import DotDict  # reference code (shimmed imports)
    fl_path = tmp_path / "field_lengths.pt"
    torch.save(torch.tensor(list(FIELD_LENGTHS)), str(fl_path))
    return DotDict({
        # backbone (same surface as test_reference_golden's fixture)
        "model": "resnet18", "checkpoint": None, "pretrain": False,
        "num_classes": NCLS, "field_lengths_tabular": str(fl_path),
        "tabular_embedding_dim": DIM,
        "tabular_transformer_num_layers": 1,
        "multimodal_transformer_num_layers": 1,
        "embedding_dropout": 0.0, "drop_rate": 0.0,
        "multimodal_embedding_dim": DIM, "embedding_dim": 512,
        "projection_dim": PROJ, "img_size": IMG,
        "finetune_strategy": "trainable", "pretrained_model": "TIP",
        "checkpoint_SAINT": None,
        # training (STiLModel.__init__ / configure_optimizers)
        "target": "dvm", "alpha": ALPHA, "beta": BETA, "gamma": GAMMA,
        "rate_uce": RATE_UCE, "th1": TH1, "th2": 0.9,
        "temperature": TEMP, "lambda_0": LAM0,
        "rate_pseudo": RATE_PSEUDO, "start_epoch": 0,
        "th_contrast": 0.9, "rate_pt": RATE_PT,
        "repeat_ratio": REPEAT_RATIO, "batch_size": B_L + B_U,
        "use_ema": True, "eman": True, "ema_momentum": MOMENTUM,
        "DA": True, "logdir": str(tmp_path),
        "lr_eval": LR, "weight_decay_eval": WD,
        "scheduler": "cosine", "dataset_length": 100,
        "cosine_anneal_mult": 1.0,
    })


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)


def _disable_dropout(module):
    for m in module.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        if type(m).__name__ == "DropPath":
            m.drop_prob = 0.0


def _student_sd(tm):
    """Reference-named student state dict (the converter's input):
    everything except the EMA teacher and the non-weight buffers."""
    return {k: v.numpy() for k, v in tm.state_dict().items()
            if k.startswith(("model.", "projector_", "CLUB_"))}


def _teacher_sd(tm):
    """Student dict with the EMA teacher's weights under ``model.`` (the
    teacher shares the student's projector/CLUB params,
    ``STiLModel.py:247``)."""
    sd = _student_sd(tm)
    for k, v in tm.state_dict().items():
        if k.startswith("ema."):
            sd["model." + k[len("ema."):]] = v.numpy()
    return sd


def _run_stil_golden_trajectory(saint, monkeypatch, tmp_path):
    """Drives the REAL reference STiL Lightning module (transformer or
    SAINT tabular encoder) for the multi-epoch trajectory described in
    the module docstring. The SAINT variant
    (``models/Disentangle/STiLModel_SAINT.py``, class
    ``SemiDisCoPseudoSmooth``) is train-logic-identical to STiLModel
    (diff-verified, SURVEY.md §2.5) — the differences exercised here are
    the SAINT backbone in the TRAIN graph (intersample attention over
    the batch axis, GEGLU FF, the f64-default ``torch.empty`` in
    ``forward_tabular``) and the EMAN lerp running over the SAINT
    parameter set (the reference's ``'offset'`` copy quirk at
    ``STiLModel_SAINT.py:161`` is moot on our side: offsets are
    recomputed in-graph, not stored)."""
    _install_shims()
    _install_train_shims()
    _single_process_dist(tmp_path, monkeypatch)
    if saint:
        from models.Disentangle.STiLModel_SAINT import (
            SemiDisCoPseudoSmooth as STiLModel)
        from models.Disentangle.utils.STiLModel_SAINT_backbone import (
            DisCoAttentionBackbone)
        from stil_tta_tpu.algorithms.stil import STiL_SAINT as AlgoCls
    else:
        from models.Disentangle.STiLModel import STiLModel
        from models.Disentangle.utils.STiLModel_backbone import (
            DisCoAttentionBackbone)
        AlgoCls = STiL

    # our fusion layer hardcodes the same 0.1 dropouts; run both sides
    # dropout-free (see module docstring)
    from stil_tta_tpu.models import backbones
    real_layer = backbones.MITransformerLayer

    def dropfree(**kw):
        kw.update(attn_drop=0.0, proj_drop=0.0, drop_path=0.0)
        return real_layer(**kw)

    monkeypatch.setattr(backbones, "MITransformerLayer", dropfree)

    hp = _hparams(tmp_path)
    torch.manual_seed(3)
    tm = STiLModel(hp).double()
    # independent teacher (a real EMAN lerp, not a no-op copy of the
    # student that __init__ makes)
    torch.manual_seed(7)
    tm.ema.load_state_dict(DisCoAttentionBackbone(hp).double().state_dict())
    _randomize_bn(tm.model)
    _randomize_bn(tm.ema)
    _disable_dropout(tm)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (N_DATA, IMG, IMG, 3)).astype(np.float64)
    tabs = np.concatenate([
        np.stack([rng.randint(0, c, N_DATA) for c in CATS], 1),
        rng.randn(N_DATA, NCON)], 1).astype(np.float64)
    # labels cycle through the classes so that the sequential labeled
    # sampling below feeds every class enough confident one-hot rows to
    # satisfy the reference's own epoch-end assert (count >= 1 with the
    # labeled contribution scaled by 1/repeat_ratio, ``STiLModel.py:414``)
    y = (np.arange(N_DATA) % NCLS).astype(np.int64)
    prototypes = rng.randn(NCLS, PROJ).astype(np.float64)
    prototypes /= np.linalg.norm(prototypes, axis=1, keepdims=True)
    with torch.no_grad():
        tm.prototypes.copy_(torch.tensor(prototypes))

    # ---- our side: production algorithm + production Adam ------------
    cfg = _build_cfg()
    cfg["DA"] = True
    cfg["lr_eval"] = LR
    cfg["weight_decay_eval"] = WD
    if saint:
        cfg["saint_ff_dropout"] = 0.0  # both sides run dropout-free
    algo = AlgoCls(cfg, FIELD_LENGTHS, dtype=jnp.float64)
    state = algo.init_state(jax.random.key(0), jnp.asarray(imgs[:2]),
                            jnp.asarray(tabs[:2]))
    f64 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    variables = {"params": f64(state.params),
                 "batch_stats": f64(state.batch_stats)}
    converted, leftovers = convert_torch_state_dict(_student_sd(tm),
                                                    variables)
    assert not leftovers, leftovers[:5]
    conv_teacher, _ = convert_torch_state_dict(_teacher_sd(tm), variables)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_teacher["params"]["backbone"],
        ema_batch_stats=conv_teacher["batch_stats"]["backbone"],
        prototypes=jnp.asarray(prototypes),
        prototypes_sum=jnp.zeros((NCLS, PROJ), jnp.float64),
        prototypes_count=jnp.zeros((NCLS, 1), jnp.float64),
        da=dataclasses.replace(
            state.da, queue=jnp.zeros((DA_LEN, NCLS), jnp.float64)),
        rng=jax.random.key(SEED))

    cache_l = {"images": jnp.asarray(imgs), "tabular": jnp.asarray(tabs),
               "labels": jnp.asarray(y),
               "labelled": jnp.ones((N_DATA,), bool)}
    cache_u = dict(cache_l)
    step = algo.make_train_step()

    # ---- reference side: the REAL Lightning optimization loop --------
    opt = tm.configure_optimizers()["optimizer"]
    assert isinstance(opt, torch.optim.Adam)

    pending_uniform = {}

    def fake_rand_like(t, **kw):
        # the only train-path rand_like is the case-3 routing draw
        # (``STiLModel.py:299``); dropout is disabled on both sides
        u = pending_uniform.pop("u")
        return torch.tensor(u, dtype=t.dtype).reshape(t.shape)

    monkeypatch.setattr(torch, "rand_like", fake_rand_like)

    def replay_uniform(key):
        ks = jax.random.split(key, 4)
        return ks[0], np.asarray(jax.random.uniform(ks[3], (B_U,)))

    def tol(step_no):
        # the tests/test_trajectory_parity.py schedule with the
        # geometric growth starting at step 2 instead of 4: both sides
        # run Adam here (the reference's real optimizer), whose
        # per-coordinate normalization amplifies the f32 sharpen noise
        # faster than the SGD twin (measured 1.8e-4 at step 3); tight
        # early steps still catch any semantic bug (O(0.1-1) at step 0).
        # atol floor = rel (not rel/10): the CLUB bound is a difference
        # of large near-equal terms, so trajectory noise is
        # cancellation-amplified in RELATIVE terms while staying tiny
        # absolutely (2.5e-4 at step 3); the case/mask ratio asserts
        # pin the discrete routing exactly, and the end-of-trajectory
        # state bounds catch systematic drift.
        # measured on this init: 1.8e-4 (step 3, ITC), 6.8e-4 (step 3,
        # CLUB est) — an Adam-specific mechanism absent from the SGD
        # twin: params whose true gradient is below the f32 noise floor
        # still receive ~lr-sized normalized updates whose DIRECTION the
        # noise decides, so per-param drift is O(lr) per step for the
        # tiny-gradient tail
        if step_no <= 2:
            rel = 1e-4
        else:
            rel = min(3e-3 * 2.0 ** (step_no - 3), 3e-2)
        return rel, rel

    idx_rs = np.random.RandomState(11)
    jkey = jax.random.key(SEED)
    prev_sums = {k: 0.0 for k in state.log_sums}

    def run_epoch(n_steps, epoch, state, jkey, step0=0):
        nonlocal prev_sums
        for i in range(n_steps):
            # labeled: sequential window (guarantees class coverage for
            # the epoch-end assert); unlabeled: random
            idx_l = ((np.arange(B_L) + (step0 + i) * B_L)
                     % N_DATA).astype(np.int32)
            idx_u = idx_rs.randint(0, N_DATA, B_U).astype(np.int32)
            state = step(state, cache_l, cache_u, jnp.asarray(idx_l),
                         jnp.asarray(idx_u), jnp.asarray(epoch, jnp.int32))
            jkey, uniforms = replay_uniform(jkey)

            timg_l = torch.tensor(
                imgs[idx_l].transpose(0, 3, 1, 2) / 255.0)
            timg_u = torch.tensor(
                imgs[idx_u].transpose(0, 3, 1, 2) / 255.0)
            ttab_l = torch.tensor(tabs[idx_l])
            ttab_u = torch.tensor(tabs[idx_u])
            batch = {
                "l": ([timg_l, timg_l], [ttab_l, ttab_l],
                      torch.tensor(y[idx_l]), None, torch.ones(B_L)),
                "u": ([timg_u, timg_u], [ttab_u, ttab_u],
                      torch.tensor(y[idx_u]), None, torch.zeros(B_U)),
            }
            tm.logged.clear()
            tm.current_epoch = epoch
            pending_uniform["u"] = uniforms
            opt.zero_grad()
            loss = tm.training_step(batch, 0)
            loss.backward()
            opt.step()
            assert not pending_uniform, "rand_like was never consumed"

            pref = "multimodal.train."
            ref = {k[len(pref):]: v for k, v in tm.logged.items()
                   if k.startswith(pref)}
            # the reference logs loss_itc under the PTloss name
            # (``STiLModel.py:344``) — pin the quirk, then recover the
            # true PT loss from the total
            assert ref["PTloss"] == ref["ITCloss"]
            clubs = (ref["CLUBloss_imaging"] + ref["CLUBloss_imaging_est"]
                     + ref["CLUBloss_tabular"] + ref["CLUBloss_tabular_est"])
            ref_pt = (ref["loss"] - ALPHA * ref["CEloss"]
                      - BETA * ref["ITCloss"] - GAMMA * clubs
                      - RATE_UCE * (ref["CEloss_unlabelled_m"]
                                    + ref["CEloss_unlabelled_i"]
                                    + ref["CEloss_unlabelled_t"])) / RATE_PT

            rtol_i, atol_i = tol(step0 + i)
            for k in LOG_KEYS:
                ours = float(state.log_sums[k]) - prev_sums[k]
                np.testing.assert_allclose(
                    ours, ref[k], rtol=rtol_i, atol=atol_i,
                    err_msg=f"step {step0 + i} (epoch {epoch}) log {k}")
            ours_pt = float(state.log_sums["PTloss"]) - prev_sums["PTloss"]
            np.testing.assert_allclose(
                ours_pt, ref_pt, rtol=rtol_i * 10, atol=atol_i * 10,
                err_msg=f"step {step0 + i} derived PTloss")
            prev_sums = {k: float(v) for k, v in state.log_sums.items()}
        return state, jkey

    state, jkey = run_epoch(N_STEPS, 1, state, jkey)

    # ---- DA queue golden (``STiLModel.py:171-180``) -------------------
    np.testing.assert_allclose(np.asarray(state.da.queue),
                               tm.DA_queue.numpy(), rtol=2e-3, atol=1e-6)
    assert int(state.da.ptr) == int(tm.DA_ptr) == N_STEPS

    # ---- prototype accumulators then the REAL training_epoch_end -----
    # atol floor 5e-4: small-magnitude sum entries carry the late-step
    # feature drift (measured 1e-4 abs); semantic bugs (wrong
    # repeat_ratio, wrong confidence mask) are O(0.1-1) here
    np.testing.assert_allclose(np.asarray(state.prototypes_sum),
                               tm.prototypes_sum.numpy(), rtol=2e-3,
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(state.prototypes_count),
                               tm.prototypes_count_sum.numpy(), rtol=0,
                               atol=1e-9)
    assert (np.asarray(state.prototypes_count) >= 1).all(), \
        "test setup must feed every class (the reference asserts this)"
    state, _ = algo.epoch_end(state)
    tm.training_epoch_end(None)
    prev_sums = {k: 0.0 for k in state.log_sums}
    np.testing.assert_allclose(np.asarray(state.prototypes),
                               tm.prototypes.numpy(), rtol=2e-3, atol=1e-6)
    assert float(tm.prototypes_sum.abs().sum()) == 0.0  # reset happened

    # ---- post-epoch steps against the refreshed prototypes -----------
    state, jkey = run_epoch(N_POST, 2, state, jkey, step0=N_STEPS)

    # ---- end-of-trajectory state golden -------------------------------
    def rel_l2_tree(a, b, bound, what):
        fa = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree_util.tree_leaves(a)])
        fb = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree_util.tree_leaves(b)])
        rel = np.linalg.norm(fa - fb) / max(np.linalg.norm(fb), 1e-12)
        assert rel < bound, (what, rel)

    conv_student, _ = convert_torch_state_dict(_student_sd(tm), variables)
    rel_l2_tree(state.params, conv_student["params"], 3e-3,
                f"params after {N_STEPS + N_POST} Adam steps")
    rel_l2_tree(state.batch_stats, conv_student["batch_stats"], 3e-3,
                "BN running stats")
    conv_post, _ = convert_torch_state_dict(_teacher_sd(tm), variables)
    rel_l2_tree(state.ema_params, conv_post["params"]["backbone"], 3e-3,
                "EMAN teacher params")
    rel_l2_tree(state.ema_batch_stats,
                conv_post["batch_stats"]["backbone"], 3e-3,
                "EMAN teacher BN stats")


@pytest.fixture
def torch_f64():
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def test_stil_training_step_golden_trajectory(x64, monkeypatch, tmp_path):
    _run_stil_golden_trajectory(False, monkeypatch, tmp_path)


def test_stil_saint_training_step_golden_trajectory(x64, torch_f64,
                                                    monkeypatch, tmp_path):
    """STiL_SAINT against the reference's own ``SemiDisCoPseudoSmooth``
    (``models/Disentangle/STiLModel_SAINT.py``) — the SAINT backbone's
    intersample attention inside the TRAIN graph plus the full
    CGPL/PGLS/EMAN/DA trajectory."""
    _run_stil_golden_trajectory(True, monkeypatch, tmp_path)
