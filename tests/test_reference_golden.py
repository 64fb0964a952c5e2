"""Golden parity against the REFERENCE'S OWN torch modules.

Every other parity test in this suite compares against independently
written torch twins; this file removes that trust assumption by running
the actual code in ``/root/reference`` (VERDICT r3 #2). The reference's
model files import cleanly under torch 2.13 + einops once two tiny shims
exist (they are import-blocked only by ``timm.models.layers`` and
``omegaconf`` — ``models/Transformer.py:6``,
``models/Disentangle/utils/STiLModel_backbone.py:8``):

- ``timm.models.layers``: ``DropPath`` (inert in eval), ``to_2tuple``,
  ``trunc_normal_`` (re-exported from ``torch.nn.init``),
- ``omegaconf``: ``OmegaConf/DictConfig/open_dict`` stand-ins (only
  touched on the checkpoint-loading paths, which these tests avoid).

Flow per backbone family: instantiate the REAL reference module with
random init, take its ``state_dict()``, convert through our
``train.convert.convert_torch_state_dict`` (the same converter that
ingests published reference checkpoints), and assert our flax model's
eval forward matches the reference's to f64 tightness. This
simultaneously ground-truths the converter key layout and the model
math for all four backbone families:

1. ``DisCoAttentionBackbone``  (STiL — resnets + TabularTransformer +
   MITransformerLayer fusion, ``STiLModel_backbone.py:35-165``)
2. its SAINT variant           (``STiLModel_SAINT_backbone.py``)
3. Match ``MultimodalBackbone`` (``MatchModel/multimodal_backbone.py:37``)
4. SemiMultimodal ``MultimodalBackbone`` (``Multimodal_model.py:36``)
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"

FIELD_LENGTHS = [5, 3, 1, 1, 1, 1]  # 2 categorical + 4 continuous
NUM_CLASSES = 5
IMG = 64
BATCH = 3


def _install_shims():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            """Stochastic depth (eval: identity — the only mode these
            tests run)."""

            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = float(drop_prob or 0.0)

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.floor(
                    keep + torch.rand(shape, dtype=x.dtype,
                                      device=x.device))
                return x.div(keep) * mask

        def to_2tuple(v):
            return v if isinstance(v, tuple) else (v, v)

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = timm_models
        timm_models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = layers
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def create(obj=None):
                return obj

            @staticmethod
            def to_container(obj, **kw):
                return obj

        class DictConfig(dict):
            pass

        def open_dict(cfg):
            import contextlib
            return contextlib.nullcontext(cfg)

        om.OmegaConf = OmegaConf
        om.DictConfig = DictConfig
        om.open_dict = open_dict
        sys.modules["omegaconf"] = om
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "pl_bolts" not in sys.modules:
        # SemiMultimodal/Multimodal_model.py imports pl_bolts'
        # torchvision_ssl_encoder; the reference VENDORS that exact
        # helper in models/self_supervised.py (same resnets, same
        # [pooled]/all-feature-maps contract) — alias it
        from models import self_supervised as ref_ss
        pl = types.ModuleType("pl_bolts")
        pl_utils = types.ModuleType("pl_bolts.utils")
        pl_ss = types.ModuleType("pl_bolts.utils.self_supervised")
        pl_ss.torchvision_ssl_encoder = ref_ss.torchvision_ssl_encoder
        pl.utils = pl_utils
        pl_utils.self_supervised = pl_ss
        sys.modules["pl_bolts"] = pl
        sys.modules["pl_bolts.utils"] = pl_utils
        sys.modules["pl_bolts.utils.self_supervised"] = pl_ss


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Imports the reference's model packages (shimmed) and saves the
    field-lengths tensor its constructors torch.load."""
    _install_shims()
    fl_path = tmp_path_factory.mktemp("ref") / "field_lengths.pt"
    torch.save(torch.tensor(FIELD_LENGTHS), str(fl_path))
    from models.pieces import DotDict  # noqa: E402 (reference code)
    args = DotDict({
        "model": "resnet18", "checkpoint": None, "pretrain": False,
        "num_classes": NUM_CLASSES,
        "field_lengths_tabular": str(fl_path),
        "tabular_embedding_dim": 512,
        "tabular_transformer_num_layers": 2,
        "multimodal_transformer_num_layers": 1,
        "embedding_dropout": 0.0, "drop_rate": 0.0,
        "multimodal_embedding_dim": 512,
        "embedding_dim": 512,   # resnet18 pooled dim
        "projection_dim": 128,
        "img_size": IMG, "finetune_strategy": "trainable",
        "pretrained_model": "TIP", "checkpoint_SAINT": None,
    })
    return args


@pytest.fixture()
def f64():
    jax.config.update("jax_enable_x64", True)
    # the reference's SAINT forward_tabular materializes x_cont_enc via
    # torch.empty() at torch's DEFAULT dtype — under .double() modules
    # that silently truncates the continuous-token encodings to f32
    # (``STiLModel_SAINT_backbone.py:171``); raise the default so the
    # golden comparison is genuinely end-to-end f64
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)
    jax.config.update("jax_enable_x64", False)


def _rand_inputs(seed=0):
    rng = np.random.RandomState(seed)
    ncat = sum(1 for f in FIELD_LENGTHS if f > 1)
    imgs = rng.rand(BATCH, IMG, IMG, 3).astype(np.float64)
    tabs = np.concatenate(
        [np.stack([rng.randint(0, f, BATCH)
                   for f in FIELD_LENGTHS if f > 1], 1),
         rng.randn(BATCH, len(FIELD_LENGTHS) - ncat)], 1)
    return imgs, tabs.astype(np.float64)


def _convert_f64(sd, flax_model, *init_args, **init_kw):
    """init our model, promote the variable tree to f64, and fill it
    from the torch state_dict (f64 values preserved)."""
    from stil_tta_tpu.train.convert import convert_torch_state_dict
    variables = flax_model.init(jax.random.key(0), *init_args, **init_kw)
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    converted, leftovers = convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, variables)
    assert not leftovers, leftovers[:5]
    return converted


def _assert_close(ours, theirs, name, atol=1e-6):
    # tolerance floor: our classifier/projection heads compute in f32 BY
    # DESIGN (``dtype=jnp.float32`` in backbones.py) even under an f64
    # tree, so the comparison bottoms out at f32 resolution (~1e-7 on
    # these magnitudes); everything upstream runs f64-exact
    np.testing.assert_allclose(np.asarray(ours, np.float64), theirs,
                               rtol=2e-5, atol=atol, err_msg=name)


def test_disco_backbone_golden(ref, f64):
    """STiL's DisCoAttentionBackbone: the real reference module's
    forward_all vs our DisCoBackbone, converted weights, f64."""
    from models.Disentangle.utils.STiLModel_backbone import (
        DisCoAttentionBackbone)
    from stil_tta_tpu.models.backbones import DisCoBackbone

    torch.manual_seed(0)
    tm = DisCoAttentionBackbone(ref).double().eval()
    imgs, tabs = _rand_inputs(0)

    fm = DisCoBackbone(
        model="resnet18", field_lengths=tuple(FIELD_LENGTHS),
        num_classes=NUM_CLASSES, tabular_embedding_dim=512,
        multimodal_embedding_dim=512, tabular_num_layers=2,
        multimodal_num_layers=1, dtype=jnp.float64)
    converted = _convert_f64(tm.state_dict(), fm, jnp.asarray(imgs),
                             jnp.asarray(tabs), train=False)
    ours = fm.apply(converted, jnp.asarray(imgs), jnp.asarray(tabs),
                    train=False)

    with torch.no_grad():
        (out_m, out_i, out_t, x_si_enh, x_si, x_ai, x_st_enh, x_st,
         x_at, x_c) = tm.forward_all(
            (torch.tensor(imgs.transpose(0, 3, 1, 2)),
             torch.tensor(tabs)))
    for name, o, t in (
            ("out_m", ours["out_m"], out_m), ("out_i", ours["out_i"], out_i),
            ("out_t", ours["out_t"], out_t),
            ("x_si_enhance", ours["x_si_enhance"], x_si_enh),
            ("x_si", ours["x_si"], x_si), ("x_ai", ours["x_ai"], x_ai),
            ("x_st_enhance", ours["x_st_enhance"], x_st_enh),
            ("x_st", ours["x_st"], x_st), ("x_at", ours["x_at"], x_at),
            ("x_c", ours["x_c"], x_c)):
        _assert_close(o, t.numpy(), name)


def test_disco_saint_backbone_golden(ref, f64):
    """The SAINT tabular variant (intersample attention, GEGLU,
    hard-coded depth-1/heads-4/colrow hyperparameters)."""
    from models.Disentangle.utils.STiLModel_SAINT_backbone import (
        DisCoAttentionBackbone as SAINTBackbone)
    from stil_tta_tpu.models.backbones import DisCoBackbone

    torch.manual_seed(1)
    tm = SAINTBackbone(ref).double().eval()
    imgs, tabs = _rand_inputs(1)

    fm = DisCoBackbone(
        model="resnet18", field_lengths=tuple(FIELD_LENGTHS),
        num_classes=NUM_CLASSES, tabular_embedding_dim=512,
        multimodal_embedding_dim=512, tabular_num_layers=2,
        multimodal_num_layers=1, tabular_encoder="saint",
        dtype=jnp.float64)
    converted = _convert_f64(tm.state_dict(), fm, jnp.asarray(imgs),
                             jnp.asarray(tabs), train=False)
    ours = fm.apply(converted, jnp.asarray(imgs), jnp.asarray(tabs),
                    train=False)

    with torch.no_grad():
        (out_m, out_i, out_t, x_si_enh, x_si, x_ai, x_st_enh, x_st,
         x_at, x_c) = tm.forward_all(
            (torch.tensor(imgs.transpose(0, 3, 1, 2)),
             torch.tensor(tabs)))
    for name, o, t in (
            ("out_m", ours["out_m"], out_m), ("out_i", ours["out_i"], out_i),
            ("out_t", ours["out_t"], out_t), ("x_c", ours["x_c"], x_c),
            ("x_ai", ours["x_ai"], x_ai), ("x_at", ours["x_at"], x_at)):
        _assert_close(o, t.numpy(), name)


def test_match_backbone_golden(ref, f64):
    """Match-family MultimodalBackbone: (logits, normalized embedding)."""
    from models.MatchModel.multimodal_backbone import MultimodalBackbone
    from stil_tta_tpu.models.backbones import MatchBackbone

    torch.manual_seed(2)
    tm = MultimodalBackbone(ref).double().eval()
    imgs, tabs = _rand_inputs(2)

    fm = MatchBackbone(
        model="resnet18", field_lengths=tuple(FIELD_LENGTHS),
        num_classes=NUM_CLASSES, projection_dim=128,
        tabular_embedding_dim=512, multimodal_embedding_dim=512,
        tabular_num_layers=2, dtype=jnp.float64)
    converted = _convert_f64(tm.state_dict(), fm, jnp.asarray(imgs),
                             jnp.asarray(tabs), train=False)
    logits, emb = fm.apply(converted, jnp.asarray(imgs),
                           jnp.asarray(tabs), train=False)

    with torch.no_grad():
        t_logits, t_emb = tm((torch.tensor(imgs.transpose(0, 3, 1, 2)),
                              torch.tensor(tabs)))
    _assert_close(logits, t_logits.numpy(), "logits")
    _assert_close(emb, t_emb.numpy(), "embedding")


def test_semimultimodal_backbone_golden(ref, f64):
    """SemiMultimodal MultimodalBackbone: three heads + fused feature."""
    from models.SemiMultimodal.Multimodal_model import MultimodalBackbone
    from stil_tta_tpu.models.backbones import SemiMultimodalBackbone

    torch.manual_seed(3)
    tm = MultimodalBackbone(ref).double().eval()
    imgs, tabs = _rand_inputs(3)

    fm = SemiMultimodalBackbone(
        model="resnet18", field_lengths=tuple(FIELD_LENGTHS),
        num_classes=NUM_CLASSES, projection_dim=128,
        tabular_embedding_dim=512, multimodal_embedding_dim=512,
        tabular_num_layers=2, dtype=jnp.float64)
    converted = _convert_f64(tm.state_dict(), fm, jnp.asarray(imgs),
                             jnp.asarray(tabs), train=False)
    o_m, o_i, o_t, o_xm = fm.apply(converted, jnp.asarray(imgs),
                                   jnp.asarray(tabs), train=False)

    with torch.no_grad():
        out_m, out_i, out_t, x_m = tm(
            (torch.tensor(imgs.transpose(0, 3, 1, 2)),
             torch.tensor(tabs)))
    _assert_close(o_m, out_m.numpy(), "out_m")
    _assert_close(o_i, out_i.numpy(), "out_i")
    _assert_close(o_t, out_t.numpy(), "out_t")
    _assert_close(o_xm, x_m.numpy(), "x_m")
