"""Full-model eval parity for the STiL_SAINT flagship variant: a torch
twin of the complete SAINT-backbone STiL network (DisCo fusion with the
SAINT tabular encoder — ``STiLModel_SAINT_backbone.py:37-231`` — plus
projectors and CLUB heads) is loaded through the split conversion path
(``load_saint_state_dict`` for the SAINT subtree, the tree-walk
converter for everything else, mirroring the reference's separate SAINT
``.pth`` load at ``:144-146``) and must produce the same multimodal /
imaging / tabular logits as our flax ``STiLNet(tabular_encoder='saint')``.

Reuses the transformer-variant twin wholesale (test_full_model_parity's
``TSTiL``): the SAINT CLS/token dim (32) equals that test's DIM, so only
the tabular encoder module is swapped — exactly the reference's own diff
between ``STiLModel_backbone.py`` and ``STiLModel_SAINT_backbone.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.stil import STiLNet
from stil_tta_tpu.train.convert import (convert_torch_state_dict,
                                        load_saint_state_dict)
from tests.test_convert_parity import TResNet18
from tests.test_full_model_parity import CATS, DIM, NCLS, NCON, PROJ, \
    TBackbone, TSTiL
from tests.test_saint_parity import TSaintEncoder


class TSaintDiscoBackbone(TBackbone):
    """TBackbone with the SAINT tabular encoder (same token count —
    1 + 3 cat + 3 con — and the same 32-d token dim)."""

    def __init__(self):
        super().__init__()
        self.encoder_tabular = TSaintEncoder()


class TSTiLSaint(TSTiL):
    def __init__(self):
        super().__init__()
        self.backbone = TSaintDiscoBackbone()


def test_full_stil_saint_eval_parity():
    def feature_map(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x
    TResNet18.feature_map = feature_map

    torch.manual_seed(1)
    tm = TSTiLSaint().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    net = STiLNet(encoder="resnet18", field_lengths=CATS + (1,) * NCON,
                  num_classes=NCLS, target="dvm", projection_dim=PROJ,
                  tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
                  tabular_num_layers=1, multimodal_num_layers=1,
                  tabular_encoder="saint", dtype=jnp.float32)
    rng = np.random.RandomState(3)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    tab = np.concatenate([
        np.stack([rng.randint(0, c, 2) for c in CATS], 1),
        rng.randn(2, NCON)], 1).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(img),
                         jnp.asarray(tab), train=False)

    # split conversion: SAINT subtree separately, the rest via the
    # tree-walk converter (reference: SAINT weights come from their own
    # .pth — ``STiLModel_SAINT_backbone.py:144-146``)
    saint_sub = {"params": variables["params"]["backbone"]
                 ["encoder_tabular"]}
    saint_sd = {k[len("backbone.encoder_tabular."):]: v.numpy()
                for k, v in tm.state_dict().items()
                if k.startswith("backbone.encoder_tabular.")}
    saint_conv, n_used = load_saint_state_dict(saint_sub, saint_sd)
    assert n_used >= 20

    rest_params = dict(variables["params"])
    rest_params["backbone"] = {
        k: v for k, v in variables["params"]["backbone"].items()
        if k != "encoder_tabular"}
    rest_vars = {"params": rest_params,
                 "batch_stats": variables["batch_stats"]}
    rest_sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("backbone.encoder_tabular."):
            continue
        k2 = "model." + k[len("backbone."):] if k.startswith("backbone.") \
            else k
        rest_sd[k2] = v.numpy()
    conv_rest, leftovers = convert_torch_state_dict(rest_sd, rest_vars)
    assert not leftovers, leftovers

    params = dict(conv_rest["params"])
    params["backbone"] = dict(conv_rest["params"]["backbone"])
    params["backbone"]["encoder_tabular"] = saint_conv["params"]
    converted = {"params": params,
                 "batch_stats": conv_rest["batch_stats"]}

    ours = net.apply(converted, jnp.asarray(img), jnp.asarray(tab),
                     train=False)
    with torch.no_grad():
        om, oi, ot = tm.backbone(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(tab))
    np.testing.assert_allclose(np.asarray(ours["out_m"]), om.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours["out_i"]), oi.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours["out_t"]), ot.numpy(),
                               rtol=1e-3, atol=5e-4)
