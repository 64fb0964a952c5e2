"""Full-model eval parity: a torch implementation of the complete STiL
network (DisCo backbone + projectors + CLUB heads), built fresh from the
reference's documented semantics, is converted through
``convert_torch_state_dict`` and must produce the same multimodal /
imaging / tabular logits as our flax STiLNet — the BASELINE.md
"checkpoint-level eval predictions" requirement, demonstrated end to
end on a small configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.stil import STiLNet
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_convert_parity import TResNet18, TTorchBlock

DIM = 32  # tabular/multimodal embedding dim
PROJ = 16
CATS = (5, 4, 2)
NCON = 3
NCLS = 6


class TTabEnc(nn.Module):
    """Reference TabularTransformerEncoder semantics (tiny)."""

    def __init__(self):
        super().__init__()
        off = torch.tensor([0] + list(CATS)[:-1]).cumsum(0)
        self.register_buffer("off", off, persistent=False)
        self.cat_embedding = nn.Embedding(sum(CATS), DIM)
        self.con_proj = nn.Linear(1, DIM)
        self.cls_token = nn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.mask_special_token = nn.Parameter(torch.randn(1, 1, DIM) * .02)
        self.column_embedding = nn.Embedding(len(CATS) + NCON + 1, DIM)
        self.norm = nn.LayerNorm(DIM)
        self.transformer_blocks = nn.ModuleList([TTorchBlock(DIM)])

    def forward(self, x):
        cat = self.cat_embedding(x[:, :len(CATS)].long() + self.off)
        con = self.con_proj(x[:, len(CATS):].unsqueeze(-1))
        t = torch.cat([cat, con], 1)
        t = torch.cat([self.cls_token.expand(len(x), -1, -1), t], 1)
        t = self.norm(t + self.column_embedding.weight.unsqueeze(0))
        for b in self.transformer_blocks:
            t = b(t)
        return t


class TMLP(nn.Module):
    """MLPHead: Linear-ReLU-Linear under the torch name 'model.{0,2}'."""

    def __init__(self, din, dh, dout):
        super().__init__()
        self.model = nn.Sequential(nn.Linear(din, dh), nn.ReLU(),
                                   nn.Linear(dh, dout))

    def forward(self, x):
        return self.model(x)


class TMIAttention(nn.Module):
    """disentangle_transformer.py MIAttention semantics: shared qkv,
    specific self-attention, global cross over cat(kg, ki, kt)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def _qkv(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.h, c // self.h)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        return qkv[0], qkv[1], qkv[2]

    @staticmethod
    def _attn(q, k, v):
        scale = q.shape[-1] ** -0.5
        a = (q @ k.transpose(-2, -1)) * scale
        a = a.softmax(-1)
        out = (a @ v).transpose(1, 2)
        return out.reshape(out.shape[0], out.shape[1], -1)

    def forward(self, xi, xt, xg):
        qi, ki, vi = self._qkv(xi)
        qt, kt, vt = self._qkv(xt)
        qg, kg, vg = self._qkv(xg)
        oi = self._attn(qi, ki, vi)
        ot = self._attn(qt, kt, vt)
        og = self._attn(qg, torch.cat([kg, ki, kt], 2),
                        torch.cat([vg, vi, vt], 2))
        return self.proj(oi), self.proj(ot), self.proj(og)


class TFusion(nn.Module):
    """MITransformerLayer: shared norms/MLP across the three streams."""

    def __init__(self, dim, heads=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn = TMIAttention(dim, heads)

        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(dim, dim)
                self.fc2 = nn.Linear(dim, dim)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.mlp = M()

    def forward(self, xi, xt, xg):
        ai, at, ag = self.attn(self.norm1(xi), self.norm1(xt),
                               self.norm1(xg))
        xi, xt, xg = xi + ai, xt + at, xg + ag
        xi = xi + self.mlp(self.norm2(xi))
        xt = xt + self.mlp(self.norm2(xt))
        xg = xg + self.mlp(self.norm2(xg))
        return xi, xt, xg


class TBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder_imaging = TResNet18()
        self.encoder_tabular = TTabEnc()
        self.projection_si = TMLP(512, DIM, DIM)
        self.projection_ai = TMLP(512, DIM, DIM)
        self.projection_st = TMLP(DIM, DIM, DIM)
        self.projection_at = TMLP(DIM, DIM, DIM)
        self.reduce = nn.Linear(DIM * 2, DIM)
        self.transformer = nn.ModuleList([TFusion(DIM)])
        self.classifier_multimodal = nn.Linear(DIM * 3, NCLS)
        self.classifier_imaging = nn.Linear(DIM * 2, NCLS)
        self.classifier_tabular = nn.Linear(DIM * 2, NCLS)

    def forward(self, img, tab):
        fm = self.encoder_imaging.feature_map(img)
        b, c, h, w = fm.shape
        xi = fm.reshape(b, c, h * w).permute(0, 2, 1)
        xt = self.encoder_tabular(tab)
        x_si = self.projection_si(xi)
        x_ai = self.projection_ai(xi.mean(1))
        x_st = self.projection_st(xt[:, 1:, :])
        x_at = self.projection_at(xt[:, 0, :])
        x_c = self.reduce(torch.cat([x_ai, x_at], 1)).unsqueeze(1)
        si, st, xc = x_si, x_st, x_c
        for blk in self.transformer:
            si, st, xc = blk(si, st, xc)
        si_m, st_m, xc_m = si.mean(1), st.mean(1), xc.mean(1)
        out_m = self.classifier_multimodal(
            torch.cat([si_m, xc_m, st_m], 1))
        out_i = self.classifier_imaging(torch.cat([si_m, x_ai], 1))
        out_t = self.classifier_tabular(torch.cat([st_m, x_at], 1))
        return out_m, out_i, out_t


class TSTiL(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()
        # dvm: linear ITC projectors; SimCLR multimodal head
        class SimCLR(nn.Module):
            def __init__(self, din, dh, dout):
                super().__init__()
                self.layers = nn.Sequential(nn.Linear(din, dh), nn.ReLU(),
                                            nn.Linear(dh, dout))
        # hidden = input dim, per STiLModel.py:56
        self.projector_multimodal = SimCLR(DIM * 3, DIM * 3, PROJ)
        self.projector_imaging = nn.Linear(DIM, PROJ)
        self.projector_tabular = nn.Linear(DIM, PROJ)
        class Club(nn.Module):
            def __init__(self):
                super().__init__()
                self.p_mu = nn.Sequential(nn.Linear(DIM, 512), nn.ReLU(),
                                          nn.Linear(512, DIM))
        # reference attribute names (STiLModel.py:67-68)
        self.CLUB_imaging = Club()
        self.CLUB_tabular = Club()


def test_full_stil_eval_parity():
    # torch feature-map accessor for the vendored test resnet
    def feature_map(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x
    TResNet18.feature_map = feature_map

    torch.manual_seed(0)
    tm = TSTiL().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # reference checkpoints use the 'model.' prefix for the backbone
    sd = {("model." + k[len("backbone."):] if k.startswith("backbone.")
           else k): v for k, v in sd.items()}

    net = STiLNet(encoder="resnet18", field_lengths=CATS + (1,) * NCON,
                  num_classes=NCLS, target="dvm", projection_dim=PROJ,
                  tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
                  tabular_num_layers=1, multimodal_num_layers=1,
                  dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    tab = np.concatenate([
        np.stack([rng.randint(0, c, 2) for c in CATS], 1),
        rng.randn(2, NCON)], 1).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(img),
                         jnp.asarray(tab), train=False)
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers, leftovers

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
