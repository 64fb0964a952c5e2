"""Eval parity: torch reference modules (built fresh from the standard
formulas) -> converted weights -> our flax modules produce the same
outputs (the BASELINE.md checkpoint-parity requirement, SURVEY.md §7.2).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.models.resnet import image_encoder
from stil_tta_tpu.models.tabular_transformer import TabularTransformerEncoder
from stil_tta_tpu.train.convert import convert_torch_state_dict


# --- minimal torch ResNet-18 (standard torchvision formulas) -----------
class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class TResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for s, (cin, cout, stride) in enumerate(chans):
            setattr(self, f"layer{s + 1}", nn.Sequential(
                TBasicBlock(cin, cout, stride), TBasicBlock(cout, cout)))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x.mean(dim=(2, 3))


def test_resnet18_eval_parity_with_torch():
    torch.manual_seed(0)
    tm = TResNet18().eval()
    # give running stats non-trivial values
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = image_encoder("resnet18", dtype=jnp.float32)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x), train=False)
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers
    (ours,) = fm.apply(converted, jnp.asarray(x), train=False)

    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3,
                               atol=2e-4)


# --- minimal torch tabular transformer (standard pre-norm block) -------
class TTorchBlock(nn.Module):
    def __init__(self, dim, heads=8):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.dim, self.heads = dim, heads

        class A(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3, bias=False)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                b, n, c = x.shape
                qkv = self.qkv(x).reshape(b, n, 3, heads, c // heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                att = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
                att = att.softmax(-1)
                out = (att @ v).transpose(1, 2).reshape(b, n, c)
                return self.proj(out)

        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(dim, dim * 4)
                self.fc2 = nn.Linear(dim * 4, dim)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.attn = A()
        self.mlp = M()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TTabularEncoder(nn.Module):
    def __init__(self, cats, ncon, dim, layers=2):
        super().__init__()
        self.ncat = len(cats)
        off = torch.tensor([0] + list(cats)[:-1]).cumsum(0)
        # reference registers cat_offsets persistent=False
        # (Transformer.py:204) so it is absent from state_dict
        self.register_buffer("offsets", off, persistent=False)
        self.cat_embedding = nn.Embedding(sum(cats), dim)
        self.con_proj = nn.Linear(1, dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.mask_special_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.column_embedding = nn.Embedding(self.ncat + ncon + 1, dim)
        self.norm = nn.LayerNorm(dim)
        self.transformer_blocks = nn.ModuleList(
            [TTorchBlock(dim) for _ in range(layers)])

    def forward(self, x):
        cat = self.cat_embedding(x[:, :self.ncat].long() + self.offsets)
        con = self.con_proj(x[:, self.ncat:].unsqueeze(-1))
        t = torch.cat([cat, con], 1)
        cls = self.cls_token.expand(len(x), -1, -1)
        t = torch.cat([cls, t], 1)
        t = t + self.column_embedding.weight.unsqueeze(0)
        t = self.norm(t)
        for blk in self.transformer_blocks:
            t = blk(t)
        return t


def test_tabular_transformer_eval_parity_with_torch():
    torch.manual_seed(1)
    cats, ncon, dim = (5, 4, 2), 3, 32
    tm = TTabularEncoder(cats, ncon, dim).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = TabularTransformerEncoder(cat_lengths=cats, con_lengths=[1] * ncon,
                                   embedding_dim=dim, num_layers=2,
                                   dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x = np.concatenate([
        np.stack([rng.randint(0, c, 4) for c in cats], 1),
        rng.randn(4, ncon)], 1).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers
    ours = fm.apply(converted, jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3,
                               atol=2e-4)
