"""SAINT eval parity: a fresh torch implementation of the SAINT encoder
path the reference drives (``STiLModel_SAINT_backbone.py:159-184``:
CLS + offsets + per-column MLPs + pos-enc on categoricals + colrow
transformer) loads through ``load_saint_state_dict`` and matches our
flax SAINTEncoder."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.models.saint import SAINTEncoder
from stil_tta_tpu.train.convert import load_saint_state_dict

CATS = (5, 4, 2)
NCON = 3
DIM = 32
HEADS = 4


class TPreNormResidual(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = nn.Module()  # Residual wrapper
        self.fn.fn = fn

    def forward(self, x):
        # the reference's PreNorm(dim, Residual(fn)) composition: the
        # residual wraps the NORMED input (model_util.py:24-39) — NOT
        # the standard ``x + fn(norm(x))``; ground-truthed against the
        # real module in tests/test_reference_golden.py
        h = self.norm(x)
        return self.fn.fn(h) + h


class TAttn(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Linear(inner, dim)

    def forward(self, x):
        b, n, _ = x.shape
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        rs = lambda t: t.reshape(b, n, self.heads, self.dim_head) \
            .permute(0, 2, 1, 3)
        q, k, v = rs(q), rs(k), rs(v)
        sim = (q @ k.transpose(-2, -1)) * self.dim_head ** -0.5
        out = (sim.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class TFF(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, dim * mult * 2), nn.Identity(), nn.Identity(),
            nn.Linear(dim * mult, dim))
        # indices 0 and 3 hold the linears, matching saint's Sequential

    def forward(self, x):
        h = self.net[0](x)
        a, g = h.chunk(2, dim=-1)
        return self.net[3](a * F.gelu(g))


class TSaintEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        ncat, ncon = len(CATS), NCON
        total = sum(CATS) + 1
        self.embeds = nn.Embedding(total, DIM)
        self.pos_encodings = nn.Embedding(ncat + ncon, DIM)
        self.simple_MLP = nn.ModuleList()
        for _ in range(ncon):
            m = nn.Module()
            m.layers = nn.Sequential(nn.Linear(1, 100), nn.ReLU(),
                                     nn.Linear(100, DIM))
            self.simple_MLP.append(m)
        n = ncat + ncon + 1
        self.transformer = nn.Module()
        self.transformer.layers = nn.ModuleList([nn.ModuleList([
            TPreNormResidual(DIM, TAttn(DIM, HEADS, 16)),
            TPreNormResidual(DIM, TFF(DIM)),
            TPreNormResidual(n * DIM, TAttn(n * DIM, HEADS, 64)),
            TPreNormResidual(n * DIM, TFF(n * DIM)),
        ])])
        off = torch.tensor([0, 1] + list(CATS)).cumsum(0)[:-1]
        self.register_buffer("offsets", off, persistent=False)

    def forward(self, x):
        ncat = len(CATS)
        b = len(x)
        cls = torch.zeros(b, 1)
        x_categ = torch.cat([cls, x[:, :ncat]], 1).long() + self.offsets
        enc = self.embeds(x_categ)
        cont = torch.stack([
            self.simple_MLP[i].layers(x[:, ncat + i:ncat + i + 1])
            for i in range(NCON)], 1)
        pos = self.pos_encodings(torch.arange(ncat + 1))
        enc = enc + pos.unsqueeze(0)
        t = torch.cat([enc, cont], 1)
        n = t.shape[1]
        attn1, ff1, attn2, ff2 = self.transformer.layers[0]
        t = ff1(attn1(t))
        t = t.reshape(1, b, n * DIM)
        t = ff2(attn2(t))
        return t.reshape(b, n, DIM)


def test_saint_eval_parity_with_torch():
    torch.manual_seed(0)
    tm = TSaintEncoder().eval()
    sd = tm.state_dict()
    # rename test-module keys to saint's layout: simple_MLP.{i}.layers...
    # already matches; transformer.layers.{0}.{j}.norm / .fn.fn.* matches
    fm = SAINTEncoder(cat_lengths=CATS, num_continuous=NCON,
                      token_dim=DIM, depth=1, heads=HEADS,
                      attentiontype="colrow", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = np.concatenate([
        np.stack([rng.randint(0, c, 4) for c in CATS], 1),
        rng.randn(4, NCON)], 1).astype(np.float32)
    variables = fm.init(jax.random.key(0), x)
    converted, n_used = load_saint_state_dict(
        variables, {k: v.numpy() for k, v in sd.items()})
    assert n_used >= 20
    ours = fm.apply(converted, jnp.asarray(x), deterministic=True)
    with torch.no_grad():
        theirs = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3,
                               atol=3e-4)
