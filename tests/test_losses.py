"""Golden-value tests: loss functions cross-checked against independent
torch/NumPy computations of the reference formulas (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from stil_tta_tpu.losses import (CLUBMean, clip_loss, club_losses,
                                 cross_entropy, entropy_loss, prototype_loss,
                                 soft_cross_entropy)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 5).astype(np.float32)
    labels = rng.randint(0, 5, 6)
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-4)


def test_soft_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(6, 5).astype(np.float32)
    target = rng.rand(6, 5).astype(np.float32)
    target /= target.sum(1, keepdims=True)
    ours = soft_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(target))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-4)


def test_clip_loss_matches_reference_formula():
    """utils/clip_loss.py:28-40 recomputed in torch."""
    rng = np.random.RandomState(2)
    a = rng.randn(8, 16).astype(np.float32)
    b = rng.randn(8, 16).astype(np.float32)
    temp, lam = 0.1, 0.3
    ours, logits, labels = clip_loss(jnp.asarray(a), jnp.asarray(b), temp, lam)

    ta = F.normalize(torch.tensor(a), dim=1)
    tb = F.normalize(torch.tensor(b), dim=1)
    tl = ta @ tb.T / temp
    ll = torch.arange(8)
    ref = lam * F.cross_entropy(tl, ll) + (1 - lam) * F.cross_entropy(tl.T, ll)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_prototype_loss_matches_reference_formula():
    """utils/prototype_loss.py:24-40 recomputed in torch."""
    rng = np.random.RandomState(3)
    label = rng.rand(6, 4).astype(np.float32)
    protos = rng.randn(4, 8).astype(np.float32)
    feat = rng.randn(6, 8).astype(np.float32)
    temp, th = 0.1, 0.4
    ours = prototype_loss(jnp.asarray(label), jnp.asarray(protos),
                          jnp.asarray(feat), temp, th)

    sim = torch.softmax(torch.tensor(feat) @ torch.tensor(protos).t() / temp,
                        dim=1)
    log_sim = torch.log(sim + 1e-7)
    tl = torch.tensor(label)
    max_prob, max_id = torch.max(tl, dim=1)
    conf = max_prob.ge(th).float()
    hard = torch.zeros_like(tl)
    hard[torch.arange(6), max_id] = 1
    ref = (-torch.sum(log_sim * hard, dim=1) * conf).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-4)


def test_club_losses_match_reference_formula():
    """club.py:105-130 (CLUBMean with unit variance) recomputed in torch,
    including the (B,B,D) negative term we expand algebraically."""
    rng = np.random.RandomState(4)
    mu = rng.randn(5, 7).astype(np.float32)
    y = rng.randn(5, 7).astype(np.float32)
    mi, ll = club_losses(jnp.asarray(mu), jnp.asarray(y))

    tmu, ty = torch.tensor(mu), torch.tensor(y)
    positive = (-((tmu - ty) ** 2) / 2.0).sum(-1)
    negative = (-((ty.unsqueeze(0) - tmu.unsqueeze(1)) ** 2).mean(1) / 2.0) \
        .sum(-1)
    ref_mi = (positive - negative).mean()
    ref_ll = ((tmu - ty) ** 2).sum(1).mean(0)
    np.testing.assert_allclose(float(mi), float(ref_mi), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(ll), float(ref_ll), rtol=1e-5)


def test_club_mean_module_shapes():
    m = CLUBMean(y_dim=7, hidden_size=16)
    x = jnp.ones((3, 5))
    vs = m.init(jax.random.key(0), x)
    mu = m.apply(vs, x)
    assert mu.shape == (3, 7)


def test_entropy_loss_matches_reference_formula():
    """freematch_utils.py:17-45 recomputed in torch."""
    rng = np.random.RandomState(5)
    logits_s = rng.randn(10, 4).astype(np.float32)
    mask = (rng.rand(10) > 0.4).astype(np.float32)
    p_model = rng.rand(4).astype(np.float32)
    label_hist = rng.rand(4).astype(np.float32)
    ours = entropy_loss(jnp.asarray(mask), jnp.asarray(logits_s),
                        jnp.asarray(p_model), jnp.asarray(label_hist))

    tmask = torch.tensor(mask).bool()
    tls = torch.tensor(logits_s)[tmask]
    prob_s = tls.softmax(dim=-1)
    _, pred = torch.max(prob_s, dim=-1)
    hist_s = torch.bincount(pred, minlength=4).float()
    hist_s = hist_s / hist_s.sum()
    pm = torch.tensor(p_model).reshape(1, -1)
    lh = torch.tensor(label_hist).reshape(1, -1)
    scaler = 1 / lh
    scaler[scaler == float("inf")] = 0.0
    mod_pm = pm * scaler
    mod_pm = mod_pm / mod_pm.sum(dim=-1, keepdim=True)
    s2 = 1 / hist_s
    s2[s2 == float("inf")] = 0.0
    mod_mean = prob_s.mean(dim=0, keepdim=True) * s2
    mod_mean = mod_mean / mod_mean.sum(dim=-1, keepdim=True)
    ref = (mod_pm * torch.log(mod_mean + 1e-12)).sum(dim=1).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4,
                               atol=1e-5)


def test_entropy_loss_zero_mask():
    ours = entropy_loss(jnp.zeros(4), jnp.ones((4, 3)),
                        jnp.ones(3) / 3, jnp.ones(3) / 3)
    assert float(ours) == 0.0
