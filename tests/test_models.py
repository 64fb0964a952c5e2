import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stil_tta_tpu.models import (DisCoBackbone, MatchBackbone,
                                 SemiMultimodalBackbone, image_encoder)
from stil_tta_tpu.models.saint import SAINTEncoder
from stil_tta_tpu.models.tabular_transformer import (TabularTransformerEncoder,
                                                     split_field_lengths)

FIELD_LENGTHS = [5, 4, 2, 1, 1, 1]  # 3 categorical, 3 continuous


def tab_rows(b, key=0):
    rng = np.random.RandomState(key)
    cat = np.stack([rng.randint(0, c, size=b) for c in (5, 4, 2)], 1)
    con = rng.randn(b, 3)
    return jnp.asarray(np.concatenate([cat, con], 1), jnp.float32)


def test_resnet_feature_maps():
    m = image_encoder("resnet18", return_all_feature_maps=True,
                      dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    vs = m.init(jax.random.key(0), x, train=False)
    feats = m.apply(vs, x, train=False)
    assert [f.shape for f in feats] == [
        (2, 16, 16, 64), (2, 16, 16, 64), (2, 8, 8, 128),
        (2, 4, 4, 256), (2, 2, 2, 512)]


def test_resnet_pooled_and_bn_stats():
    m = image_encoder("resnet18", dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vs = m.init(jax.random.key(0), x, train=False)
    (pooled,) = m.apply(vs, x, train=False)
    assert pooled.shape == (2, 512)
    # train mode must produce batch_stats mutations
    _, mutated = m.apply(vs, x, train=True, mutable=["batch_stats"])
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert leaves, "expected BN running stats"


def test_resnet50_pooled_dim():
    m = image_encoder("resnet50", dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    vs = m.init(jax.random.key(0), x, train=False)
    (pooled,) = m.apply(vs, x, train=False)
    assert pooled.shape == (1, 2048)


@pytest.mark.parametrize("mode", ["branch", "full"])
def test_resnet_remat_modes_bit_exact(mode):
    """remat='branch' (save conv outputs + BN stats, recompute
    normalize/relu in backward) and remat='full' are pure recompute
    schedules: loss, gradients, and BN running-stat updates must be
    bit-identical to the no-remat baseline."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)

    def run(remat):
        m = image_encoder("resnet18", remat=remat)
        vs = m.init(jax.random.key(0), x, train=False)

        def loss(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out[0].astype(jnp.float32) ** 2), mut

        (l, mut), g = jax.value_and_grad(loss, has_aux=True)(vs["params"])
        return l, g, mut

    l0, g0, m0 = run(False)
    l1, g1, m1 = run(mode)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(m0),
                    jax.tree_util.tree_leaves(m1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_key_impl_selection(monkeypatch):
    """training_key: threefry off-TPU by default, env-overridable; the
    rbg impl drives a full split/fold chain (the augmentation pattern)."""
    from stil_tta_tpu.utils import jax_setup

    def impl(k):
        return str(jax.random.key_impl(k))

    assert "threefry" in impl(jax_setup.training_key(0))
    monkeypatch.setenv("STIL_PRNG_IMPL", "rbg")
    k = jax_setup.training_key(0)
    assert "rbg" in impl(k)
    a, b = jax.random.split(k)
    per_sample = jax.random.fold_in(a, 7)
    u = jax.random.uniform(per_sample, (4,))
    assert u.shape == (4,) and bool(jnp.all((u >= 0) & (u < 1)))
    monkeypatch.setenv("STIL_PRNG_IMPL", "threefry")  # legacy alias
    assert "threefry" in impl(jax_setup.training_key(0))


def test_tabular_transformer_shapes_and_mask():
    cat, con = split_field_lengths(FIELD_LENGTHS)
    enc = TabularTransformerEncoder(cat_lengths=cat, con_lengths=con,
                                    embedding_dim=64, num_layers=2,
                                    dtype=jnp.float32)
    x = tab_rows(4)
    vs = enc.init(jax.random.key(0), x)
    out = enc.apply(vs, x)
    assert out.shape == (4, 7, 64)  # CLS + 6 tokens

    missing = jnp.zeros((4, 6), bool).at[:, 2].set(True)
    out_m = enc.apply(vs, x, missing_mask=missing)
    assert out_m.shape == (4, 7, 64)
    assert not np.allclose(np.asarray(out), np.asarray(out_m))


def test_tabular_transformer_mask_blocks_information():
    """A fully-masked column must not influence other tokens' outputs."""
    cat, con = split_field_lengths(FIELD_LENGTHS)
    enc = TabularTransformerEncoder(cat_lengths=cat, con_lengths=con,
                                    embedding_dim=32, num_layers=1,
                                    dtype=jnp.float32)
    x = tab_rows(2)
    vs = enc.init(jax.random.key(0), x)
    missing = jnp.zeros((2, 6), bool).at[:, 5].set(True)
    out1 = enc.apply(vs, x, missing_mask=missing)
    x2 = x.at[:, 5].set(99.0)  # change the masked continuous column
    out2 = enc.apply(vs, x2, missing_mask=missing)
    np.testing.assert_allclose(np.asarray(out1[:, :6]),
                               np.asarray(out2[:, :6]), atol=1e-5)


def test_saint_encoder_shapes():
    enc = SAINTEncoder(cat_lengths=(5, 4, 2), num_continuous=3,
                       token_dim=32, depth=1, heads=4, dtype=jnp.float32)
    x = tab_rows(4)
    vs = enc.init(jax.random.key(0), x)
    out = enc.apply(vs, x)
    assert out.shape == (4, 7, 32)


def test_disco_backbone_forward_all():
    bb = DisCoBackbone(model="resnet18", field_lengths=FIELD_LENGTHS,
                       num_classes=7, tabular_embedding_dim=64,
                       multimodal_embedding_dim=64, tabular_num_layers=1,
                       multimodal_num_layers=1, dtype=jnp.float32)
    img = jnp.zeros((2, 64, 64, 3))
    tab = tab_rows(2)
    vs = bb.init(jax.random.key(0), img, tab, train=False)
    out = bb.apply(vs, img, tab, train=False)
    assert out["out_m"].shape == (2, 7)
    assert out["out_i"].shape == (2, 7)
    assert out["out_t"].shape == (2, 7)
    assert out["x_si_enhance"].shape == (2, 64)
    assert out["x_ai"].shape == (2, 64)
    assert out["x_st_enhance"].shape == (2, 64)
    assert out["x_at"].shape == (2, 64)
    assert out["x_c"].shape == (2, 64)
    # train mode (dropout + droppath + BN) needs rngs and mutable stats
    out2, _ = bb.apply(vs, img, tab, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.key(1)})
    assert out2["out_m"].shape == (2, 7)


def test_disco_backbone_saint_variant():
    bb = DisCoBackbone(model="resnet18", field_lengths=FIELD_LENGTHS,
                       num_classes=3, tabular_embedding_dim=64,
                       multimodal_embedding_dim=64,
                       tabular_encoder="saint", dtype=jnp.float32)
    img = jnp.zeros((2, 32, 32, 3))
    tab = tab_rows(2)
    vs = bb.init(jax.random.key(0), img, tab, train=False)
    out = bb.apply(vs, img, tab, train=False)
    assert out["out_m"].shape == (2, 3)


def test_match_backbone():
    bb = MatchBackbone(model="resnet18", field_lengths=FIELD_LENGTHS,
                       num_classes=5, projection_dim=16,
                       tabular_embedding_dim=64,
                       multimodal_embedding_dim=64, tabular_num_layers=1,
                       dtype=jnp.float32)
    img = jnp.zeros((2, 32, 32, 3))
    tab = tab_rows(2)
    vs = bb.init(jax.random.key(0), img, tab, train=False)
    logits, emb = bb.apply(vs, img, tab, train=False)
    assert logits.shape == (2, 5)
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1),
                               1.0, atol=1e-5)


def test_semimultimodal_backbone():
    bb = SemiMultimodalBackbone(model="resnet18",
                                field_lengths=FIELD_LENGTHS, num_classes=5,
                                projection_dim=16, tabular_embedding_dim=64,
                                multimodal_embedding_dim=64,
                                tabular_num_layers=1, dtype=jnp.float32)
    img = jnp.zeros((2, 32, 32, 3))
    tab = tab_rows(2)
    vs = bb.init(jax.random.key(0), img, tab, train=False)
    out_m, out_i, out_t, x_m = bb.apply(vs, img, tab, train=False)
    assert out_m.shape == (2, 5)
    assert out_i.shape == (2, 5)
    assert out_t.shape == (2, 5)
    assert x_m.shape == (2, 16)
