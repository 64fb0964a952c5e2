"""Extended model zoo: ViT, ResNeXt/wide variants, legacy TIP modules,
serving predictor."""

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.models.resnet import EMBEDDING_DIM, image_encoder
from stil_tta_tpu.models.tabular_transformer import (
    MultimodalTransformerEncoder, TabularPredictor)


def test_vit_contracts():
    m = image_encoder("vit_small", return_all_feature_maps=True,
                      dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.key(0), x, train=False)
    (grid,) = m.apply(v, x, train=False)
    assert grid.shape == (2, 2, 2, 384)
    m2 = image_encoder("vit_small", dtype=jnp.float32)
    v2 = m2.init(jax.random.key(0), x, train=False)
    (cls,) = m2.apply(v2, x, train=False)
    assert cls.shape == (2, 384)


def test_resnext_and_wide():
    x = jnp.zeros((1, 32, 32, 3))
    for name in ("resnext50_32x4d", "wide_resnet50_2"):
        m = image_encoder(name, dtype=jnp.float32)
        v = m.init(jax.random.key(0), x, train=False)
        (pooled,) = m.apply(v, x, train=False)
        assert pooled.shape == (1, EMBEDDING_DIM[name])


def test_disco_backbone_with_vit():
    from stil_tta_tpu.models.backbones import DisCoBackbone
    bb = DisCoBackbone(model="vit_small", field_lengths=[5, 4, 2, 1, 1],
                       num_classes=3, tabular_embedding_dim=32,
                       multimodal_embedding_dim=32, tabular_num_layers=1,
                       dtype=jnp.float32)
    img = jnp.zeros((2, 32, 32, 3))
    tab = jnp.zeros((2, 5))
    vs = bb.init(jax.random.key(0), img, tab, train=False)
    out = bb.apply(vs, img, tab, train=False)
    assert out["out_m"].shape == (2, 3)


def test_legacy_tip_modules():
    mm = MultimodalTransformerEncoder(
        embedding_dim=64, multimodal_embedding_dim=32,
        tabular_embedding_dim=32, num_layers=1, dtype=jnp.float32)
    tok = jnp.zeros((2, 5, 32))
    imgf = jnp.zeros((2, 2, 2, 64))
    v = mm.init(jax.random.key(0), tok, imgf)
    assert mm.apply(v, tok, imgf).shape == (2, 5, 32)

    tp = TabularPredictor(cat_lengths=(5, 4), con_lengths=(1, 1),
                          dtype=jnp.float32)
    vp = tp.init(jax.random.key(0), jnp.zeros((2, 5, 32)))
    cat_out, con_out = tp.apply(vp, jnp.zeros((2, 5, 32)))
    assert cat_out.shape == (2, 2, 9)  # 2 cat tokens x 9 unique values
    assert con_out.shape == (2, 2, 1)


def test_predictor_serving(tmp_path):
    from stil_tta_tpu.serve import Predictor
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from tests.helpers import IMG, tiny_cfg, tiny_data

    cfg = tiny_cfg("config_dvm_STiL")
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src, _ = tiny_data(n_l=10)
    state = algo.init_state(jax.random.key(0),
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            jnp.asarray(src.tabular[:2]))
    pred = Predictor(algo, state, batch_size=4)
    probs = pred(np.asarray(src.images), src.tabular)
    assert probs.shape == (10, cfg.num_classes)  # tail padding stripped
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_predictor_serving_data_parallel():
    """SPMD serving: batch sharded over the 8-device mesh gives the same
    probabilities as single-device serving (per-sample math unchanged;
    GSPMD only splits the batch axis)."""
    from stil_tta_tpu.parallel.mesh import create_mesh
    from stil_tta_tpu.serve import Predictor
    from stil_tta_tpu.algorithms.registry import get_algorithm
    from tests.helpers import IMG, tiny_cfg, tiny_data

    cfg = tiny_cfg("config_dvm_STiL")
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    src, _ = tiny_data(n_l=10)
    state = algo.init_state(jax.random.key(0),
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            jnp.asarray(src.tabular[:2]))
    base = Predictor(algo, state, batch_size=8)(
        np.asarray(src.images), src.tabular)

    mesh = create_mesh(8)
    pred = Predictor(algo, state, batch_size=6, mesh=mesh)
    assert pred.batch_size == 8  # global batch rounded up to mesh size
    probs = pred(np.asarray(src.images), src.tabular)
    assert probs.shape == (10, cfg.num_classes)
    # bf16 forward: per-device tiling changes accumulation order; same
    # tolerance family as the training-mesh tests (test_mesh.py)
    np.testing.assert_allclose(probs, base, atol=2e-3)
    assert np.argmax(probs, 1).tolist() == np.argmax(base, 1).tolist()


def test_attention_capture():
    from stil_tta_tpu.models.tabular_transformer import \
        TabularTransformerEncoder
    from stil_tta_tpu.utils.profiling import capture_attention
    enc = TabularTransformerEncoder(cat_lengths=(5, 4), con_lengths=[1],
                                    embedding_dim=32, num_layers=2,
                                    dtype=jnp.float32)
    x = jnp.zeros((2, 3))
    v = enc.init(jax.random.key(0), x)
    tokens, maps = capture_attention(enc, v, x)
    assert tokens.shape == (2, 4, 32)
    assert len(maps) == 2
    assert maps[0].shape == (2, 8, 4, 4)
    np.testing.assert_allclose(np.asarray(maps[0]).sum(-1), 1.0,
                               rtol=1e-5)


def test_attention_gradients():
    from stil_tta_tpu.models.tabular_transformer import \
        TabularTransformerEncoder
    from stil_tta_tpu.utils.profiling import attention_gradients
    enc = TabularTransformerEncoder(cat_lengths=(5, 4), con_lengths=[1],
                                    embedding_dim=32, num_layers=2,
                                    dtype=jnp.float32)
    x = jnp.zeros((2, 3))
    v = enc.init(jax.random.key(0), x)
    grads = attention_gradients(enc, v, x,
                                lambda tokens: tokens[:, 0, :].sum())
    assert len(grads) == 2
    assert grads[0].shape == (2, 8, 4, 4)
    # CLS-sum scalar must have nonzero sensitivity to the attention maps
    assert float(np.abs(np.asarray(grads[0])).sum()) > 0


def test_out_of_range_categorical_values_stay_finite():
    """Out-of-range / negative categorical codes must clamp, not hit
    jnp.take's NaN fill (torch would hard-crash; serving shouldn't)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stil_tta_tpu.models.tabular_transformer import (
        TabularTransformerEncoder)
    from stil_tta_tpu.models.saint import SAINTEncoder

    fl = (5, 4, 2, 1, 1)
    bad = jnp.asarray([[-3.0, 99.0, 1.4, 0.5, -2.0],
                       [7.0, -1.0, 5.0, 1.0, 3.0]])
    enc = TabularTransformerEncoder(cat_lengths=fl[:3],
                                    con_lengths=fl[3:],
                                    embedding_dim=32, num_layers=1)
    v = enc.init(jax.random.key(0), bad)
    out = enc.apply(v, bad)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    se = SAINTEncoder(cat_lengths=(5, 4, 2), num_continuous=2,
                      token_dim=8, depth=1, heads=2)
    v = se.init(jax.random.key(0), bad)
    out = se.apply(v, bad)
    assert np.isfinite(np.asarray(out, np.float32)).all()
