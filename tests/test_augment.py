"""On-device augmentation semantics (distribution-level parity with
utils/utils.py recipes; SURVEY.md §6 'match distributions')."""

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.data.augment import (AugmentPipeline, affine_warp,
                                       color_jitter, crop_resize_flip,
                                       default_pipeline, gaussian_blur,
                                       contrastive_pipeline,
                                       strong_pipeline, weak_pipeline)


def checkerboard(h=40, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((yy // 4 + xx // 4) % 2 * 255).astype(np.float32)
    return np.stack([img] * 3, -1) / 255.0


def test_default_pipeline_is_pure_resize():
    p = default_pipeline(16, "dvm")
    img = (checkerboard() * 255).astype(np.uint8)[None]
    out1 = p(jax.random.key(0), jnp.asarray(img))
    out2 = p(jax.random.key(1), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (1, 16, 16, 3)
    # matches a simple bilinear resize of the normalized image
    assert 0.3 < float(out1.mean()) < 0.7


def test_crop_resize_identity():
    img = jnp.asarray(checkerboard(32, 32))
    out = crop_resize_flip(img, jnp.float32(0), jnp.float32(0),
                           jnp.float32(32), jnp.float32(32), 32,
                           jnp.bool_(False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_crop_resize_flip_reverses_columns():
    img = jnp.asarray(checkerboard(32, 32))
    img = img.at[:, :16, :].set(0.0)  # left half black
    out = crop_resize_flip(img, jnp.float32(0), jnp.float32(0),
                           jnp.float32(32), jnp.float32(32), 32,
                           jnp.bool_(True))
    # flipped: right half black
    assert float(out[:, 16:, :].mean()) < 0.05
    assert float(out[:, :16, :].mean()) > 0.2


def test_affine_warp_matches_cropresize_at_zero_angle():
    img = jnp.asarray(checkerboard(40, 40))
    a = crop_resize_flip(img, jnp.float32(4), jnp.float32(6),
                         jnp.float32(20), jnp.float32(24), 16,
                         jnp.bool_(False))
    b = affine_warp(img, jnp.float32(4), jnp.float32(6), jnp.float32(20),
                    jnp.float32(24), 16, jnp.bool_(False), jnp.float32(0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gaussian_blur_identity_when_not_applied():
    img = jnp.asarray(checkerboard())
    out = gaussian_blur(img, jax.random.key(0), 9, 0.5, 1.0, p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_gaussian_blur_smooths():
    img = jnp.asarray(checkerboard())
    out = gaussian_blur(img, jax.random.key(0), 9, 2.0, 2.0, p=1.0)
    assert float(jnp.abs(jnp.diff(out[:, :, 0], axis=0)).mean()) < \
        float(jnp.abs(jnp.diff(img[:, :, 0], axis=0)).mean())
    # mean preserved (normalised kernel, reflect padding)
    np.testing.assert_allclose(float(out.mean()), float(img.mean()),
                               atol=0.02)


def test_color_jitter_brightness_only_direction():
    img = jnp.full((8, 8, 3), 0.5)
    out = color_jitter(img, jax.random.key(3), 0.5, 0.0, 0.0, 0.0, p=1.0)
    assert not np.allclose(np.asarray(out), 0.5)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_pipeline_gate_rate_zero_equals_default():
    p = contrastive_pipeline(16, "dvm")
    d = default_pipeline(16, "dvm")
    img = (checkerboard() * 255).astype(np.uint8)[None]
    gated = p(jax.random.key(5), jnp.asarray(img), apply_rate=0.0)
    base = d(jax.random.key(9), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(gated), np.asarray(base),
                               atol=1e-5)


def test_hflip_rate_distribution():
    # asymmetric image; count flips over many keys
    img = np.zeros((1, 8, 8, 3), np.uint8)
    img[:, :, :4] = 255
    p = AugmentPipeline(img_size=8, crop=False, hflip_p=0.5,
                        scale_255=True)
    flips = 0
    n = 200
    batch = jnp.asarray(np.repeat(img, n, axis=0))
    out = np.asarray(p(jax.random.key(0), batch))
    flips = (out[:, 0, 0, 0] < 0.5).sum()
    assert 60 < flips < 140  # ~Binomial(200, .5)


def test_cardiac_pipeline_no_255_scaling():
    p = weak_pipeline(8, "cardiac")
    img = jnp.full((2, 16, 16, 3), 3.0)  # raw float input
    out = p(jax.random.key(0), img)
    assert float(out.max()) > 1.5  # not normalised to [0,1]


def test_strong_pipeline_runs_with_hue():
    p = strong_pipeline(16, "dvm")
    img = (np.random.RandomState(0).rand(3, 24, 24, 3) * 255) \
        .astype(np.uint8)
    out = p(jax.random.key(1), jnp.asarray(img))
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dvm_pipelines_lower_with_zero_gathers():
    """Regression lock for the round-5 Match-family rescue: per-element
    XLA gathers under the per-sample vmap run on the TPU scalar slow
    path (SimMatch measured 467 ms/step from three image-sized gathers
    emitted by jnp.choose in the hue branch; reflect-pad and
    constant-start dynamic_slice are the other latent sources —
    docs/BENCHMARKS.md round-5). Every DVM augmentation recipe must
    lower gather-free. Cardiac recipes are exempt: their rotation
    (affine_warp) is bilinear gathers by construction, which XLA lowers
    to the fast batched form."""
    import re

    import jax

    from stil_tta_tpu.data.augment import (contrastive_pipeline,
                                           default_pipeline,
                                           hard_eval_pipeline,
                                           strong_pipeline, weak_pipeline)

    pipes = {
        "contrastive": contrastive_pipeline(32, "dvm"),
        "hard_eval": hard_eval_pipeline(32, "dvm"),
        "weak": weak_pipeline(32, "dvm"),
        "strong": strong_pipeline(32, "dvm"),
        "default": default_pipeline(32, "dvm"),
    }
    x = jnp.zeros((4, 32, 32, 3), jnp.uint8)
    for name, pipe in pipes.items():
        txt = jax.jit(lambda k, im, p=pipe: p(k, im)).lower(
            jax.random.key(0), x).as_text()
        n = len(re.findall(r"stablehlo\.gather", txt))
        assert n == 0, f"{name} pipeline lowers with {n} gather op(s)"
