"""Fused on-device image augmentation.

Replaces the reference's CPU albumentations pipelines
(``/root/reference/utils/utils.py:46-256``: contrastive / soft-eval /
hard-eval / weak / strong factories x {dvm, cardiac}) with a single
jitted, batched device pipeline. The reference burns 10 dataloader worker
processes on decode+augment (``config_dvm_STiL.yaml:31``); here the whole
batch is augmented on-chip in the train step:

- **Crop + resize + horizontal flip run on the MXU**: bilinear
  resampling of an axis-aligned crop is separable, so we build per-sample
  banded row/col matrices Ry (S, H), Rx (S, W) with the triangle kernel
  ``relu(1 - |src - j|)`` and contract ``Ry @ img @ Rx^T``. A flip is a
  reversal of the source coordinates — free.
- **Color jitter / grayscale run on the VPU** as pointwise math.
- **Gaussian blur** is a separable 29-tap filter realised as shifted
  adds over a reflect-padded image, with the per-sample kernel collapsing
  to an identity delta when the op is not selected (branch-free p-gating).
- **Rotation** (cardiac) composes with crop/resize/flip into a single
  affine bilinear gather evaluated only at the S x S output grid.
  Pointwise jitter commutes with geometry, so the cardiac order
  (flip -> rotate -> jitter -> crop, ``utils.py:187-216``) is computed as
  jitter -> fused warp with identical semantics.

Known distributional divergences from albumentations (documented per
SURVEY.md §6 "match distributions, not traces"): float math throughout
(albumentations round-trips uint8 after each op), color-jitter ops in
fixed order (albumentations shuffles the op order), and RandomResizedCrop
clamps the sampled box instead of the 10-attempt rejection loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# pointwise color ops (torchvision-formula parity)
# ---------------------------------------------------------------------------

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _grayscale(img: Array) -> Array:
    return jnp.tensordot(img, _LUMA, axes=[[-1], [0]])[..., None]


def _rgb_to_hsv(img: Array):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.clip(maxc, 1e-12), 0.0)
    safe = jnp.clip(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: Array, s: Array, v: Array) -> Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    # nested selects, NOT jnp.choose: choose lowers to a per-element
    # XLA gather, which under the per-sample vmap hits the TPU's
    # scalar slow path (three image-sized gathers measured 380 ms/step
    # of the 467 ms SimMatch step — round 5, docs/BENCHMARKS.md).
    # Same values: i is already in [0, 5].

    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0, jnp.where(i == 1, c1, jnp.where(
            i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))))

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(img: Array, key: Array, brightness: float, contrast: float,
                 saturation: float, hue: float, p: float) -> Array:
    """Torchvision-formula jitter on a float [0,1] HWC image; factors
    sampled uniform in [max(0, 1-x), 1+x], hue in [-hue, hue]."""
    ks = jax.random.split(key, 5)
    apply = jax.random.uniform(ks[0]) < p

    def sample(k, x):
        return jax.random.uniform(k, minval=max(0.0, 1.0 - x),
                                  maxval=1.0 + x)

    fb = jnp.where(apply, sample(ks[1], brightness), 1.0)
    fc = jnp.where(apply, sample(ks[2], contrast), 1.0)
    fs = jnp.where(apply, sample(ks[3], saturation), 1.0)
    fh = jnp.where(apply & (hue > 0),
                   jax.random.uniform(ks[4], minval=-hue, maxval=hue), 0.0)

    img = jnp.clip(img * fb, 0.0, 1.0)
    mean_gray = jnp.mean(_grayscale(img))
    img = jnp.clip(mean_gray + fc * (img - mean_gray), 0.0, 1.0)
    gray = _grayscale(img)
    img = jnp.clip(gray + fs * (img - gray), 0.0, 1.0)
    if hue > 0:
        h, s, v = _rgb_to_hsv(img)
        img = _hsv_to_rgb((h + fh) % 1.0, s, v)
    return img


def random_grayscale(img: Array, key: Array, p: float) -> Array:
    gray = jnp.repeat(_grayscale(img), 3, axis=-1)
    return jnp.where(jax.random.uniform(key) < p, gray, img)


# ---------------------------------------------------------------------------
# Gaussian blur: separable shifted adds on a reflect-padded image
# ---------------------------------------------------------------------------

def _gaussian_kernel(sigma: Array, ksize: int) -> Array:
    half = ksize // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    w = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return w / jnp.sum(w)


def gaussian_blur(img: Array, key: Array, ksize: int, sigma_lo: float,
                  sigma_hi: float, p: float) -> Array:
    """Per-sample sigma ~ U(lo, hi), applied with probability p (identity
    delta kernel otherwise — branch-free)."""
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, minval=sigma_lo, maxval=sigma_hi)
    w = _gaussian_kernel(sigma, ksize)
    half = ksize // 2
    delta = jnp.zeros(ksize).at[half].set(1.0)
    w = jnp.where(jax.random.uniform(k2) < p, w, delta)

    def sep_pass(x, axis):
        n = x.shape[axis]
        # explicit reflect pad (slice + reverse + concat). jnp.pad
        # mode='reflect' lowers to an XLA gather, and under the
        # per-sample vmap that gather hits the TPU's scalar slow path:
        # the SimMatch/CoMatch strong-aug blur measured 380-760 ms/step
        # of a ~90 ms step before this rewrite (round 5,
        # docs/BENCHMARKS.md). Same values bit-for-bit.
        lo = jax.lax.rev(jax.lax.slice_in_dim(x, 1, half + 1, axis=axis),
                         (axis,))
        hi = jax.lax.rev(jax.lax.slice_in_dim(x, n - half - 1, n - 1,
                                              axis=axis), (axis,))
        xp = jnp.concatenate([lo, x, hi], axis=axis)
        acc = jnp.zeros_like(x)
        for i in range(ksize):
            acc = acc + w[i] * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
        return acc

    return sep_pass(sep_pass(img, 0), 1)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def sample_crop_box(key: Array, h: int, w: int, scale: Tuple[float, float],
                    ratio: Tuple[float, float]):
    """RandomResizedCrop box (torchvision/albumentations parameterisation,
    clamped instead of the 10-attempt loop). Returns (y0, x0, ch, cw)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = float(h * w)
    target = jax.random.uniform(k1, minval=scale[0], maxval=scale[1]) * area
    log_r = jax.random.uniform(
        k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(target * r), 1.0, float(w))
    ch = jnp.clip(jnp.sqrt(target / r), 1.0, float(h))
    y0 = jax.random.uniform(k3) * (float(h) - ch)
    x0 = jax.random.uniform(k4) * (float(w) - cw)
    return y0, x0, ch, cw


def _resize_matrix(src0: Array, src_len: Array, in_len: int, out_len: int,
                   flip: Optional[Array] = None) -> Array:
    """(out_len, in_len) bilinear resampling matrix for the 1-D crop
    [src0, src0 + src_len) -> out_len samples; triangle-kernel rows."""
    i = jnp.arange(out_len, dtype=jnp.float32)
    if flip is not None:
        i = jnp.where(flip, out_len - 1.0 - i, i)
    src = src0 + (i + 0.5) * (src_len / out_len) - 0.5
    src = jnp.clip(src, 0.0, in_len - 1.0)
    j = jnp.arange(in_len, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))


def _compose_blur(r: Array, w: Array) -> Array:
    """Fold a separable Gaussian into a resampling matrix.

    blur-then-resample is linear along each axis, so
    ``C[s, m] = sum_k w[k] * R[s, m - k + half]`` — the 29-tap blur
    collapses into the (S, H) matrix instead of 58 full-resolution VPU
    passes over the image. Rows are renormalised (approximates the
    reference's reflect border at the edges)."""
    k = w.shape[0]
    half = k // 2
    s, h = r.shape
    rp = jnp.pad(r, ((0, 0), (half, half)))
    c = jnp.zeros_like(r)
    for i in range(k):
        # C[:, m] += w[i] * R[:, m - i + half]  (window slides over
        # pad). Static slice, not dynamic_slice: vmap turns
        # dynamic_slice into a gather even for constant starts.
        c = c + w[i] * jax.lax.slice_in_dim(
            rp, k - 1 - i, k - 1 - i + h, axis=1)
    return c / jnp.clip(jnp.sum(c, axis=1, keepdims=True), 1e-8)


def crop_resize_flip(img: Array, y0, x0, ch, cw, out_size: int,
                     flip, blur_w: Optional[Array] = None) -> Array:
    """MXU path: out = Ry @ img @ Rx^T (single image; vmapped by caller).
    With ``blur_w`` (a normalised 1-D Gaussian), the blur is composed
    into both resampling matrices."""
    h, w, _ = img.shape
    ry = _resize_matrix(y0, ch, h, out_size)
    rx = _resize_matrix(x0, cw, w, out_size, flip=flip)
    if blur_w is not None:
        ry = _compose_blur(ry, blur_w)
        rx = _compose_blur(rx, blur_w)
    tmp = jnp.einsum("sh,hwc->swc", ry, img,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("tw,swc->stc", rx, tmp,
                      preferred_element_type=jnp.float32)


def affine_warp(img: Array, y0, x0, ch, cw, out_size: int, flip,
                angle_rad) -> Array:
    """Gather path: rotation about the image centre composed with
    crop/resize/flip, evaluated on the S x S output grid only."""
    h, w, _ = img.shape
    i = jnp.arange(out_size, dtype=jnp.float32)
    sy = y0 + (i + 0.5) * (ch / out_size) - 0.5
    jx = jnp.arange(out_size, dtype=jnp.float32)
    jxf = jnp.where(flip, out_size - 1.0 - jx, jx)
    sx = x0 + (jxf + 0.5) * (cw / out_size) - 0.5
    yy = jnp.broadcast_to(sy[:, None], (out_size, out_size))
    xx = jnp.broadcast_to(sx[None, :], (out_size, out_size))
    # rotate sample points about the full-image centre (inverse map)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ca, sa = jnp.cos(angle_rad), jnp.sin(angle_rad)
    ys = cy + ca * (yy - cy) - sa * (xx - cx)
    xs = cx + sa * (yy - cy) + ca * (xx - cx)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0i = jnp.floor(ys).astype(jnp.int32)
    x0i = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    wy = (ys - y0i)[..., None]
    wx = (xs - x0i)[..., None]
    p00 = img[y0i, x0i]
    p01 = img[y0i, x1i]
    p10 = img[y1i, x0i]
    p11 = img[y1i, x1i]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AugmentPipeline:
    """One augmentation recipe, applied batched on device.

    ``__call__(key, images)`` with images (B, H, W, 3) uint8 or float
    returns (B, img_size, img_size, 3) f32 in [0, 1] (dvm, scale_255)
    or raw scale (cardiac).
    """

    img_size: int
    crop: bool = True
    crop_scale: Tuple[float, float] = (0.08, 1.0)
    crop_ratio: Tuple[float, float] = (0.75, 4.0 / 3.0)
    hflip_p: float = 0.5
    jitter: Optional[Tuple[float, float, float, float]] = None
    jitter_p: float = 1.0
    gray_p: float = 0.0
    blur_ksize: int = 0
    blur_sigma: Tuple[float, float] = (0.1, 2.0)
    blur_p: float = 0.0
    rotate_limit: float = 0.0  # degrees; > 0 switches to the gather path
    blur_before_crop: bool = True
    # jitter placement matters for the contrast/saturation image means:
    # dvm contrastive/hard-eval jitter the full image before cropping
    # (``utils.py:52-58``), the strong recipe jitters the crop
    # (``utils.py:222-228``).
    jitter_before_crop: bool = True
    scale_255: bool = True

    def _pointwise(self, img, k_jit, k_gray):
        if self.jitter is not None:
            img = color_jitter(img, k_jit, *self.jitter, self.jitter_p)
        if self.gray_p > 0:
            img = random_grayscale(img, k_gray, self.gray_p)
        return img

    def _augment_one(self, key: Array, img: Array, gate: Array) -> Array:
        """``gate`` False collapses the recipe to the resize-only default
        transform — the branch-free realisation of the reference's
        per-sample ``random() < augmentation_rate`` choice
        (``ContrastiveImagingAndTabularDataset.py:190-196``,
        ``ImagingAndTabularDataset`` eval_train_augment_rate)."""
        ks = jax.random.split(key, 6)
        h, w = img.shape[0], img.shape[1]
        if self.jitter_before_crop:
            img = self._pointwise_gated(img, ks[0], ks[1], gate)
        blur_w = None
        if self.blur_ksize > 0 and self.blur_before_crop:
            if self.rotate_limit == 0:
                # compose the blur into the resize matrices (MXU path)
                kb1, kb2 = jax.random.split(ks[2])
                sigma = jax.random.uniform(kb1, minval=self.blur_sigma[0],
                                           maxval=self.blur_sigma[1])
                wk = _gaussian_kernel(sigma, self.blur_ksize)
                half = self.blur_ksize // 2
                delta = jnp.zeros(self.blur_ksize).at[half].set(1.0)
                on = (jax.random.uniform(kb2) < self.blur_p) & gate
                blur_w = jnp.where(on, wk, delta)
            else:
                blurred = gaussian_blur(img, ks[2], self.blur_ksize,
                                        *self.blur_sigma, self.blur_p)
                img = jnp.where(gate, blurred, img)
        if self.crop:
            y0, x0, ch, cw = sample_crop_box(ks[3], h, w, self.crop_scale,
                                             self.crop_ratio)
            y0 = jnp.where(gate, y0, 0.0)
            x0 = jnp.where(gate, x0, 0.0)
            ch = jnp.where(gate, ch, float(h))
            cw = jnp.where(gate, cw, float(w))
        else:
            y0 = x0 = jnp.float32(0.0)
            ch, cw = jnp.float32(h), jnp.float32(w)
        flip = (jax.random.uniform(ks[4]) < self.hflip_p) & gate \
            if self.hflip_p > 0 else jnp.bool_(False)
        if self.rotate_limit > 0:
            lim = jnp.deg2rad(self.rotate_limit)
            angle = jax.random.uniform(ks[5], minval=-lim, maxval=lim)
            angle = jnp.where(gate, angle, 0.0)
            img = affine_warp(img, y0, x0, ch, cw, self.img_size, flip,
                              angle)
        else:
            img = crop_resize_flip(img, y0, x0, ch, cw, self.img_size,
                                   flip, blur_w=blur_w)
        if not self.jitter_before_crop:
            img = self._pointwise_gated(img, ks[0], ks[1], gate)
        if self.blur_ksize > 0 and not self.blur_before_crop:
            blurred = gaussian_blur(img, ks[2], self.blur_ksize,
                                    *self.blur_sigma, self.blur_p)
            img = jnp.where(gate, blurred, img)
        return img

    def _pointwise_gated(self, img, kj, kg, gate):
        out = self._pointwise(img, kj, kg)
        return jnp.where(gate, out, img)

    def __call__(self, key: Array, images: Array,
                 apply_rate: float = 1.0) -> Array:
        """apply_rate < 1 applies the recipe per sample with that
        probability, the resize-only default otherwise."""
        b = images.shape[0]
        imgs = images.astype(jnp.float32)
        if self.scale_255:
            imgs = jnp.clip(imgs, 0.0, 255.0) / 255.0
        k_gate, k_aug = jax.random.split(key)
        if apply_rate >= 1.0:
            gates = jnp.ones((b,), bool)
        else:
            gates = jax.random.uniform(k_gate, (b,)) < apply_rate
        keys = jax.random.split(k_aug, b)
        out = jax.vmap(self._augment_one)(keys, imgs, gates)
        return jnp.clip(out, 0.0, 1.0) if self.scale_255 else out


# ---------------------------------------------------------------------------
# factories mirroring utils/utils.py:46-256
# ---------------------------------------------------------------------------

def contrastive_pipeline(img_size: int, target: str,
                         crop_scale_lower: float = 0.08) -> AugmentPipeline:
    """``grab_image_augmentations`` (``utils.py:46-91``)."""
    if target.lower() == "dvm":
        return AugmentPipeline(
            img_size=img_size, crop_scale=(crop_scale_lower, 1.0),
            jitter=(0.8, 0.8, 0.8, 0.0), jitter_p=0.8, gray_p=0.2,
            blur_ksize=29, blur_sigma=(0.1, 2.0), blur_p=0.5,
            blur_before_crop=True, scale_255=True)
    return AugmentPipeline(
        img_size=img_size, crop_scale=(0.2, 1.0), rotate_limit=45.0,
        jitter=(0.5, 0.5, 0.5, 0.0), jitter_p=1.0, scale_255=False)


def soft_eval_pipeline(img_size: int, target: str) -> AugmentPipeline:
    """``grab_soft_eval_image_augmentations`` (``utils.py:94-136``)."""
    return AugmentPipeline(
        img_size=img_size, crop_scale=(0.8, 1.0), rotate_limit=20.0,
        jitter=(0.25, 0.25, 0.25, 0.0), jitter_p=1.0,
        scale_255=target.lower() == "dvm")


def hard_eval_pipeline(img_size: int, target: str) -> AugmentPipeline:
    """``grab_hard_eval_image_augmentations`` (``utils.py:139-184``)."""
    if target.lower() == "dvm":
        return AugmentPipeline(
            img_size=img_size, crop_scale=(0.6, 1.0),
            jitter=(0.8, 0.8, 0.8, 0.0), jitter_p=0.8, gray_p=0.2,
            blur_ksize=29, blur_sigma=(0.1, 2.0), blur_p=0.5,
            blur_before_crop=True, scale_255=True)
    return AugmentPipeline(
        img_size=img_size, crop_scale=(0.6, 1.0), rotate_limit=45.0,
        jitter=(0.5, 0.5, 0.5, 0.0), jitter_p=1.0, scale_255=False)


def weak_pipeline(img_size: int, target: str) -> AugmentPipeline:
    """``grab_weak_image_augmentations`` (``utils.py:187-216``)."""
    return AugmentPipeline(
        img_size=img_size, crop_scale=(0.2, 1.0),
        scale_255=target.lower() == "dvm")


def strong_pipeline(img_size: int, target: str) -> AugmentPipeline:
    """``grab_strong_image_augmentations`` (``utils.py:219-256``): crop
    first, then jitter(+hue)/gray/blur at the output resolution."""
    dvm = target.lower() == "dvm"
    return AugmentPipeline(
        img_size=img_size, crop_scale=(0.2, 1.0),
        jitter=(0.4, 0.4, 0.4, 0.1), jitter_p=0.8,
        gray_p=0.2 if dvm else 0.0,
        blur_ksize=19, blur_sigma=(0.1, 2.0), blur_p=0.5,
        blur_before_crop=False, jitter_before_crop=False, scale_255=dvm)


def default_pipeline(img_size: int, target: str) -> AugmentPipeline:
    """Eval resize-only transform
    (``ContrastiveImagingAndTabularDataset.py:70-90``)."""
    return AugmentPipeline(
        img_size=img_size, crop=False, hflip_p=0.0,
        scale_255=target.lower() == "dvm")
