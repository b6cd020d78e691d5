"""Batched on-device data augmentation.

TPU-native replacement for the reference's albumentations pipelines
(reference src/models/augmentation.py:8-95).  The reference augments one
image at a time on the CPU -- its phase-3 trainer even round-trips every
device batch back to numpy to produce two strong views
(reference src/models/unsupervised_trainer.py:100-114).  Here the whole
pipeline is a pure jittable function of (rng key, uint8 batch): it fuses
into the train step, runs on the VPU, and two "strong views" are just two
key splits of the same batched call.

Coverage vs the reference pipelines (weak=get_training_augmentation,
strong=get_strong_augmentation):

  rot90 / flip / transpose            exact
  gaussian noise                      exact (variance ranges mirrored)
  blur (motion/median/box family)     box-blur approximation, size mirrored
  shift-scale-rotate                  exact (bilinear image / nearest mask,
                                      reflect-101 border like albumentations)
  brightness-contrast / sharpen       exact
  hue-saturation-value                exact (jnp RGB<->HSV)
  CLAHE / emboss / optical-grid-      not implemented on device: data-
    elastic distortions               dependent or negligible-value ops;
                                      the OneOf groups containing them fall
                                      back to their tractable members.
  Normalize (ImageNet) + ToTensor     fused into the same kernel; output is
                                      float32 NHWC (cast to bf16 at model).

Every op draws per-image randomness (vmap over a per-image key), matching
albumentations' per-item semantics.
"""

from __future__ import annotations

import dataclasses
import threading
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.config import Config

IMAGENET_MEAN = jnp.asarray(Config.NORMALIZE_MEAN, dtype=jnp.float32)
IMAGENET_STD = jnp.asarray(Config.NORMALIZE_STD, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probabilities/magnitudes for one augmentation pipeline (hashable/static)."""

    # geometric
    p_rot90: float = 0.5
    p_flip: float = 0.5
    p_transpose: float = 0.5
    p_ssr: float = 0.2
    shift_limit: float = 0.0625
    scale_limit: float = 0.2
    rotate_limit: float = 45.0
    # photometric
    p_noise: float = 0.2
    noise_std: Tuple[float, float] = (10.0 / 255.0, 50.0 ** 0.5 / 255.0)
    p_blur: float = 0.2
    blur_size: int = 3
    p_color: float = 0.3          # OneOf {sharpen, brightness/contrast}
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    p_hsv: float = 0.3
    hue_shift: float = 20.0 / 360.0
    sat_shift: float = 30.0 / 255.0
    val_shift: float = 20.0 / 255.0


# Reference weak pipeline: src/models/augmentation.py:8-38
WEAK = AugmentConfig()

# Reference strong pipeline: src/models/augmentation.py:40-88
STRONG = AugmentConfig(
    p_rot90=0.7, p_flip=0.7, p_transpose=0.7,
    p_ssr=0.5, shift_limit=0.1, scale_limit=0.3, rotate_limit=60.0,
    p_noise=0.4, noise_std=(20.0 ** 0.5 / 255.0, 80.0 ** 0.5 / 255.0),
    p_blur=0.4, blur_size=5,
    p_color=0.5, brightness_limit=0.3, contrast_limit=0.3,
    p_hsv=0.4, hue_shift=20.0 / 360.0, sat_shift=30.0 / 255.0,
    val_shift=20.0 / 255.0,
)

# Validation pipeline: normalize only (src/models/augmentation.py:90-95)
NONE = AugmentConfig(
    p_rot90=0.0, p_flip=0.0, p_transpose=0.0, p_ssr=0.0,
    p_noise=0.0, p_blur=0.0, p_color=0.0, p_hsv=0.0,
)


# ---------------------------------------------------------------------------
# primitives (single image, HWC float32 in [0, 1])
# ---------------------------------------------------------------------------
def _bern(key, p: float):
    return jax.random.uniform(key) < p


def _reflect_index(idx, n):
    """Reflect-101 boundary indexing (matches cv2.BORDER_REFLECT_101)."""
    period = 2 * (n - 1)
    r = jnp.mod(idx, period)
    r = jnp.where(r < 0, r + period, r)
    return jnp.where(r < n, r, period - r)


def _affine_warp(img, mask, shift, scale, angle_rad):
    """Inverse-map affine warp about the image center.

    Image sampled bilinearly, mask nearest; reflect-101 borders.
    ``img``: (H, W, C) float32; ``mask``: (H, W) int32 or None.
    """
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # forward transform: rotate+scale about center, then shift.
    # inverse map: out pixel -> src = R^-1 S^-1 ((out - shift) - c) + c
    inv_scale = 1.0 / scale
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ox = xx - cx - shift[0] * w
    oy = yy - cy - shift[1] * h
    sx = (cos * ox + sin * oy) * inv_scale + cx
    sy = (-sin * ox + cos * oy) * inv_scale + cy

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = _reflect_index(x0.astype(jnp.int32), w)
    x1i = _reflect_index(x0.astype(jnp.int32) + 1, w)
    y0i = _reflect_index(y0.astype(jnp.int32), h)
    y1i = _reflect_index(y0.astype(jnp.int32) + 1, h)

    ia = img[y0i, x0i]
    ib = img[y0i, x1i]
    ic = img[y1i, x0i]
    idd = img[y1i, x1i]
    fx1 = fx[..., None]
    fy1 = fy[..., None]
    out = (ia * (1 - fx1) * (1 - fy1) + ib * fx1 * (1 - fy1)
           + ic * (1 - fx1) * fy1 + idd * fx1 * fy1)

    out_mask = None
    if mask is not None:
        xn = _reflect_index(jnp.round(sx).astype(jnp.int32), w)
        yn = _reflect_index(jnp.round(sy).astype(jnp.int32), h)
        out_mask = mask[yn, xn]
    return out, out_mask


def _rot90_pair(img, mask, k):
    def rot(n):
        def f(_):
            i = jnp.rot90(img, n, axes=(0, 1))
            m = jnp.rot90(mask, n, axes=(0, 1)) if mask is not None else None
            return i, m
        return f
    return jax.lax.switch(k, [rot(0), rot(1), rot(2), rot(3)], None)


def _flip_pair(img, mask, code):
    """code: 0 = horizontal, 1 = vertical, 2 = both (cv2 flip-code semantics)."""
    def mk(axes):
        def f(_):
            i = img
            m = mask
            for ax in axes:
                i = jnp.flip(i, axis=ax)
                m = jnp.flip(m, axis=ax) if m is not None else None
            return i, m
        return f
    return jax.lax.switch(code, [mk((1,)), mk((0,)), mk((0, 1))], None)


def _geometric_one(key, img, mask, cfg: AugmentConfig):
    """All geometric ops for one image (+ aligned mask)."""
    k = jax.random.split(key, 8)

    # RandomRotate90(p): with prob p rotate by k*90, k ~ U{0..3}
    do = _bern(k[0], cfg.p_rot90)
    kk = jnp.where(do, jax.random.randint(k[1], (), 0, 4), 0)
    img, mask = _rot90_pair(img, mask, kk)

    # Flip(p): with prob p flip h / v / both uniformly
    do = _bern(k[2], cfg.p_flip)
    code = jax.random.randint(k[3], (), 0, 3)
    fimg, fmask = _flip_pair(img, mask, code)
    img = jnp.where(do, fimg, img)
    mask = jnp.where(do, fmask, mask) if mask is not None else None

    # Transpose(p)
    do = _bern(k[4], cfg.p_transpose)
    img = jnp.where(do, jnp.swapaxes(img, 0, 1), img)
    if mask is not None:
        mask = jnp.where(do, jnp.swapaxes(mask, 0, 1), mask)

    # ShiftScaleRotate(p)
    if cfg.p_ssr > 0:
        do = _bern(k[5], cfg.p_ssr)
        sk = jax.random.split(k[6], 4)
        shift = jax.random.uniform(sk[0], (2,), minval=-cfg.shift_limit,
                                   maxval=cfg.shift_limit)
        scale = 1.0 + jax.random.uniform(sk[1], (), minval=-cfg.scale_limit,
                                         maxval=cfg.scale_limit)
        ang = jnp.deg2rad(jax.random.uniform(sk[2], (), minval=-cfg.rotate_limit,
                                             maxval=cfg.rotate_limit))
        wimg, wmask = _affine_warp(img, mask, shift, scale, ang)
        img = jnp.where(do, wimg, img)
        if mask is not None:
            mask = jnp.where(do, wmask, mask)
    return img, mask


def _box_blur(img, size: int):
    """Depthwise box blur (approximates the reference's blur OneOf family)."""
    c = img.shape[-1]
    kernel = jnp.ones((size, size, 1, 1), dtype=img.dtype) / (size * size)
    kernel = jnp.tile(kernel, (1, 1, 1, c))          # HWIO, feature groups
    x = img[None]                                     # NHWC
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return y[0]


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _photometric_one(key, img, cfg: AugmentConfig):
    """All photometric ops for one image (mask untouched)."""
    k = jax.random.split(key, 10)

    # gaussian noise
    if cfg.p_noise > 0:
        do = _bern(k[0], cfg.p_noise)
        std = jax.random.uniform(k[1], (), minval=cfg.noise_std[0],
                                 maxval=cfg.noise_std[1])
        noise = jax.random.normal(k[2], img.shape) * std
        img = jnp.where(do, jnp.clip(img + noise, 0.0, 1.0), img)

    # blur family -> box blur
    if cfg.p_blur > 0:
        do = _bern(k[3], cfg.p_blur)
        img = jnp.where(do, _box_blur(img, cfg.blur_size), img)

    # color OneOf {sharpen, brightness/contrast}
    if cfg.p_color > 0:
        do = _bern(k[4], cfg.p_color)
        which = _bern(k[5], 0.5)
        sharp = jnp.clip(img + 0.6 * (img - _box_blur(img, 3)), 0.0, 1.0)
        b = jax.random.uniform(k[6], (), minval=-cfg.brightness_limit,
                               maxval=cfg.brightness_limit)
        c = 1.0 + jax.random.uniform(k[7], (), minval=-cfg.contrast_limit,
                                     maxval=cfg.contrast_limit)
        bc = jnp.clip((img - 0.5) * c + 0.5 + b, 0.0, 1.0)
        img = jnp.where(do, jnp.where(which, sharp, bc), img)

    # HSV jitter
    if cfg.p_hsv > 0:
        do = _bern(k[8], cfg.p_hsv)
        sk = jax.random.split(k[9], 3)
        dh = jax.random.uniform(sk[0], (), minval=-cfg.hue_shift, maxval=cfg.hue_shift)
        ds = jax.random.uniform(sk[1], (), minval=-cfg.sat_shift, maxval=cfg.sat_shift)
        dv = jax.random.uniform(sk[2], (), minval=-cfg.val_shift, maxval=cfg.val_shift)
        hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
        hsv = jnp.stack([
            (hsv[..., 0] + dh) % 1.0,
            jnp.clip(hsv[..., 1] + ds, 0.0, 1.0),
            jnp.clip(hsv[..., 2] + dv, 0.0, 1.0),
        ], axis=-1)
        img = jnp.where(do, _hsv_to_rgb(hsv), img)
    return img


# ---------------------------------------------------------------------------
# batched public API (pure, jit-safe)
# ---------------------------------------------------------------------------
def normalize_images(images):
    """uint8/float NHWC -> normalized float32 NHWC (ImageNet stats).

    Fuses the reference's A.Normalize() + ToTensorV2 (which divides by 255
    then standardizes) into the device pipeline.
    """
    x = images.astype(jnp.float32)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_images(images):
    """Inverse of normalize_images -> float32 in [0, 1]."""
    return jnp.clip(images * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg", "normalize"))
def augment_batch(key, images, masks=None, *, cfg: AugmentConfig = WEAK,
                  normalize: bool = True):
    """Augment a uint8/float NHWC batch (and aligned int masks) on device.

    Returns (images float32 normalized NHWC, masks int32 NHW or None).
    Pure function of ``key``: two different keys give two independent
    "views" -- the phase-3 dual-view trick is two calls with split keys.
    """
    if images.shape[1] != images.shape[2]:
        raise ValueError("on-device augmentation requires square tiles "
                         f"(got {images.shape}); resize in the data pipeline")
    x = images.astype(jnp.float32)
    x = x / 255.0 if jnp.issubdtype(images.dtype, jnp.integer) else x
    n = x.shape[0]
    keys = jax.random.split(key, n)

    if masks is not None:
        m = masks.astype(jnp.int32)

        def one(k, img, msk):
            k1, k2 = jax.random.split(k)
            img, msk = _geometric_one(k1, img, msk, cfg)
            img = _photometric_one(k2, img, cfg)
            return img, msk

        x, m = jax.vmap(one)(keys, x, m)
    else:
        def one_img(k, img):
            k1, k2 = jax.random.split(k)
            img, _ = _geometric_one(k1, img, None, cfg)
            img = _photometric_one(k2, img, cfg)
            return img

        x = jax.vmap(one_img)(keys, x)
        m = None

    if normalize:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x, m


# ---------------------------------------------------------------------------
# reference-parity pipeline objects
# ---------------------------------------------------------------------------
class Augmentation:
    """Callable pipeline mirroring the albumentations Compose interface.

    ``aug(image=..., mask=...)`` returns ``{'image': ..., 'mask': ...}`` for
    per-item host use (dataset transform hook, reference
    src/data/dataset.py:128-131); ``aug.batched(key, images, masks)`` is the
    pure batched device path trainers jit over.
    """

    _counter = 0
    _lock = threading.Lock()

    def __init__(self, cfg: AugmentConfig, seed: Optional[int] = None):
        self.cfg = cfg
        self._seed = Config.SEED if seed is None else seed

    def _next_key(self):
        with Augmentation._lock:
            Augmentation._counter += 1
            c = Augmentation._counter
        return jax.random.fold_in(jax.random.key(self._seed), c)

    def batched(self, key, images, masks=None, normalize: bool = True):
        return augment_batch(key, images, masks, cfg=self.cfg, normalize=normalize)

    def __call__(self, image=None, mask=None, key=None):
        if image is None:
            raise ValueError("image is required")
        key = self._next_key() if key is None else key
        img_b = jnp.asarray(image)[None]
        mask_b = None if mask is None else jnp.asarray(mask)[None]
        x, m = augment_batch(key, img_b, mask_b, cfg=self.cfg, normalize=True)
        out = {"image": np.asarray(x[0])}
        out["mask"] = None if m is None else np.asarray(m[0])
        return out


def get_training_augmentation(seed: Optional[int] = None) -> Augmentation:
    """Weak pipeline (reference src/models/augmentation.py:8-38)."""
    return Augmentation(WEAK, seed=seed)


def get_strong_augmentation(seed: Optional[int] = None) -> Augmentation:
    """Strong pipeline for unsupervised views (reference src/models/augmentation.py:40-88)."""
    return Augmentation(STRONG, seed=seed)


def get_validation_augmentation(seed: Optional[int] = None) -> Augmentation:
    """Normalize-only pipeline (reference src/models/augmentation.py:90-95)."""
    return Augmentation(NONE, seed=seed)


def apply_augmentation(image, augmentation: Augmentation):
    """Apply a pipeline to one image, returning numpy (reference :97-103)."""
    return np.asarray(augmentation(image=np.asarray(image))["image"])
