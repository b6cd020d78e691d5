"""Batched on-device data augmentation.

TPU-native replacement for the reference's albumentations pipelines
(reference src/models/augmentation.py:8-95).  The reference augments one
image at a time on the CPU -- its phase-3 trainer even round-trips every
device batch back to numpy to produce two strong views
(reference src/models/unsupervised_trainer.py:100-114).  Here the whole
pipeline is a pure jittable function of (rng key, uint8 batch) designed
around how XLA compiles and how the VPU executes:

- **All randomness is drawn batched up front** (a handful of
  (B,)-shaped threefry calls) -- no per-image key splitting, no vmap of
  scalar RNG (which triggers multi-minute XLA compiles).
- **Geometric ops avoid per-pixel gathers** (measured ~100x slower than
  dense ops on TPU): rot90/flip/transpose compose into one dihedral-
  group element applied as three dense passes (transpose / reverse /
  reverse) with per-image `where` gates; shift-scale-rotate uses a
  per-batch SHARED sampling grid so each bilinear corner is a
  contiguous row-gather over a (H*W, B*C) layout (per-image
  application gate keeps per-image randomness).
- **Photometric ops are branch-free batched elementwise** with
  per-image `where` gates -- pure VPU work that XLA fuses.

Coverage vs the reference pipelines (weak=get_training_augmentation,
strong=get_strong_augmentation):

  rot90 / flip / transpose            exact (integer dihedral matrices)
  shift-scale-rotate                  exact (bilinear image / nearest
                                      mask, reflect-101 border like
                                      albumentations)
  gaussian noise                      exact (variance ranges mirrored)
  blur (motion/median/box family)     separable box-blur approximation
  brightness-contrast / sharpen       exact
  hue-saturation-value                exact (jnp RGB<->HSV)
  optical / grid / elastic distortion shared-grid displacement fields
                                      (OneOf per batch, per-image gate)
  CLAHE / emboss                      not implemented on device (data-
                                      dependent per-pixel LUT / marginal
                                      value); their OneOf groups fall
                                      back to tractable members.
  Normalize (ImageNet) + ToTensor     fused into the same program;
                                      output float32 NHWC.
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

# numpy (not jnp) on purpose: a module-level jnp constant dispatches onto
# the default backend at import time — which breaks importing the package
# when that backend is unavailable (e.g. the multichip CPU dry run under a
# broken TPU runtime) and costs a remote-tunnel fetch per compile on axon.
IMAGENET_MEAN = np.asarray(Config.NORMALIZE_MEAN, dtype=np.float32)
IMAGENET_STD = np.asarray(Config.NORMALIZE_STD, dtype=np.float32)


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
    # std range = sqrt of albumentations GaussNoise var_limit=(10, 50)
    noise_std: Tuple[float, float] = (10.0 ** 0.5 / 255.0, 50.0 ** 0.5 / 255.0)
    p_blur: float = 0.2
    blur_size: int = 3
    p_color: float = 0.3          # OneOf {sharpen, brightness/contrast}
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    p_hsv: float = 0.3
    # albumentations HueSaturationValue(hue_shift_limit=20) shifts H on
    # OpenCV's [0,180) uint8 hue scale, i.e. 20/180 of the hue circle.
    hue_shift: float = 20.0 / 180.0
    sat_shift: float = 30.0 / 255.0
    val_shift: float = 20.0 / 255.0
    # distortions: OneOf {optical, grid, elastic}
    # (reference src/models/augmentation.py distortion OneOf group)
    p_distort: float = 0.2
    optical_limit: float = 0.05     # radial distortion coefficient range
    grid_steps: int = 5             # control points per axis
    grid_limit: float = 0.3         # control-point jitter (cell fraction)
    elastic_alpha: float = 1.0      # displacement magnitude (pixels)
    elastic_sigma: int = 50         # smoothness (low-res field cell size)

    @property
    def has_geometric(self) -> bool:
        return (self.p_rot90 > 0 or self.p_flip > 0 or self.p_transpose > 0
                or self.p_ssr > 0 or self.p_distort > 0)


# Reference weak pipeline: src/models/augmentation.py:8-38
WEAK = AugmentConfig()

# Reference strong pipeline: src/models/augmentation.py:40-88
STRONG = AugmentConfig(
    p_rot90=0.7, p_flip=0.7, p_transpose=0.7,
    p_ssr=0.5, shift_limit=0.1, scale_limit=0.3, rotate_limit=60.0,
    p_noise=0.4, noise_std=(20.0 ** 0.5 / 255.0, 80.0 ** 0.5 / 255.0),
    p_blur=0.4, blur_size=5,
    p_color=0.5, brightness_limit=0.3, contrast_limit=0.3,
    p_hsv=0.4, hue_shift=20.0 / 180.0, sat_shift=30.0 / 255.0,
    val_shift=20.0 / 255.0,
    p_distort=0.3, optical_limit=0.08, grid_limit=0.4, elastic_alpha=1.5,
)

# Validation pipeline: normalize only (src/models/augmentation.py:90-95)
NONE = AugmentConfig(
    p_rot90=0.0, p_flip=0.0, p_transpose=0.0, p_ssr=0.0,
    p_noise=0.0, p_blur=0.0, p_color=0.0, p_hsv=0.0, p_distort=0.0,
)


# ---------------------------------------------------------------------------
# geometric: fused dihedral + shift-scale-rotate warp
# ---------------------------------------------------------------------------
# Forward 2x2 matrices of the dihedral pieces on centered (x, y) coords.
_ROT90 = np.asarray([[[1, 0], [0, 1]], [[0, -1], [1, 0]],
                     [[-1, 0], [0, -1]], [[0, 1], [-1, 0]]], np.float32)
# flip codes: 0 = none, 1 = horizontal (x), 2 = vertical (y), 3 = both
_FLIP = np.asarray([[[1, 0], [0, 1]], [[-1, 0], [0, 1]],
                    [[1, 0], [0, -1]], [[-1, 0], [0, -1]]], np.float32)
_TRANSPOSE = np.asarray([[[1, 0], [0, 1]], [[0, 1], [1, 0]]], np.float32)


def _reflect_index(idx, n):
    """Reflect-101 boundary indexing (matches cv2.BORDER_REFLECT_101)."""
    period = 2 * (n - 1)
    r = jnp.mod(idx, period)
    r = jnp.where(r < 0, r + period, r)
    return jnp.where(r < n, r, period - r)


def _sample_dihedral(key, n: int, cfg: AugmentConfig):
    """Per-image dihedral element as (transpose?, flip_x?, flip_y?) booleans.

    Mirrors the albumentations sequence RandomRotate90(p) -> Flip(p) ->
    Transpose(p) (reference src/models/augmentation.py:8-38): the
    composed group element is computed as an integer matrix product and
    decoded into the unique ``F_y^c F_x^b T^a`` factorization -- which
    maps onto three dense array ops (transpose / reverse-width /
    reverse-height) instead of gathers.
    """
    k = jax.random.split(key, 5)
    u = lambda kk: jax.random.uniform(kk, (n,))

    kk_rot = jnp.where(u(k[0]) < cfg.p_rot90,
                       jax.random.randint(k[1], (n,), 0, 4), 0)
    fcode = jnp.where(u(k[2]) < cfg.p_flip,
                      jax.random.randint(k[3], (n,), 0, 3) + 1, 0)
    tcode = (u(k[4]) < cfg.p_transpose).astype(jnp.int32)
    m = jnp.einsum("nij,njk,nkl->nil",
                   jnp.asarray(_TRANSPOSE)[tcode],
                   jnp.asarray(_FLIP)[fcode],
                   jnp.asarray(_ROT90)[kk_rot])

    a = m[:, 0, 0] == 0                                   # transpose part
    b = jnp.where(a, m[:, 0, 1] < 0, m[:, 0, 0] < 0)      # flip x (width)
    c = jnp.where(a, m[:, 1, 0] < 0, m[:, 1, 1] < 0)      # flip y (height)
    return a, b, c


def _apply_dihedral(x, m, a, b, c):
    """Apply per-image dihedral elements with dense ops + per-image selects.

    Three full passes over the batch (transpose, reverse-w, reverse-h)
    gated by (B,)-wise ``where`` -- pure streaming HBM traffic, no
    gathers (a per-image gather here costs ~100x more on TPU).
    """
    ga = a[:, None, None, None]
    gb = b[:, None, None, None]
    gc = c[:, None, None, None]
    x = jnp.where(ga, jnp.transpose(x, (0, 2, 1, 3)), x)
    x = jnp.where(gb, jnp.flip(x, axis=2), x)
    x = jnp.where(gc, jnp.flip(x, axis=1), x)
    if m is not None:
        m = jnp.where(a[:, None, None], jnp.transpose(m, (0, 2, 1)), m)
        m = jnp.where(b[:, None, None], jnp.flip(m, axis=2), m)
        m = jnp.where(c[:, None, None], jnp.flip(m, axis=1), m)
    return x, m


def _grid_sample_shared(x, m, sx, sy, gate):
    """Sample the batch at ONE shared (sx, sy) grid, per-image gated.

    TPU-first pattern: per-image warp grids force per-pixel gathers
    (measured ~270 ms per corner at B=64/512px); a shared grid turns
    each bilinear corner into a row-gather over a (H*W, B*C) layout --
    contiguous 128-lane rows, ~20x faster.  Image bilinear, mask
    nearest, reflect-101 borders; ``gate`` is the (B,) application mask.
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    ch = x.shape[3]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).reshape(h * w, 1)
    fy = (sy - y0).reshape(h * w, 1)
    x0i = _reflect_index(x0.astype(jnp.int32), w)
    x1i = _reflect_index(x0.astype(jnp.int32) + 1, w)
    y0i = _reflect_index(y0.astype(jnp.int32), h)
    y1i = _reflect_index(y0.astype(jnp.int32) + 1, h)

    rows = jnp.transpose(x, (1, 2, 0, 3)).reshape(h * w, n * ch)

    def g(yi, xi):
        return jnp.take(rows, (yi * w + xi).reshape(-1), axis=0)

    out = (g(y0i, x0i) * (1 - fx) * (1 - fy)
           + g(y0i, x1i) * fx * (1 - fy)
           + g(y1i, x0i) * (1 - fx) * fy
           + g(y1i, x1i) * fx * fy)
    out = jnp.transpose(out.reshape(h, w, n, ch), (2, 0, 1, 3))
    x = jnp.where(gate[:, None, None, None], out, x)

    if m is not None:
        xn = _reflect_index(jnp.round(sx).astype(jnp.int32), w)
        yn = _reflect_index(jnp.round(sy).astype(jnp.int32), h)
        mrows = jnp.transpose(m, (1, 2, 0)).reshape(h * w, n)
        mo = jnp.take(mrows, (yn * w + xn).reshape(-1), axis=0)
        mo = jnp.transpose(mo.reshape(h, w, n), (2, 0, 1))
        m = jnp.where(gate[:, None, None], mo, m)
    return x, m


def _identity_grid(h, w):
    return jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")


def _ssr_warp_shared(key, x, m, cfg: AugmentConfig):
    """Shift-scale-rotate on a per-batch shared grid.

    Per-image randomness lives in the APPLICATION gate (each image warps
    with prob ``p_ssr``) and across steps/views via the key; the warp
    magnitudes are shared within a batch (the reference draws them
    per-image, src/models/augmentation.py:25-31 -- documented tradeoff).
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    k = jax.random.split(key, 4)
    do = jax.random.uniform(k[0], (n,)) < cfg.p_ssr
    shift = jax.random.uniform(k[1], (2,), minval=-cfg.shift_limit,
                               maxval=cfg.shift_limit)
    scale = 1.0 + jax.random.uniform(k[2], (), minval=-cfg.scale_limit,
                                     maxval=cfg.scale_limit)
    ang = jnp.deg2rad(jax.random.uniform(k[3], (), minval=-cfg.rotate_limit,
                                         maxval=cfg.rotate_limit))

    cos, sin = jnp.cos(ang), jnp.sin(ang)
    inv_s = 1.0 / scale
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = _identity_grid(h, w)
    ox = xx - cx - shift[0] * w
    oy = yy - cy - shift[1] * h
    sx = (cos * ox + sin * oy) * inv_s + cx
    sy = (-sin * ox + cos * oy) * inv_s + cy
    return _grid_sample_shared(x, m, sx, sy, do)


def _distort_warp_shared(key, x, m, cfg: AugmentConfig):
    """OneOf {optical, grid, elastic} distortion on a shared grid.

    Device-native counterparts of the reference's albumentations
    distortion OneOf group (src/models/augmentation.py): the batch draws
    one distortion type + one displacement field; each image applies it
    with prob ``p_distort``.  All three reduce to "identity grid + a
    smooth displacement field", sampled with the same shared-grid
    row-gather as shift-scale-rotate.
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    k = jax.random.split(key, 5)
    do = jax.random.uniform(k[0], (n,)) < cfg.p_distort
    which = jax.random.randint(k[1], (), 0, 3)
    yy, xx = _identity_grid(h, w)

    # optical (radial barrel/pincushion): r' = r * (1 + k2 * (r/R)^2)
    k2 = jax.random.uniform(k[2], (), minval=-cfg.optical_limit,
                            maxval=cfg.optical_limit)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rx, ry = (xx - cx) / cx, (yy - cy) / cy
    r2 = rx * rx + ry * ry
    opt_dx = (xx - cx) * k2 * r2
    opt_dy = (yy - cy) * k2 * r2

    # grid distortion: coarse (steps+1)^2 control-point jitter upsampled
    gsz = cfg.grid_steps + 1
    cell = max(h // cfg.grid_steps, 1)
    gfield = jax.random.uniform(k[3], (gsz, gsz, 2), minval=-cfg.grid_limit,
                                maxval=cfg.grid_limit) * cell
    gfield = jax.image.resize(gfield, (h, w, 2), method="bilinear")
    grid_dx, grid_dy = gfield[..., 0], gfield[..., 1]

    # elastic: smooth dense field = low-res uniform noise upsampled
    esz = max(h // max(cfg.elastic_sigma // 8, 1), 2)
    efield = jax.random.uniform(k[4], (esz, esz, 2), minval=-1.0,
                                maxval=1.0) * (cfg.elastic_alpha * h / 100.0)
    efield = jax.image.resize(efield, (h, w, 2), method="bilinear")
    el_dx, el_dy = efield[..., 0], efield[..., 1]

    dx = jax.lax.switch(which, [lambda: opt_dx, lambda: grid_dx, lambda: el_dx])
    dy = jax.lax.switch(which, [lambda: opt_dy, lambda: grid_dy, lambda: el_dy])
    return _grid_sample_shared(x, m, xx + dx, yy + dy, do)


# ---------------------------------------------------------------------------
# photometric: batched branch-free elementwise ops
# ---------------------------------------------------------------------------
def _box_blur(x, size: int):
    """Separable box blur over a batch (n, h, w, c): two k-term shifted
    sums with edge padding -- pure VPU adds, no conv machinery (grouped
    convs compile pathologically under XLA:CPU)."""
    h, w = x.shape[1], x.shape[2]
    r = size // 2
    y = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    y = sum(y[:, i:i + h] for i in range(size)) / size
    y = jnp.pad(y, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    return sum(y[:, :, i:i + w] for i in range(size)) / size


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
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
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
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _photometric_batch(key, x, cfg: AugmentConfig):
    """All photometric ops, batched; per-image `where` gates (masks untouched)."""
    n = x.shape[0]
    k = jax.random.split(key, 12)
    u = lambda kk: jax.random.uniform(kk, (n,))
    gate = lambda d: d[:, None, None, None]

    if cfg.p_noise > 0:
        do = u(k[0]) < cfg.p_noise
        std = jax.random.uniform(k[1], (n,), minval=cfg.noise_std[0],
                                 maxval=cfg.noise_std[1])
        noise = jax.random.normal(k[2], x.shape) * std[:, None, None, None]
        x = jnp.where(gate(do), jnp.clip(x + noise, 0.0, 1.0), x)

    if cfg.p_blur > 0:
        do = u(k[3]) < cfg.p_blur
        x = jnp.where(gate(do), _box_blur(x, cfg.blur_size), x)

    if cfg.p_color > 0:
        do = u(k[4]) < cfg.p_color
        which = u(k[5]) < 0.5
        sharp = jnp.clip(x + 0.6 * (x - _box_blur(x, 3)), 0.0, 1.0)
        b = jax.random.uniform(k[6], (n,), minval=-cfg.brightness_limit,
                               maxval=cfg.brightness_limit)
        c = 1.0 + jax.random.uniform(k[7], (n,), minval=-cfg.contrast_limit,
                                     maxval=cfg.contrast_limit)
        bc = jnp.clip((x - 0.5) * c[:, None, None, None] + 0.5
                      + b[:, None, None, None], 0.0, 1.0)
        x = jnp.where(gate(do), jnp.where(gate(which), sharp, bc), x)

    if cfg.p_hsv > 0:
        do = u(k[8]) < cfg.p_hsv
        dh = jax.random.uniform(k[9], (n,), minval=-cfg.hue_shift,
                                maxval=cfg.hue_shift)
        ds = jax.random.uniform(k[10], (n,), minval=-cfg.sat_shift,
                                maxval=cfg.sat_shift)
        dv = jax.random.uniform(k[11], (n,), minval=-cfg.val_shift,
                                maxval=cfg.val_shift)
        hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
        hsv = jnp.stack([
            (hsv[..., 0] + dh[:, None, None]) % 1.0,
            jnp.clip(hsv[..., 1] + ds[:, None, None], 0.0, 1.0),
            jnp.clip(hsv[..., 2] + dv[:, None, None], 0.0, 1.0),
        ], axis=-1)
        x = jnp.where(gate(do), _hsv_to_rgb(hsv), x)
    return x


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
    m = masks.astype(jnp.int32) if masks is not None else None

    k_dih, k_ssr, k_photo = jax.random.split(key, 3)
    if cfg.p_rot90 > 0 or cfg.p_flip > 0 or cfg.p_transpose > 0:
        a, b, c = _sample_dihedral(k_dih, n, cfg)
        x, m = _apply_dihedral(x, m, a, b, c)
    if cfg.p_ssr > 0:
        k_ssr, k_dis = jax.random.split(k_ssr)
        x, m = _ssr_warp_shared(k_ssr, x, m, cfg)
        if cfg.p_distort > 0:
            x, m = _distort_warp_shared(k_dis, x, m, cfg)
    elif cfg.p_distort > 0:
        x, m = _distort_warp_shared(k_ssr, x, m, cfg)
    x = _photometric_batch(k_photo, x, cfg)

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
