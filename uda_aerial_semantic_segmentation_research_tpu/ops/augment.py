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
- **Expensive low-probability members are compacted**: CLAHE (~50x the
  VPU cost of its OneOf siblings) and the per-pixel warp gathers run on
  a fixed mean+3sigma whole-image subset of the batch (gather subset,
  transform, scatter back) instead of compute-everything-then-select;
  over-budget images (P ~ 1e-3 per batch) skip that draw.  Pixel math
  runs in bfloat16 (``AugmentConfig.compute_dtype``) -- half the HBM
  traffic, and an ~8-bit mantissa matches the uint8 precision of the
  reference's cv2/albumentations pipeline.

Coverage vs the reference pipelines (weak=get_training_augmentation,
strong=get_strong_augmentation):

  rot90 / flip / transpose            exact (integer dihedral matrices)
  shift-scale-rotate                  exact bilinear image / nearest
                                      mask, reflect-101 border like
                                      albumentations; magnitudes drawn
                                      PER GROUP of the batch (``warp_groups``
                                      grids/batch; per-image when the
                                      batch is small -- the reference
                                      draws per image,
                                      src/models/augmentation.py:25-31)
  gaussian noise                      exact (variance ranges mirrored)
  blur OneOf {motion, median, box}    per-image kernel choice with the
                                      reference's OneOf weights; median
                                      3x3 exact (sorting network), 5x5 as
                                      iterated 3x3; motion blur along a
                                      per-image direction from the 4
                                      integer-pixel axes (the reference
                                      draws a continuous angle)
  brightness-contrast                 exact
  sharpen / emboss                    exact imgaug kernels, per-image
                                      alpha/lightness/strength draws
  hue-saturation-value                exact (jnp RGB<->HSV)
  optical / grid / elastic distortion per-group displacement fields
                                      (OneOf per group, per-image gate)
  CLAHE                               on device, LAB L-channel, bit-exact
                                      LUTs vs cv2.createCLAHE (per-image
                                      clip draw like albumentations)
  Normalize (ImageNet) + ToTensor     fused into the same program;
                                      output float32 NHWC.
"""

from __future__ import annotations

import dataclasses
import math
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
    # per-image OneOf {motion, median, box} weights; reference weak group
    # MotionBlur p=.2 / MedianBlur p=.1 / Blur p=.1 normalized
    # (src/models/augmentation.py:19-23)
    blur_weights: Tuple[float, float, float] = (0.5, 0.25, 0.25)
    # OneOf {CLAHE, sharpen, emboss, brightness/contrast}
    # (reference src/models/augmentation.py:29-34)
    p_color: float = 0.3
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    # albumentations Sharpen/Emboss parameter ranges (per-image draws)
    sharpen_alpha: Tuple[float, float] = (0.2, 0.5)
    sharpen_lightness: Tuple[float, float] = (0.5, 1.0)
    emboss_alpha: Tuple[float, float] = (0.2, 0.5)
    emboss_strength: Tuple[float, float] = (0.2, 0.7)
    # albumentations CLAHE(clip_limit=L) draws per-image from U(1, L);
    # 0 disables the member (its OneOf slot redistributes to the other 3)
    clahe_clip: float = 2.0
    clahe_tiles: int = 8
    p_hsv: float = 0.3
    # albumentations HueSaturationValue(hue_shift_limit=20) shifts H on
    # OpenCV's [0,180) uint8 hue scale, i.e. 20/180 of the hue circle.
    hue_shift: float = 20.0 / 180.0
    sat_shift: float = 30.0 / 255.0
    val_shift: float = 20.0 / 255.0
    # distortions: OneOf {optical, grid, elastic}
    # (reference src/models/augmentation.py distortion OneOf group)
    p_distort: float = 0.2
    # per-image OneOf member weights; the reference weak group's member
    # probabilities (0.3, 0.1, 0.3) normalize to (3/7, 1/7, 3/7)
    # (src/models/augmentation.py:24-28); the strong group is uniform
    distort_weights: Tuple[float, float, float] = (3 / 7, 1 / 7, 3 / 7)
    optical_limit: float = 0.05     # radial distortion coefficient range
    grid_steps: int = 5             # control points per axis
    grid_limit: float = 0.3         # control-point jitter (cell fraction)
    elastic_alpha: float = 1.0      # displacement magnitude (pixels)
    elastic_sigma: int = 50         # smoothness (low-res field cell size)
    # warp magnitudes are drawn once per GROUP of the batch (grids are the
    # expensive shared resource; magnitudes need not be batch-global).  The
    # effective group count is the largest divisor of B that is <= this,
    # so small batches get fully per-image magnitudes.  4 keeps the gather
    # rows >= 96 lanes at bench batch (128/4 * 3ch) -- lane packing over
    # group diversity.
    warp_groups: int = 4
    # run the dihedral stage through the Pallas fused kernel
    # (ops/pallas_ops.dihedral_normalize) instead of the XLA
    # transpose/flip selects: "" = off, "exact" = HIGHEST-precision
    # (bit-exact relocation), "fast" = default MXU precision (< half a
    # uint8 LSB), "auto" = "fast" on the TPU backend / off elsewhere.
    # Requires a uint8 input batch (the kernel fuses the dequant).
    # In-step A/B at B=128 @ 512px (r3): fast 405.6 ms / exact 409.0 ms
    # vs 415.6 ms XLA -- the kernel is the TPU production path (the r2
    # "XLA selects fuse into the wider program" hypothesis did not hold).
    pallas_dihedral: str = "auto"
    # pixel-data dtype for the pipeline's intermediate math.  bfloat16
    # halves the HBM traffic of every elementwise pass and gather; its
    # ~8-bit mantissa matches the uint8 precision the reference's
    # albumentations/cv2 pipeline computes in.  Coordinates, RNG params,
    # CLAHE LUT math and the final normalize stay float32.
    compute_dtype: str = "float32"

    @property
    def has_geometric(self) -> bool:
        return (self.p_rot90 > 0 or self.p_flip > 0 or self.p_transpose > 0
                or self.p_ssr > 0 or self.p_distort > 0)


# Reference weak pipeline: src/models/augmentation.py:8-38
WEAK = AugmentConfig(compute_dtype="bfloat16")

# Reference strong pipeline: src/models/augmentation.py:40-88
STRONG = AugmentConfig(
    compute_dtype="bfloat16",
    p_rot90=0.7, p_flip=0.7, p_transpose=0.7,
    p_ssr=0.5, shift_limit=0.1, scale_limit=0.3, rotate_limit=60.0,
    p_noise=0.4, noise_std=(20.0 ** 0.5 / 255.0, 80.0 ** 0.5 / 255.0),
    # strong blur OneOf: MotionBlur p=.4 / MedianBlur p=.3 / Blur p=.3
    p_blur=0.4, blur_size=5, blur_weights=(0.4, 0.3, 0.3),
    p_color=0.5, brightness_limit=0.3, contrast_limit=0.3, clahe_clip=4.0,
    p_hsv=0.4, hue_shift=20.0 / 180.0, sat_shift=30.0 / 255.0,
    val_shift=20.0 / 255.0,
    # strong distortion OneOf: p=0.4, equal member weights
    # (src/models/augmentation.py:61-69)
    p_distort=0.4, distort_weights=(1 / 3, 1 / 3, 1 / 3),
    optical_limit=0.08, grid_limit=0.4, elastic_alpha=1.5,
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


def _n_groups(n: int, requested: int) -> int:
    """Largest divisor of ``n`` that is <= ``requested``."""
    g = max(min(requested, n), 1)
    while n % g:
        g -= 1
    return g


def _grid_sample_grouped(x, m, sx, sy, gate):
    """Sample the batch at per-GROUP (sx, sy) grids, per-image gated.

    TPU-first pattern: fully per-image warp grids force per-pixel
    gathers (measured ~270 ms per corner at B=64/512px); a grid shared
    by a GROUP of images turns each bilinear corner into a batched
    row-gather over a (K, H*W, G*C) layout -- contiguous 128-lane rows.
    ``sx``/``sy`` are (K, H, W) with K dividing the batch; K == B gives
    true per-image warps (small batches), K == 1 the fully shared grid.
    Image bilinear, mask nearest, reflect-101 borders; ``gate`` is the
    (B,) application mask.
    """
    n, h, w, ch = x.shape
    kg = sx.shape[0]
    g = n // kg

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).reshape(kg * h * w, 1)
    fy = (sy - y0).reshape(kg * h * w, 1)
    x0i = _reflect_index(x0.astype(jnp.int32), w)
    x1i = _reflect_index(x0.astype(jnp.int32) + 1, w)
    y0i = _reflect_index(y0.astype(jnp.int32), h)
    y1i = _reflect_index(y0.astype(jnp.int32) + 1, h)
    # Reflect-101 maps consecutive integers to ADJACENT indices (possibly
    # swapped), so each bilinear corner pair lives in two physically
    # consecutive rows: gather both with ONE wide row read from a
    # column-paired copy of the rows array (half the DMA descriptors at
    # twice the transfer size -- row gathers here are descriptor-bound).
    bx = jnp.minimum(x0i, x1i)
    by = jnp.minimum(y0i, y1i)
    swap_x = (x0i > x1i).reshape(kg * h * w, 1)
    swap_y = (y0i > y1i).reshape(kg * h * w, 1)

    # Fold the group dim into ROWS: rows (K*H*W, G*CH), index = k*H*W +
    # y*w + x -- one flat row-gather (jnp.take), the contiguous-row
    # pattern XLA lowers efficiently.  (A batched take_along_axis lowers
    # to a generic per-element gather: measured ~1 s/step at B=128 @
    # 512px.  Narrow rows are the other cliff: 48-lane rows gather ~10x
    # slower than 128-lane rows, so the mask rides along as a 4th
    # channel -- G*(C+1) = 128 lanes at B=128/K=4 -- instead of its own
    # skinny int gather, and its NEAREST sample is recovered exactly by
    # selecting among the 4 bilinear corners: round(s) is always
    # floor(s) or floor(s)+1.)
    if m is not None:
        x_ext = jnp.concatenate([x, m.astype(x.dtype)[..., None]], axis=-1)
    else:
        x_ext = x
    che = x_ext.shape[-1]
    rows = jnp.transpose(x_ext.reshape(kg, g, h, w, che),
                         (0, 2, 3, 1, 4)).reshape(kg * h * w, g * che)
    base = (jnp.arange(kg, dtype=jnp.int32) * (h * w))[:, None, None]

    # rows4[r] = [pixel r, pixel r+1, pixel r+w, pixel r+w+1]: the whole
    # 2x2 bilinear footprint in ONE contiguous row read (bx <= w-2 and
    # by <= h-2 keep the +1/+w offsets inside the image)
    gc = g * che

    def shift(a, k):
        return jnp.concatenate([a[k:], a[-1:].repeat(k, axis=0)], axis=0)

    rows2 = jnp.concatenate([rows, shift(rows, 1)], axis=1)
    rows4 = jnp.concatenate([rows2, shift(rows2, w)], axis=1)
    p = jnp.take(rows4, (base + by * w + bx).reshape(-1), axis=0)

    def pick(sw_y, sw_x):
        half = jnp.where(sw_y, p[:, 2 * gc:], p[:, :2 * gc])
        return jnp.where(sw_x, half[:, gc:], half[:, :gc])

    g00 = pick(swap_y, swap_x)
    g01 = pick(swap_y, ~swap_x)
    g10 = pick(~swap_y, swap_x)
    g11 = pick(~swap_y, ~swap_x)
    # blend in the pixel dtype (bf16 production path): the corner terms
    # dominate HBM traffic and f32 weights would upcast all four
    fxd, fyd = fx.astype(x.dtype), fy.astype(x.dtype)
    out = (g00 * (1 - fxd) * (1 - fyd) + g01 * fxd * (1 - fyd)
           + g10 * (1 - fxd) * fyd + g11 * fxd * fyd)
    out = out.reshape(kg, h, w, g, che)[..., :ch]
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(n, h, w, ch)
    x = jnp.where(gate[:, None, None, None], out, x)

    if m is not None:
        near = jnp.where(fy < 0.5, jnp.where(fx < 0.5, g00, g01),
                         jnp.where(fx < 0.5, g10, g11))
        near = near.reshape(kg, h, w, g, che)[..., ch]
        mo = jnp.round(jnp.transpose(near, (0, 3, 1, 2))).astype(m.dtype)
        m = jnp.where(gate[:, None, None], mo.reshape(n, h, w), m)
    return x, m


def _identity_grid(h, w):
    return jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")


def _warp_kg(n_sub: int, che: int, requested: int) -> int:
    """Group count for a warped sub-batch, i.e. how many independent
    magnitude draws the batch gets.  Large sub-batches are clamped so
    gather rows keep >= 128 lanes (narrow-row gathers are the TPU
    cliff); at <= 32 images the absolute gather volume is small enough
    that magnitude diversity wins over lane packing.  An EXPLICIT
    ``requested >= n_sub`` (the user asked for per-image magnitudes)
    bypasses the lane clamp -- without this, a per-image request was
    silently folded back to the clamped default (kg=1-2 at bench
    batch), which made per-image-vs-grouped A/Bs vacuous."""
    if n_sub <= 32 or requested >= n_sub:
        return _n_groups(n_sub, requested)
    return _n_groups(n_sub, min(requested, max(1, (n_sub * che) // 128)))


def _ssr_warp_grouped(key, x, m, do, cfg: AugmentConfig):
    """Shift-scale-rotate with per-group magnitude draws.

    Each group of images shares one (shift, scale, angle) draw; each
    image still applies independently via the ``do`` gate (the
    reference draws magnitudes per image,
    src/models/augmentation.py:25-31; groups recover that distribution
    exactly for small batches and to within-group correlation at bench
    batch sizes, with the shared-grid gather economics intact).
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    kg = _warp_kg(n, 4 if m is not None else 3, cfg.warp_groups)
    k = jax.random.split(key, 4)
    shift = jax.random.uniform(k[1], (kg, 2), minval=-cfg.shift_limit,
                               maxval=cfg.shift_limit)
    scale = 1.0 + jax.random.uniform(k[2], (kg,), minval=-cfg.scale_limit,
                                     maxval=cfg.scale_limit)
    ang = jnp.deg2rad(jax.random.uniform(k[3], (kg,),
                                         minval=-cfg.rotate_limit,
                                         maxval=cfg.rotate_limit))

    cos = jnp.cos(ang)[:, None, None]
    sin = jnp.sin(ang)[:, None, None]
    inv_s = (1.0 / scale)[:, None, None]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = _identity_grid(h, w)
    ox = xx[None] - cx - shift[:, 0, None, None] * w
    oy = yy[None] - cy - shift[:, 1, None, None] * h
    sx = (cos * ox + sin * oy) * inv_s + cx
    sy = (-sin * ox + cos * oy) * inv_s + cy
    return _grid_sample_grouped(x, m, sx, sy, do)


def _distort_warp_grouped(key, x, m, do, cfg: AugmentConfig):
    """OneOf {optical, grid, elastic} distortion with per-group fields.

    Device-native counterparts of the reference's albumentations
    distortion OneOf group (src/models/augmentation.py): each group of
    the batch draws one distortion type + one displacement field; each
    image applies its group's field via the ``do`` gate.  All three
    reduce to "identity grid + a smooth displacement field", sampled
    with the grouped row-gather used by shift-scale-rotate.
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    kg = _warp_kg(n, 4 if m is not None else 3, cfg.warp_groups)
    k = jax.random.split(key, 5)
    dw0, dw1, _ = cfg.distort_weights
    u_which = jax.random.uniform(k[1], (kg,))
    which = jnp.where(u_which < dw0, 0, jnp.where(u_which < dw0 + dw1, 1, 2))
    yy, xx = _identity_grid(h, w)

    # optical (radial barrel/pincushion): r' = r * (1 + k2 * (r/R)^2)
    k2 = jax.random.uniform(k[2], (kg,), minval=-cfg.optical_limit,
                            maxval=cfg.optical_limit)[:, None, None]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rx, ry = (xx - cx) / cx, (yy - cy) / cy
    r2 = (rx * rx + ry * ry)[None]
    opt_dx = (xx - cx)[None] * k2 * r2
    opt_dy = (yy - cy)[None] * k2 * r2

    # grid distortion: coarse (steps+1)^2 control-point jitter upsampled
    gsz = cfg.grid_steps + 1
    cell = max(h // cfg.grid_steps, 1)
    gfield = jax.random.uniform(k[3], (kg, gsz, gsz, 2),
                                minval=-cfg.grid_limit,
                                maxval=cfg.grid_limit) * cell
    gfield = jax.image.resize(gfield, (kg, h, w, 2), method="bilinear")
    grid_dx, grid_dy = gfield[..., 0], gfield[..., 1]

    # elastic: smooth dense field = low-res uniform noise upsampled
    esz = max(h // max(cfg.elastic_sigma // 8, 1), 2)
    efield = jax.random.uniform(k[4], (kg, esz, esz, 2), minval=-1.0,
                                maxval=1.0) * (cfg.elastic_alpha * h / 100.0)
    efield = jax.image.resize(efield, (kg, h, w, 2), method="bilinear")
    el_dx, el_dy = efield[..., 0], efield[..., 1]

    sel = which[:, None, None]
    dx = jnp.where(sel == 0, opt_dx, jnp.where(sel == 1, grid_dx, el_dx))
    dy = jnp.where(sel == 0, opt_dy, jnp.where(sel == 1, grid_dy, el_dy))
    return _grid_sample_grouped(x, m, xx[None] + dx, yy[None] + dy, do)


def _warp_family(k_prio, x, m, do, warp_fn, budget: int):
    """One warp family on its own compacted subset: gather at most
    ``budget`` of the ``do`` images (whole-image rows, cheap), warp the
    subset, scatter back.  Over-budget images (P ~ 1e-3 at the 3-sigma
    budget) skip their warp; documented in PARITY.md."""
    n = x.shape[0]
    if budget >= n:
        return warp_fn(x, m, do)
    idx = _compact_select(k_prio, do, budget)
    xs = jnp.take(x, idx, axis=0)
    ms = jnp.take(m, idx, axis=0) if m is not None else None
    xs, ms = warp_fn(xs, ms, jnp.take(do, idx))
    x = x.at[idx].set(xs)
    if m is not None:
        m = m.at[idx].set(ms)
    return x, m


def _warp_stage(key, x, m, cfg: AugmentConfig):
    """SSR + distortion warps, each on its own compacted image subset.

    Per-pixel warp gathers are the most expensive pass in the pipeline;
    at reference probabilities only p_ssr (resp. p_distort) of images
    take each warp.  Compacting PER FAMILY -- rather than one shared
    any-warp subset through both passes -- cuts the gathered image count
    from 2*budget(1-(1-p_ssr)(1-p_distort)) to budget(p_ssr) +
    budget(p_distort): at WEAK p=0.2/0.2, B=128 that is 80 vs 124
    image-gathers (-35% warp volume; measured 342.8 -> see BASELINE.md
    r3 ledger).  Same per-image semantics as the reference's
    independent SSR / distortion-OneOf draws
    (src/models/augmentation.py:25-31).
    """
    n = x.shape[0]
    k_ssr, k_dis, k_g1, k_g2, k_p1, k_p2 = jax.random.split(key, 6)
    if cfg.p_ssr > 0:
        do_ssr = jax.random.uniform(k_g1, (n,)) < cfg.p_ssr
        x, m = _warp_family(
            k_p1, x, m, do_ssr,
            lambda xs, ms, d: _ssr_warp_grouped(k_ssr, xs, ms, d, cfg),
            _subset_budget(n, cfg.p_ssr))
    if cfg.p_distort > 0:
        do_dis = jax.random.uniform(k_g2, (n,)) < cfg.p_distort
        x, m = _warp_family(
            k_p2, x, m, do_dis,
            lambda xs, ms, d: _distort_warp_grouped(k_dis, xs, ms, d, cfg),
            _subset_budget(n, cfg.p_distort))
    return x, m


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


def _conv3x3_per_image(x, kern):
    """Per-image 3x3 cross-correlation via 9 shifted adds.

    ``kern``: (B, 3, 3) per-image kernels applied to every channel
    (cv2.filter2D semantics, BORDER_REFLECT_101 like albumentations'
    Sharpen/Emboss).  Pure VPU multiply-adds, XLA fuses the 9 taps into
    one pass."""
    h, w = x.shape[1], x.shape[2]
    y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out = out + kern[:, dy, dx][:, None, None, None] \
                * y[:, dy:dy + h, dx:dx + w]
    return out


def _sharpen_kernel(alpha, lightness):
    """imgaug/albumentations Sharpen kernel, per image.

    kernel = (1 - alpha) * I + alpha * [[-1,-1,-1],
                                        [-1, 8+l,-1],
                                        [-1,-1,-1]]
    (albumentations Sharpen(alpha=(0.2,0.5), lightness=(0.5,1.0)), the
    reference's color OneOf member, src/models/augmentation.py:29-34).
    """
    n = alpha.shape[0]
    eye = jnp.zeros((n, 3, 3)).at[:, 1, 1].set(1.0)
    eff = jnp.full((n, 3, 3), -1.0).at[:, 1, 1].set(8.0 + lightness)
    return (1.0 - alpha)[:, None, None] * eye + alpha[:, None, None] * eff


def _emboss_kernel(alpha, strength):
    """imgaug/albumentations Emboss kernel, per image.

    kernel = (1 - alpha) * I + alpha * [[-1-s, -s, 0],
                                        [  -s,  1, s],
                                        [   0,  s, 1+s]]
    (albumentations Emboss(alpha=(0.2,0.5), strength=(0.2,0.7)),
    reference color OneOf member, src/models/augmentation.py:29-34).
    """
    n = alpha.shape[0]
    eye = jnp.zeros((n, 3, 3)).at[:, 1, 1].set(1.0)
    z = jnp.zeros_like(strength)
    s = strength
    eff = jnp.stack([
        jnp.stack([-1.0 - s, -s, z], axis=-1),
        jnp.stack([-s, jnp.ones_like(s), s], axis=-1),
        jnp.stack([z, s, 1.0 + s], axis=-1),
    ], axis=1)
    return (1.0 - alpha)[:, None, None] * eye + alpha[:, None, None] * eff


# ---------------------------------------------------------------------------
# CLAHE (contrast-limited adaptive histogram equalization) on device
# ---------------------------------------------------------------------------
# albumentations CLAHE = cv2 CLAHE on the L channel of LAB, RGB roundtrip
# (reference color OneOf member, src/models/augmentation.py:29-34).
# TPU-native formulation: per-tile 256-bin histograms as one-hot
# reductions (MXU/VPU friendly, no scatter), clip + float redistribution,
# CDF LUTs, and the bilinear 4-tile LUT blend computed as a batched
# one-hot matmul over half-tile-shifted CELLS (within a cell the 4
# corner tiles are constant, so the blend is one (pixels, 256) x
# (256, 4) contraction per cell instead of per-pixel gathers).
# The LUT construction (integer clip limit, per-256 redistribution,
# strided residual drop) replicates cv2 BIN FOR BIN -- the L-channel
# output is bit-exact against cv2.createCLAHE (tests/test_augment.py).
# Remaining divergence: a/b chroma stay float (cv2's 8-bit path
# quantizes them to uint8).

def _srgb_to_linear(c):
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _linear_to_srgb(c):
    return jnp.where(c > 0.0031308,
                     1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055,
                     12.92 * c)


def _rgb_to_lab(rgb):
    """sRGB [0,1] -> CIE LAB (D65), cv2 semantics (L in [0,100])."""
    c = _srgb_to_linear(jnp.clip(rgb, 0.0, 1.0))
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    x = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.950456
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def _lab_to_rgb(L, a, b):
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return jnp.where(t > 0.206897, t ** 3, (t - 16.0 / 116.0) / 7.787)

    x = finv(fx) * 0.950456
    y = finv(fy)
    z = finv(fz) * 1.088754
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875992 * y + 0.041556 * z
    bl = 0.055648 * x - 0.204043 * y + 1.057311 * z
    return jnp.clip(_linear_to_srgb(jnp.stack([r, g, bl], axis=-1)), 0.0, 1.0)


def _clahe_lut(l_u8, clip, tiles: int):
    """Per-tile clipped-equalization LUTs.

    ``l_u8``: (N, H, W) int32 in [0, 255]; ``clip``: (N,) float clip
    limits (cv2 clipLimit).  Returns (N, tiles*tiles, 256) float LUTs.
    """
    n, h, w = l_u8.shape
    th, tw = h // tiles, w // tiles
    area = th * tw
    tiled = l_u8.reshape(n, tiles, th, tiles, tw).transpose(0, 1, 3, 2, 4)
    tiled = tiled.reshape(n, tiles * tiles, area)
    onehot = jax.nn.one_hot(tiled, 256, dtype=jnp.bfloat16)
    hist = jnp.sum(onehot, axis=2, dtype=jnp.float32)      # exact: <= 2^12
    limit = jnp.maximum(jnp.floor(clip * area / 256.0), 1.0)[:, None, None]
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    # cv2's integer redistribution, vectorized: floor(excess/256) to every
    # bin, then the residual dropped one-per-bin at stride
    # max(256 // residual, 1) starting from bin 0
    batch = jnp.floor(excess / 256.0)
    residual = excess - batch * 256.0
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    bins = jnp.arange(256, dtype=jnp.float32)
    gets_one = ((jnp.mod(bins, step) == 0)
                & (jnp.floor(bins / step) < residual)).astype(jnp.float32)
    redist = clipped + batch + gets_one
    cdf = jnp.cumsum(redist, axis=-1)
    return jnp.round(cdf * (255.0 / area))


def _clahe_apply(l_u8, lut, tiles: int):
    """Bilinear 4-tile LUT blend -> new L values (float, [0, 255]).

    Pixels are regrouped into half-tile-shifted cells; within a cell the
    4 nearest tile centers are fixed, so the blend is one batched
    (pixels, 256) x (256, 4) one-hot matmul per cell plus a static
    bilinear weight sum.
    """
    n, h, w = l_u8.shape
    th, tw = h // tiles, w // tiles
    hp, wp = th // 2, tw // 2
    tc = tiles + 1

    lp = jnp.pad(l_u8, ((0, 0), (hp, th - hp), (wp, tw - wp)), mode="edge")
    cells = lp.reshape(n, tc, th, tc, tw).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(n, tc * tc, th * tw)

    # static corner-tile indices per cell (clamped at borders, cv2-style)
    ii = np.arange(tc)
    t0 = np.clip(ii - 1, 0, tiles - 1)
    t1 = np.clip(ii, 0, tiles - 1)
    y0g, x0g = np.meshgrid(t0, t0, indexing="ij")
    y1g, x1g = np.meshgrid(t1, t1, indexing="ij")
    corners = np.stack([y0g * tiles + x0g, y0g * tiles + x1g,
                        y1g * tiles + x0g, y1g * tiles + x1g],
                       axis=-1).reshape(tc * tc, 4)          # (cells, 4)

    # static bilinear weights per within-cell position; cv2 uses the raw
    # pixel coordinate (tyf = y / th - 0.5), not the pixel center, so for
    # global y = I*th - th/2 + r the fraction is exactly r / th
    wy = np.arange(th) / th
    wx = np.arange(tw) / tw
    wyx = np.stack([np.outer(1 - wy, 1 - wx), np.outer(1 - wy, wx),
                    np.outer(wy, 1 - wx), np.outer(wy, wx)],
                   axis=-1).reshape(th * tw, 4)              # (px, 4)

    luts4 = jnp.take(lut, jnp.asarray(corners).reshape(-1), axis=1)
    luts4 = luts4.reshape(n, tc * tc, 4, 256).transpose(0, 1, 3, 2)
    onehot = jax.nn.one_hot(cells, 256, dtype=jnp.bfloat16)
    vals = jnp.einsum("ncpb,ncbk->ncpk", onehot,
                      luts4.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)    # (n, cells, px, 4)
    newl = jnp.sum(vals * jnp.asarray(wyx, np.float32), axis=-1)

    newl = newl.reshape(n, tc, tc, th, tw).transpose(0, 1, 3, 2, 4)
    newl = newl.reshape(n, tc * th, tc * tw)
    return newl[:, hp:hp + h, wp:wp + w]


def _clahe_impl(x, clip, tiles: int):
    L, a, b = _rgb_to_lab(x)
    l_u8 = jnp.clip(jnp.round(L * (255.0 / 100.0)), 0, 255).astype(jnp.int32)
    lut = _clahe_lut(l_u8, clip, tiles)
    newl = _clahe_apply(l_u8, lut, tiles)
    return _lab_to_rgb(newl * (100.0 / 255.0), a, b)


def _clahe_rgb(x, clip, tiles: int = 8, chunk: int = 8):
    """CLAHE on the LAB L channel of an RGB [0,1] batch (cv2 semantics).

    Large batches scan over <=``chunk``-image slices so the one-hot
    histogram/LUT tensors stay ~1 GB instead of ~20 GB at bench shape.
    """
    n = x.shape[0]
    c = _n_groups(n, chunk)
    if c == n:
        return _clahe_impl(x, clip, tiles)
    xs = x.reshape(n // c, c, *x.shape[1:])
    clips = clip.reshape(n // c, c)

    def body(carry, xc):
        return carry, _clahe_impl(xc[0], xc[1], tiles)

    _, out = jax.lax.scan(body, None, (xs, clips))
    return out.reshape(x.shape)


def _clahe_ok(h: int, w: int, tiles: int) -> bool:
    """CLAHE needs tile-divisible dims and even tiles (half-tile cells)."""
    return (tiles > 0 and h % tiles == 0 and w % tiles == 0
            and (h // tiles) % 2 == 0 and (w // tiles) % 2 == 0)


def _sort2(a, b):
    return jnp.minimum(a, b), jnp.maximum(a, b)


def _median3(x):
    """Exact 3x3 median filter via the classic 19-exchange sorting
    network -- branch-free elementwise min/max, one fused VPU pass.
    Border: edge replicate (cv2.medianBlur semantics)."""
    h, w = x.shape[1], x.shape[2]
    y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    p = [y[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    p[1], p[2] = _sort2(p[1], p[2]); p[4], p[5] = _sort2(p[4], p[5])
    p[7], p[8] = _sort2(p[7], p[8]); p[0], p[1] = _sort2(p[0], p[1])
    p[3], p[4] = _sort2(p[3], p[4]); p[6], p[7] = _sort2(p[6], p[7])
    p[1], p[2] = _sort2(p[1], p[2]); p[4], p[5] = _sort2(p[4], p[5])
    p[7], p[8] = _sort2(p[7], p[8]); p[0], p[3] = _sort2(p[0], p[3])
    p[5], p[8] = _sort2(p[5], p[8]); p[4], p[7] = _sort2(p[4], p[7])
    p[3], p[6] = _sort2(p[3], p[6]); p[1], p[4] = _sort2(p[1], p[4])
    p[2], p[5] = _sort2(p[2], p[5]); p[4], p[7] = _sort2(p[4], p[7])
    p[4], p[2] = _sort2(p[4], p[2]); p[6], p[4] = _sort2(p[6], p[4])
    p[4], p[2] = _sort2(p[4], p[2])
    return p[4]


def _median_blur(x, size: int):
    """Median blur: exact 3x3 network; 5x5 as iterated 3x3 (documented
    approximation -- a 25-element selection network is ~5x the VPU work
    for a p<=0.12 augmentation branch)."""
    y = _median3(x)
    if size >= 5:
        y = _median3(y)
    return y


def _motion_blur(x, size: int, direction):
    """Directional (motion) blur of length ``size`` along a per-image
    direction in {0deg, 45deg, 90deg, 135deg} -- integer-pixel rays, the
    device-friendly subset of albumentations MotionBlur's random line
    kernel.  Documented divergences: (a) continuous angles -> 4 axes;
    (b) the kernel length is the static ``cfg.blur_size`` (3 weak /
    5 strong) rather than MotionBlur's per-image draw from
    blur_limit=(3, 7) -- a per-image length would force computing every
    candidate length (static shapes), tripling the VPU passes for a
    visually minor spread.  ``direction``: (B,) int32 in [0, 4)."""
    h, w = x.shape[1], x.shape[2]
    r = size // 2
    y = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    sums = []
    for ddy, ddx in ((0, 1), (1, 1), (1, 0), (1, -1)):
        acc = 0.0
        for i in range(size):
            o = i - r
            dy, dx = r + o * ddy, r + o * ddx
            acc = acc + y[:, dy:dy + h, dx:dx + w]
        sums.append(acc / size)
    d = direction[:, None, None, None]
    return jnp.where(d == 0, sums[0],
                     jnp.where(d == 1, sums[1],
                               jnp.where(d == 2, sums[2], sums[3])))


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


def _subset_budget(n: int, p: float) -> int:
    """Static mean + 3 sigma whole-image budget for a per-image Bernoulli(p)
    selection, rounded up to a multiple of 4 (keeps the CLAHE scan
    chunking divisor-friendly).  P(binomial(n, p) > budget) ~ 1e-3."""
    if n <= 8:
        return n
    return min(n, int(4 * math.ceil(
        (n * p + 3.0 * math.sqrt(n * p * (1.0 - p))) / 4.0)))


def _compact_select(key, want, budget: int):
    """Indices of at most ``budget`` images from the ``want`` mask
    (selected images first, random drop beyond the budget).  The single
    home of the priority/argsort selection used by every compaction
    site."""
    n = want.shape[0]
    prio = jnp.where(want, jax.random.uniform(key, (n,)), 2.0)
    return jnp.argsort(prio)[:budget]


def _compact_apply(key, x, want, budget: int, fn):
    """Apply ``fn`` to at most ``budget`` of the images selected by ``want``.

    Gathers whole images (dense rows -- cheap on TPU, unlike per-pixel
    gathers), applies ``fn`` to the (budget, H, W, C) subset, scatters
    back.  Returns (out, served): ``out[i] == fn(x)[i]`` where served,
    ``x[i]`` elsewhere; ``served == want`` unless more than ``budget``
    images were selected (excess images are dropped at random).
    """
    n = x.shape[0]
    if budget >= n:
        full = fn(x)
        return jnp.where(want[:, None, None, None], full, x), want
    idx = _compact_select(key, want, budget)
    sub = fn(jnp.take(x, idx, axis=0))
    out = x.at[idx].set(jnp.where(jnp.take(want, idx)[:, None, None, None],
                                  sub.astype(x.dtype), jnp.take(x, idx, axis=0)))
    served = (jnp.zeros((n,), bool).at[idx].set(True)) & want
    return out, served


def _photometric_batch(key, x, cfg: AugmentConfig):
    """All photometric ops, batched; per-image `where` gates (masks untouched).

    Runs in ``x.dtype`` (bf16 on the production path); per-image RNG
    params are cast to it so f32 scalars don't silently upcast the
    whole 400 MB batch per op.
    """
    n = x.shape[0]
    dt = x.dtype
    # every consumer below gets its OWN key: re-splitting an already
    # consumed key reads the same threefry counter positions and couples
    # draws that must be independent
    k = jax.random.split(key, 22)
    u = lambda kk: jax.random.uniform(kk, (n,))
    gate = lambda d: d[:, None, None, None]
    par = lambda a: a.astype(dt)[:, None, None, None]

    if cfg.p_noise > 0:
        # noise generation (threefry over the full batch is ~3/4 of this
        # op's cost) and the add ride the compacted noise subset; std is
        # drawn per subset SLOT -- exchangeable iid, same distribution
        do = u(k[0]) < cfg.p_noise

        def noise_fn(sub):
            std = jax.random.uniform(k[1], (sub.shape[0],),
                                     minval=cfg.noise_std[0],
                                     maxval=cfg.noise_std[1])
            noise = jax.random.normal(k[2], sub.shape, dtype=dt) \
                * std.astype(dt)[:, None, None, None]
            return jnp.clip(sub + noise, 0.0, 1.0).astype(dt)

        x, _ = _compact_apply(k[20], x, do, _subset_budget(n, cfg.p_noise),
                              noise_fn)

    if cfg.p_blur > 0:
        # OneOf {motion, median, box}, per-image choice with the
        # reference's normalized member weights
        # (src/models/augmentation.py:19-23).  All three members are
        # computed only on the compacted blur subset (p_blur of the
        # batch) -- the 4-direction motion sums plus the median sorting
        # network are ~25 VPU passes, wasted on the ~80% of images that
        # don't blur.
        do = u(k[3]) < cfg.p_blur
        uw = u(k[4])
        w0, w1, _ = cfg.blur_weights
        direction = jax.random.randint(k[5], (n,), 0, 4)
        # The OneOf choice and motion direction must follow the gathered
        # images, so the compaction is inlined here rather than via
        # _compact_apply.
        budget = _subset_budget(n, cfg.p_blur)
        if budget >= n:
            blurred = jnp.where(
                gate(uw < w0), _motion_blur(x, cfg.blur_size, direction),
                jnp.where(gate(uw < w0 + w1),
                          _median_blur(x, cfg.blur_size),
                          _box_blur(x, cfg.blur_size)))
            x = jnp.where(gate(do), blurred, x)
        else:
            idx = _compact_select(k[16], do, budget)
            sub = jnp.take(x, idx, axis=0)
            uw_s = jnp.take(uw, idx)[:, None, None, None]
            dir_s = jnp.take(direction, idx)
            blurred = jnp.where(
                uw_s < w0, _motion_blur(sub, cfg.blur_size, dir_s),
                jnp.where(uw_s < w0 + w1, _median_blur(sub, cfg.blur_size),
                          _box_blur(sub, cfg.blur_size)))
            served = jnp.take(do, idx)[:, None, None, None]
            x = x.at[idx].set(jnp.where(served, blurred, sub))

    if cfg.p_color > 0:
        # OneOf {CLAHE, sharpen, emboss, brightness/contrast}, uniform
        # member weights like the reference's equal-p OneOf
        # (src/models/augmentation.py:29-34); when CLAHE is disabled or
        # the tile geometry doesn't divide, its slot redistributes.
        # CLAHE (~50x the VPU cost of its siblings) and the two 9-tap
        # per-image convs (sharpen/emboss) run only on compacted subsets
        # of the images that actually draw them; brightness/contrast is
        # one fused pass and stays full-batch.  Per-image parameters are
        # drawn per subset SLOT -- exchangeable iid, same distribution.
        do = u(k[6]) < cfg.p_color
        uw = u(k[7])
        b = jax.random.uniform(k[12], (n,), minval=-cfg.brightness_limit,
                               maxval=cfg.brightness_limit)
        c = 1.0 + jax.random.uniform(k[13], (n,), minval=-cfg.contrast_limit,
                                     maxval=cfg.contrast_limit)
        bc = jnp.clip((x - 0.5) * par(c) + 0.5 + par(b), 0.0, 1.0)
        use_clahe = (cfg.clahe_clip > 1.0
                     and _clahe_ok(x.shape[1], x.shape[2], cfg.clahe_tiles))

        # sharpen/emboss: members [se_lo, se_hi) of the OneOf draw
        se_lo, se_hi = (0.25, 0.75) if use_clahe else (0.0, 2.0 / 3.0)
        se_mid = (se_lo + se_hi) / 2.0
        want_se = do & (uw >= se_lo) & (uw < se_hi)

        def se_members(sub):
            m = sub.shape[0]
            sa = jax.random.uniform(k[8], (m,), minval=cfg.sharpen_alpha[0],
                                    maxval=cfg.sharpen_alpha[1])
            sl = jax.random.uniform(k[9], (m,),
                                    minval=cfg.sharpen_lightness[0],
                                    maxval=cfg.sharpen_lightness[1])
            ea = jax.random.uniform(k[10], (m,), minval=cfg.emboss_alpha[0],
                                    maxval=cfg.emboss_alpha[1])
            es = jax.random.uniform(k[11], (m,),
                                    minval=cfg.emboss_strength[0],
                                    maxval=cfg.emboss_strength[1])
            sharp = jnp.clip(_conv3x3_per_image(sub, _sharpen_kernel(sa, sl)
                                                .astype(dt)), 0.0, 1.0)
            emb = jnp.clip(_conv3x3_per_image(sub, _emboss_kernel(ea, es)
                                              .astype(dt)), 0.0, 1.0)
            return sharp, emb

        budget_se = _subset_budget(n, cfg.p_color * (se_hi - se_lo))
        if budget_se >= n:
            sharp, emb = se_members(x)
            se = jnp.where(gate(uw < se_mid), sharp, emb)
        else:
            idx = _compact_select(k[19], want_se, budget_se)
            sub = jnp.take(x, idx, axis=0)
            sharp_s, emb_s = se_members(sub)
            uw_s = jnp.take(uw, idx)[:, None, None, None]
            want_s = jnp.take(want_se, idx)[:, None, None, None]
            se_sub = jnp.where(uw_s < se_mid, sharp_s, emb_s)
            se = x.at[idx].set(jnp.where(want_s, se_sub, sub))

        if use_clahe:
            want_cl = do & (uw < 0.25)

            def clahe_fn(sub):
                clips = jax.random.uniform(k[17], (sub.shape[0],),
                                           minval=1.0, maxval=cfg.clahe_clip)
                return _clahe_rgb(
                    jnp.clip(sub, 0.0, 1.0).astype(jnp.float32), clips,
                    cfg.clahe_tiles).astype(dt)

            budget_cl = _subset_budget(n, cfg.p_color * 0.25)
            cl, _ = _compact_apply(k[18], x, want_cl, budget_cl, clahe_fn)
            chosen = jnp.where(gate(uw < 0.25), cl,
                               jnp.where(gate(uw < 0.75), se, bc))
        else:
            chosen = jnp.where(gate(uw < 2.0 / 3.0), se, bc)
        x = jnp.where(gate(do), chosen, x)

    if cfg.p_hsv > 0:
        # the RGB->HSV->RGB round trip (divides, mods, 6-way selects) is
        # ~10 VPU passes; ride the compacted HSV subset.  Shifts are
        # drawn per subset SLOT -- exchangeable iid, same distribution
        do = u(k[14]) < cfg.p_hsv

        def hsv_fn(sub):
            m_ = sub.shape[0]
            khsv = jax.random.split(k[15], 3)
            dh = jax.random.uniform(khsv[0], (m_,), minval=-cfg.hue_shift,
                                    maxval=cfg.hue_shift)
            ds = jax.random.uniform(khsv[1], (m_,), minval=-cfg.sat_shift,
                                    maxval=cfg.sat_shift)
            dv = jax.random.uniform(khsv[2], (m_,), minval=-cfg.val_shift,
                                    maxval=cfg.val_shift)
            hsv = _rgb_to_hsv(jnp.clip(sub, 0.0, 1.0))
            p3 = lambda a: a.astype(dt)[:, None, None]
            hsv = jnp.stack([
                (hsv[..., 0] + p3(dh)) % 1.0,
                jnp.clip(hsv[..., 1] + p3(ds), 0.0, 1.0),
                jnp.clip(hsv[..., 2] + p3(dv), 0.0, 1.0),
            ], axis=-1)
            return _hsv_to_rgb(hsv).astype(dt)

        x, _ = _compact_apply(k[21], x, do, _subset_budget(n, cfg.p_hsv),
                              hsv_fn)
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
    n = images.shape[0]
    m = masks.astype(jnp.int32) if masks is not None else None
    has_dihedral = cfg.p_rot90 > 0 or cfg.p_flip > 0 or cfg.p_transpose > 0

    k_dih, k_ssr, k_photo = jax.random.split(key, 3)
    pallas_dihedral = cfg.pallas_dihedral
    if pallas_dihedral == "auto":
        # resolved at trace time; the kernel wins in-step on TPU
        # (405.6 vs 415.6 ms at B=128 @ 512px).  Single chip only:
        # under the jit+SPMD mesh path a pallas_call has no
        # batch-partitioning rule, so multi-device programs keep the
        # XLA dihedral until that is validated on real multi-chip
        # hardware.
        pallas_dihedral = ("fast" if jax.default_backend() == "tpu"
                           and jax.device_count() == 1 else "")
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    def _xla_dihedral(images, m, abc):
        x = images.astype(jnp.float32)
        x = x / 255.0 if jnp.issubdtype(images.dtype, jnp.integer) else x
        x = x.astype(compute_dtype)
        return _apply_dihedral(x, m, *abc)

    if (pallas_dihedral and has_dihedral
            and jnp.issubdtype(images.dtype, jnp.integer)):
        # fused Pallas dequant+dihedral on the raw uint8 batch.  The
        # kernel is selected PER LOWERING PLATFORM, not per process
        # global: ``jax.default_backend()`` can disagree with the
        # devices a program is actually jitted for (e.g. the remote-TPU
        # axon box reports a 1-chip "tpu" default while the multichip
        # dryrun lowers for a forced-CPU mesh — backend caching means
        # even ``jax.config.update('jax_platforms', 'cpu')`` after
        # first device contact cannot flip the global).  Compiled
        # Mosaic exists only on TPU, so every other platform takes the
        # numerically-pinned XLA dihedral (tests/test_pallas.py pins
        # kernel==XLA; direct kernel tests off-TPU use interpret=True).
        from uda_aerial_semantic_segmentation_research_tpu.ops.pallas_ops import (
            dihedral_normalize,
            flags_from_abc,
        )

        abc = _sample_dihedral(k_dih, n, cfg)
        prec = (jax.lax.Precision.HIGHEST if pallas_dihedral == "exact"
                else jax.lax.Precision.DEFAULT)

        def _pallas_dihedral(images, abc, *ms):
            x, m2 = dihedral_normalize(images, flags_from_abc(*abc),
                                       *ms, normalize=False, precision=prec)
            x = x.astype(compute_dtype)
            return (x, m2) if ms else x

        def _xla_branch(images, abc, *ms):
            x, m2 = _xla_dihedral(images, ms[0] if ms else None, abc)
            return (x, m2) if ms else x

        ms = () if m is None else (m,)
        out = jax.lax.platform_dependent(images, abc, *ms,
                                         tpu=_pallas_dihedral,
                                         default=_xla_branch)
        x, m = out if m is not None else (out, None)
    else:
        if has_dihedral:
            abc = _sample_dihedral(k_dih, n, cfg)
            x, m = _xla_dihedral(images, m, abc)
        else:
            x = images.astype(jnp.float32)
            x = x / 255.0 if jnp.issubdtype(images.dtype, jnp.integer) else x
            x = x.astype(compute_dtype)
    if cfg.p_ssr > 0 or cfg.p_distort > 0:
        x, m = _warp_stage(k_ssr, x, m, cfg)
    x = _photometric_batch(k_photo, x, cfg)

    x = x.astype(jnp.float32)
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
