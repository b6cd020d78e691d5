"""Pallas TPU kernels for the image front-end.

``dihedral_normalize``: per-image dihedral transform (transpose /
flip-x / flip-y gates) fused with uint8 dequantization and ImageNet
normalization in ONE VMEM-resident pass.  The XLA path (ops/augment.py)
executes this as four separate HBM round trips (dequant -> transpose
select -> two flip selects -> normalize); the kernel reads each input
tile once and writes each output tile once.

Grid: one program per batch image; the whole (H, W, C) tile lives in
VMEM (512x512x3 uint8 = 768 KB in, 3 MB f32 out -- well under the
16 MB/core budget).  Per-image gate bits arrive via scalar prefetch
(``PrefetchScalarGridSpec``) so the index maps can read them before the
kernel body runs.

Correctness is locked to the XLA implementation by parity tests
(tests/test_pallas.py) which run the kernels in interpreter mode on CPU.

Status notes:
- ``fused_cross_entropy``: COMPILES AND RUNS ON THE TPU (the round-1
  HTTP-500 was the labels BlockSpec violating Mosaic's block-divisibility
  rule; labels now ride as a (1, N) array blocked along columns).
  Measured vs the XLA CE on bf16 (C, N) operands at 2M rows: 7.9 ms vs
  9.0 ms fwd+bwd.  In the full train step it is NOT a win: the head
  emits channel-minor NHWC logits and the kernel's (C, N) layout costs
  a 1.5 GB transpose each way (measured 480 vs 449 ms/step at
  B=128 @ 512px), so the XLA CE stays production; the kernel is kept
  for (C, N)-native callers and as the layout-rule regression test.
- ``dihedral_normalize``: COMPILES AND RUNS ON THE TPU, and is the
  TPU-backend PRODUCTION path (AugmentConfig.pallas_dihedral="auto").
  Three Mosaic gaps were engineered around: no ``rev`` lowering (flips
  run as gated anti-identity permutation matmuls on the MXU), no
  slicing of 3-wide channel-minor blocks (channel-planar (B, C, H, W)
  layout, grid (B, C)), no select over i1 vectors (operands cast to
  f32 first).  On-chip at B=128 @ 512px: 11.6 ms exact (HIGHEST) /
  4.8 ms at default MXU precision (< half a uint8 LSB error) vs
  18.4 ms for the XLA dihedral passes.  FULL-STEP A/B (r3, supervised
  step B=128 @ 512px): fast 405.6 ms / exact 409.0 ms vs 415.6 ms XLA
  -- the r2 hypothesis that the XLA selects win by fusing into the
  wider program did NOT hold; "fast" is the default (its error is
  below the uint8 input quantization; masks are exact either way).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uda_aerial_semantic_segmentation_research_tpu.config import Config

_MEAN = tuple(float(v) for v in Config.NORMALIZE_MEAN)
_STD = tuple(float(v) for v in Config.NORMALIZE_STD)


def _flip_mats(bits, n: int):
    """Gated reversal operators: (Ry, Rx) where R is the anti-identity
    when the flip bit is set, else identity.

    Mosaic's TC kernels have no ``rev`` lowering; a reversal is instead
    ONE permutation matmul on the MXU (entries are 0/1, so ``P @ x``
    merely relocates values -- exact in any dtype).  Selecting between
    identity and anti-identity folds the per-image gate into the
    operand, keeping the kernel branch-free.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # select over f32 vectors: Mosaic has no lowering for selects on
    # boolean (i1) vector operands
    eye = (rows == cols).astype(jnp.float32)
    anti = (rows == (n - 1) - cols).astype(jnp.float32)
    do_fx = (bits & 2) != 0
    do_fy = (bits & 4) != 0
    rx = jnp.where(do_fx, anti, eye)
    ry = jnp.where(do_fy, anti, eye)
    return ry, rx


def _dihedral_norm_kernel(flags_ref, img_ref, out_ref, *, normalize: bool,
                          precision):
    """One (image, channel) PLANE: dequant -> gated dihedral -> normalize.

    Channel-planar blocks (1, 1, H, W): the lane dimension is W (tile-
    aligned) instead of a 3-wide channel minor, which Mosaic cannot
    slice.  The ImageNet stats are STATIC module constants, selected by
    the channel grid index (a (2, C) operand block cannot satisfy the
    (8, 128) block-divisibility rule).  Flips run as gated permutation
    matmuls (see ``_flip_mats``); transpose uses Mosaic's native
    ``swapaxes``.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    bits = flags_ref[b]
    # Mosaic has no direct uint8 -> f32 cast; hop through int32
    x = img_ref[0, 0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)

    do_t = (bits & 1) != 0
    x = jnp.where(do_t, jnp.swapaxes(x, 0, 1), x)
    ry, rx = _flip_mats(bits, x.shape[0])
    # HIGHEST -> bit-exact relocation (measured 11.6 ms at B=128 @
    # 512px); DEFAULT -> bf16 MXU passes, error < half a uint8 LSB,
    # 4.8 ms.  Both beat the 18.4 ms XLA dihedral path.
    x = jax.lax.dot(ry, jax.lax.dot(x, rx, precision=precision),
                    precision=precision)
    if normalize:
        mean = jnp.where(c == 0, _MEAN[0],
                         jnp.where(c == 1, _MEAN[1], _MEAN[2]))
        std = jnp.where(c == 0, _STD[0],
                        jnp.where(c == 1, _STD[1], _STD[2]))
        x = (x - mean) / std
    out_ref[0, 0] = x


def _dihedral_mask_kernel(flags_ref, mask_ref, out_ref):
    """Mask planes travel as f32 (cast OUTSIDE the kernel) and are
    indexed DIRECTLY off the (1, H, W) block ref: Mosaic rejects this
    kernel when the lane (W) dim is < 128 if the mask block is int32 or
    if the (H, W) plane is carved out via an ``.at[0]`` sub-ref
    (remote-compile failure at 64px tiles, fine at >= 128); f32 blocks
    with plain ``ref[0]`` indexing lower at any tile size.  Labels
    < 2^24 are exact in f32 and XLA fuses the outside casts."""
    bits = flags_ref[pl.program_id(0)]
    m = mask_ref[0]
    do_t = (bits & 1) != 0
    m = jnp.where(do_t, jnp.swapaxes(m, 0, 1), m)
    ry, rx = _flip_mats(bits, m.shape[0])
    # default precision is exact here: labels < 256 are representable in
    # bf16 and each output accumulates exactly one nonzero product
    out_ref[0] = jax.lax.dot(ry, jax.lax.dot(m, rx))


@partial(jax.jit, static_argnames=("normalize", "interpret", "precision"))
def dihedral_normalize(images, flags, masks=None, *, normalize: bool = False,
                       interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST):
    """Fused per-image dihedral + dequant (+ ImageNet normalize).

    Args:
        images: uint8/float (B, H, W, C) with H == W (square tiles).
        flags: int32 (B,) bitmask -- bit0 transpose, bit1 flip-x (width),
            bit2 flip-y (height); matches ops/augment._apply_dihedral.
        masks: optional int32 (B, H, W) transformed with the same gates.
        normalize: apply ImageNet mean/std after dequantization.
        interpret: run in the Pallas interpreter (CPU testing).

    Returns (float32 images, masks or None).
    """
    b, h, w, c = images.shape
    if h != w:
        raise ValueError("dihedral kernel requires square tiles")
    flags = flags.astype(jnp.int32)

    # channel-planar layout: (B, C, H, W) so each program's block has a
    # tile-aligned (H, W) trailing shape (a 3-wide channel-minor block
    # is unsliceable under Mosaic's (8, 128) tiling)
    planar = jnp.transpose(images, (0, 3, 1, 2))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j, flags: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j, flags: (i, j, 0, 0)),
    )

    out = pl.pallas_call(
        partial(_dihedral_norm_kernel, normalize=normalize,
                precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        interpret=interpret,
    )(flags, planar)
    out = jnp.transpose(out, (0, 2, 3, 1))

    out_mask = None
    if masks is not None:
        mask_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, h, w), lambda i, flags: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, h, w), lambda i, flags: (i, 0, 0)),
        )

        out_mask = pl.pallas_call(
            _dihedral_mask_kernel,
            grid_spec=mask_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            interpret=interpret,
        )(flags, masks.astype(jnp.float32)).astype(jnp.int32)
    return out, out_mask


def flags_from_abc(a, b, c):
    """Pack the (transpose, flip_x, flip_y) booleans into the kernel bitmask."""
    return (a.astype(jnp.int32) + 2 * b.astype(jnp.int32)
            + 4 * c.astype(jnp.int32))


# ---------------------------------------------------------------------------
# fused softmax cross-entropy (custom VJP)
# ---------------------------------------------------------------------------
# The per-pixel CE over (B*H*W, C) logits is the largest tensor in every
# training phase (B=128 @ 512px: 33.5M x 23).  The fused kernel:
#   forward: one pass, accumulating the scalar mean NLL across grid
#            steps in a (1,1) output block -- no (N,) nll or f32 softmax
#            materialization;
#   backward: recomputes softmax tile-by-tile and writes
#            g * (softmax - onehot) / N in one pass.
# Parity vs ops.losses.softmax_cross_entropy is pinned by
# tests/test_pallas.py (interpreter mode).

# pixels (columns) per grid step.  The kernel consumes logits
# TRANSPOSED as (C, N): with channel-minor (N, C) operands the TPU's
# (8/16, 128) tiled layouts pad the 23-class lane dimension to 128
# (5.6x memory -- a compile-time HBM OOM at bench shape, observed
# 37.8 GiB); as (C, N) only the sublane dim pads (23 -> 24/32).
_CE_TILE = 4096


def _ce_fwd_kernel(logits_ref, labels_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = 0.0

    x = logits_ref[:].astype(jnp.float32)            # (C, TILE)
    m = jnp.max(x, axis=0, keepdims=True)            # (1, TILE)
    # all intermediates stay 2-D: Mosaic's vector layout assignment
    # rejects 1-D relayouts of (TILE,) vectors ("non-singleton logical
    # dimension is replicated in destination but not in source")
    lse = jnp.log(jnp.sum(jnp.exp(x - m), axis=0, keepdims=True)) + m
    cls = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    onehot = (cls == labels_ref[:]).astype(jnp.float32)
    picked = jnp.sum(x * onehot, axis=0, keepdims=True)
    acc_ref[0, 0] += jnp.sum(lse - picked)


def _ce_bwd_kernel(g_ref, logits_ref, labels_ref, dx_ref, *, inv_n: float):
    x = logits_ref[:].astype(jnp.float32)            # (C, TILE)
    m = jnp.max(x, axis=0, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)
    cls = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    onehot = (cls == labels_ref[:]).astype(jnp.float32)
    dx_ref[:] = ((p - onehot) * (g_ref[0, 0] * inv_n)).astype(dx_ref.dtype)


def _ce_pad(logits2d, labels2d):
    """Pad the pixel dim of (C, N) logits / (N,) labels to _CE_TILE."""
    n = logits2d.shape[1]
    pad = (-n) % _CE_TILE
    if pad:
        logits2d = jnp.pad(logits2d, ((0, 0), (0, pad)))
        # padded columns get label -1: no class -> onehot all-zero; their
        # uniform-softmax NLL is subtracted analytically by the caller
        labels2d = jnp.pad(labels2d, (0, pad), constant_values=-1)
    return logits2d, labels2d, pad


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_cross_entropy(logits, labels):
    """Mean softmax CE over channel-last logits via Pallas (TPU).

    ``logits``: (..., C) float; ``labels``: (...) int.  Equivalent to
    ops.losses.softmax_cross_entropy(logits, labels) without class
    weights.
    """
    loss, _ = _ce_fwd(logits, labels)
    return loss


def _ce_call_fwd(logits2d, labels2d, interpret: bool):
    c, n = logits2d.shape
    ntiles = n // _CE_TILE
    acc = pl.pallas_call(
        _ce_fwd_kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((c, _CE_TILE), lambda i: (0, i)),
            # labels stay (1, N): a (1, TILE) block walking the column
            # axis satisfies Mosaic's (8, 128)-divisibility rule (the
            # leading block dim EQUALS the array dim)
            pl.BlockSpec((1, _CE_TILE), lambda i: (0, i)),
        ],
        # scalar accumulator lives in SMEM (scalars cannot store to VMEM)
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(logits2d, labels2d.reshape(1, n))
    return acc[0, 0]


def _interpret_default() -> bool:
    """Pallas TPU kernels run interpreted on non-TPU backends (CPU tests)."""
    return jax.default_backend() != "tpu"


def _ce_to_cn(logits, labels):
    """(..., C) logits -> (C, N) + flat labels (the TPU-friendly layout)."""
    c = logits.shape[-1]
    n = int(np.prod(logits.shape[:-1]))
    logits2d = jnp.moveaxis(logits.reshape(n, c), -1, 0)
    labels1d = labels.reshape(n).astype(jnp.int32)
    return _ce_pad(logits2d, labels1d) + (n, c)


def _ce_fwd(logits, labels, interpret: bool = None):
    if interpret is None:
        interpret = _interpret_default()
    logits2d, labels1d, pad, n, c = _ce_to_cn(logits, labels)
    total = _ce_call_fwd(logits2d, labels1d, interpret)
    if pad:
        # padded columns contributed lse(zeros) = log(C); remove
        total = total - pad * jnp.log(jnp.float32(c))
    return total / n, (logits, labels)


def _ce_bwd(res, g, interpret: bool = None):
    if interpret is None:
        interpret = _interpret_default()
    logits, labels = res
    logits2d, labels1d, pad, n, c = _ce_to_cn(logits, labels)
    ntiles = logits2d.shape[1] // _CE_TILE

    g2d = jnp.asarray(g, jnp.float32).reshape(1, 1)
    dx = pl.pallas_call(
        partial(_ce_bwd_kernel, inv_n=1.0 / n),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((c, _CE_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, _CE_TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((c, _CE_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct(logits2d.shape, logits.dtype),
        interpret=interpret,
    )(g2d, logits2d, labels1d.reshape(1, logits2d.shape[1]))
    dx = jnp.moveaxis(dx, 0, -1)
    if pad:
        dx = dx[:n]
    return dx.reshape(logits.shape), None


fused_cross_entropy.defvjp(lambda lg, lb: _ce_fwd(lg, lb),
                           lambda res, g: _ce_bwd(res, g))
