"""Pallas fused conv3x3 (+BN affine + ReLU) for low-channel decoder levels.

This is the blueprint's named kernel target (SURVEY.md section 7,
BASELINE.json: "fused conv+BN+ReLU blocks"): the decoder's 16-32-channel
convolutions at 256-512px are the training step's MFU sink (BASELINE.md
-- a 16-channel conv uses ~12.5% of the MXU's output lanes).

Design: the kernel operates in the same 2x2 space-to-depth packed domain
as ops/packed_conv.py (4*Cout output lanes, 16*Cin contraction), with
two fusions XLA's conv cannot express:

- **input BN-normalize + ReLU**: the previous conv's BatchNorm affine
  (scale/shift folded from batch statistics) and ReLU are applied to
  each VMEM-resident input tile as it is read, instead of a separate
  HBM read+write pass over the full activation.  Zero-padding semantics
  are preserved by packing the input with per-channel border value
  ``-shift/scale`` (so ``relu(scale * border + shift) == 0`` exactly,
  matching conv-SAME's zero ring around the post-ReLU activation).
- **output moment accumulation**: per-channel sum and sum-of-squares of
  the conv output are accumulated into a small per-program buffer while
  the output tile is still in VMEM, so the NEXT BatchNorm's batch
  statistics cost no extra HBM read of the activation.

Data layout contracts (all shapes static):

    xp   (B, Hp, Wp, 4*Cin)   packed input, Hp = H/2 + 1, Wp = W/2 + 1
                              (from pack_nhwc: pad-1 then 2x2 pack)
    km   (16*Cin, 4*Cout)     phase-embedded kernel matrix (from
                              build_km; pure rearrangement of the
                              3x3 HWIO kernel)
    yp   (B, H/2, W/2, 4*Cout) packed output (unpack with
                              ops.packed_conv._depth_to_space_2x2)
    moments (B, nblk, 2, 4*Cout) per-program [sum, sumsq] partials;
                              fold with fold_moments -> per-channel
                              (sum, sumsq) over (B, H, W)

Status (r3): COMPILES AND RUNS ON THE TPU after replacing the kernel's
lane-concatenation of shifted row views with four accumulated matmuls
(Mosaic rejects ``tpu.concatenate`` of vectors whose sublane offsets
differ: "result/input offset mismatch on non-concat dimension" -- the
r2 interpret-mode parity run never caught this).  IN-STEP A/B, full
Unet forward at B=256 @ 512px serving shape: **318.5 ms with
``pallas_eval=True`` vs 154.0 ms plain XLA** -- the fused kernel LOSES
2x.  The packed-domain pack/unpack shuffles around the kernel cost more
than the fused BN/ReLU passes save, the same failure mode as the pure
XLA packing (ops/packed_conv.py measured verdict).  XLA stays the
production path for both serving and training; the kernel is kept as
the blueprint-named artifact with its honest number, and as a Mosaic
layout-rule regression test (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# XLA-side layout helpers
# ---------------------------------------------------------------------------
def pack_nhwc(x, border=None):
    """(B, H, W, C) -> padded 2x2-packed (B, H/2+1, W/2+1, 4C).

    ``border`` (C,) fills the 1-pixel pad ring (default zeros); channel
    layout of the packed axis is (ri*2 + si)*C + c.
    """
    b, h, w, c = x.shape
    if border is None:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        xp = jnp.full((b, h + 2, w + 2, c), border.astype(x.dtype)[None, None, None])
        xp = xp.at[:, 1:-1, 1:-1].set(x)
    hp, wp = (h + 2) // 2, (w + 2) // 2
    xp = xp.reshape(b, hp, 2, wp, 2, c)
    xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5))
    return xp.reshape(b, hp, wp, 4 * c)


def build_km(k3):
    """(3, 3, Cin, Cout) HWIO -> (16*Cin, 4*Cout) packed matmul matrix.

    Row layout: ((di*2 + dj)*4 + ri*2 + si)*Cin + c for window-offset
    (di, dj) in {0,1}^2 and packed sub-pixel (ri, si); column layout:
    (ro*2 + so)*Cout + o.  Entry = K3[dy+1, dx+1, c, o] with
    dy = 2*di + ri - 1 - ro, dx = 2*dj + sj - 1 - so when |dy|,|dx| <= 1,
    else zero (pure rearrangement -- built once at trace time).
    """
    kh, kw, cin, cout = k3.shape
    assert (kh, kw) == (3, 3)
    rows = []
    for di in (0, 1):
        for dj in (0, 1):
            for ri in (0, 1):
                for si in (0, 1):
                    blk = []
                    for ro in (0, 1):
                        for so in (0, 1):
                            dy = 2 * di + ri - 1 - ro
                            dx = 2 * dj + si - 1 - so
                            if -1 <= dy <= 1 and -1 <= dx <= 1:
                                blk.append(k3[dy + 1, dx + 1])
                            else:
                                blk.append(jnp.zeros_like(k3[0, 0]))
                    rows.append(jnp.concatenate(blk, axis=-1))  # (cin, 4cout)
    return jnp.concatenate(rows, axis=0)                        # (16cin, 4cout)


def fold_moments(moments, cout):
    """(B, nblk, 8, 4*Cout) partials (rows 0/1 = sum/sumsq, rest zero
    sublane padding) -> per-channel (sum, sumsq) (2, Cout)."""
    m = moments.astype(jnp.float32).sum(axis=(0, 1))[:2]        # (2, 4*Cout)
    return m.reshape(2, 4, cout).sum(axis=1)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _conv_kernel(xp_ref, xnx_ref, km_ref, aff_ref, yp_ref, mom_ref, *,
                 hb, wo, affine, moments):
    """One (batch, row-block): hb packed output rows of width wo.

    Patches for output row i are built from packed input rows i, i+1 by
    lane-concatenating the four (di, dj) shifted views -- whole-row
    slices only (Mosaic-friendly), one (wo, 16*Cin) x (16*Cin, 4*Cout)
    matmul per output row.  ``xnx_ref`` carries the one-row halo
    (BlockSpec windows cannot overlap).
    """
    km = km_ref[...]
    c4 = km.shape[0] // 4
    o4 = km.shape[-1]
    if affine:
        scale = aff_ref[0:1]                                    # (1, c4)
        shift = aff_ref[1:2]

    def row(xr):
        if affine:
            xr = jnp.maximum(xr * scale + shift, 0.0).astype(xr.dtype)
        return xr

    acc = jnp.zeros((8, o4), jnp.float32)
    prev = row(xp_ref[0, 0])
    for i in range(hb):
        cur = row(xp_ref[0, i + 1] if i + 1 < hb else xnx_ref[0, 0])
        # one matmul per (di, dj) shifted view, accumulated: Mosaic
        # cannot lane-concatenate vectors whose sublane offsets differ
        # ("result/input offset mismatch on non-concat dimension"), so
        # the (wo, 4*c4) patch matrix is never materialized
        y = jnp.dot(prev[0:wo], km[0 * c4:1 * c4],
                    preferred_element_type=jnp.float32)
        y = y + jnp.dot(prev[1:wo + 1], km[1 * c4:2 * c4],
                        preferred_element_type=jnp.float32)
        y = y + jnp.dot(cur[0:wo], km[2 * c4:3 * c4],
                        preferred_element_type=jnp.float32)
        y = y + jnp.dot(cur[1:wo + 1], km[3 * c4:4 * c4],
                        preferred_element_type=jnp.float32)     # (wo, o4)
        yp_ref[0, i] = y.astype(yp_ref.dtype)
        if moments:
            acc = acc + jnp.concatenate(
                [y.sum(axis=0, keepdims=True),
                 (y * y).sum(axis=0, keepdims=True),
                 jnp.zeros((6, o4), jnp.float32)], axis=0)
        prev = cur
    if moments:
        mom_ref[0, 0] = acc


def packed_conv_bn_relu(x, k3, scale=None, shift=None, *,
                        row_block: int = 16, moments: bool = False,
                        interpret: bool | None = None):
    """Fused [BN-affine + ReLU ->] conv3x3-SAME [-> output moments].

    Args:
        x: (B, H, W, Cin) NHWC, even H and W.  When ``scale``/``shift``
            are given the kernel computes ``conv3x3(relu(scale * x +
            shift))`` (the decoder's BN->ReLU->conv chain with the
            BatchNorm folded to an affine); otherwise ``conv3x3(x)``.
        k3: (3, 3, Cin, Cout) HWIO kernel.
        moments: also return per-channel (sum, sumsq) of the conv
            output over (B, H, W) -- the next BatchNorm's batch moments.

    Returns y (B, H, W, Cout) in x.dtype (f32 MXU accumulation), or
    (y, (2, Cout) moments) when ``moments``.
    """
    from uda_aerial_semantic_segmentation_research_tpu.ops.packed_conv import (
        _depth_to_space_2x2,
    )

    b, h, w, cin = x.shape
    cout = k3.shape[-1]
    if h % 2 or w % 2:
        raise ValueError("packed conv requires even H, W")
    if interpret is None:
        # Pallas TPU kernels run interpreted on non-TPU backends
        interpret = jax.default_backend() != "tpu"
    affine = scale is not None
    border = (-shift / scale) if affine else None
    xp = pack_nhwc(x, border)                       # (B, Hp, Wp, 4cin)
    hp, wp = xp.shape[1], xp.shape[2]
    c4, o4 = 4 * cin, 4 * cout
    # pad the packed width to a sublane multiple (trailing cols unread)
    wpad = (-wp) % 8
    if wpad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    km = build_km(k3).astype(x.dtype)               # (4c4, o4)
    if affine:
        aff = jnp.stack([jnp.tile(scale, 4), jnp.tile(shift, 4)])
        aff = jnp.concatenate(
            [aff, jnp.zeros((6, c4), aff.dtype)]).astype(jnp.float32)
    else:
        aff = jnp.zeros((8, c4), jnp.float32)

    n_out, wo = hp - 1, wp - 1                      # = H/2, W/2
    hb = min(row_block, n_out)
    while n_out % hb:
        hb -= 1
    nblk = n_out // hb

    kernel = partial(_conv_kernel, hb=hb, wo=wo, affine=affine,
                     moments=moments)
    out_shapes = [jax.ShapeDtypeStruct((b, n_out, wo, o4), x.dtype),
                  jax.ShapeDtypeStruct((b, nblk, 8, o4), jnp.float32)]
    yp, mom = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, hb, wp + wpad, c4), lambda i, j: (i, j, 0, 0)),
            # one-row halo: block index (j+1)*hb in single-row units
            pl.BlockSpec((1, 1, wp + wpad, c4),
                         lambda i, j: (i, (j + 1) * hb, 0, 0)),
            pl.BlockSpec((16 * cin, o4), lambda i, j: (0, 0)),
            pl.BlockSpec((8, c4), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hb, wo, o4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 8, o4), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, xp, km, aff)

    y = _depth_to_space_2x2(yp)
    if moments:
        return y, fold_moments(mom, cout)
    return y
