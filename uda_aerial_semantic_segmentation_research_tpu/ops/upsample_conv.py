"""Fused nearest-upsample-2x + 3x3 convolution (exact phase decomposition).

The U-Net decoder's hottest pattern is ``conv3x3(nearest_up2(x))``
(reference smp decoder, mirrored in models/unet.py).  Computed naively
it materializes the 4x-larger upsampled tensor and convolves it: at
512px the last decoder level writes/reads a ~2 GB intermediate and runs
9 taps over 4x the positions.

Because nearest upsampling duplicates pixels, the composition is
EXACTLY a set of four 2x2 convolutions on the small input -- one per
output phase (r, s) in {0,1}^2 -- whose kernels are partial sums of the
3x3 kernel, interleaved back with a depth-to-space reshape
(the classic deconvolution transform; see e.g. "A Unified Hardware
Architecture for Convolutions and Deconvolutions", arXiv:2006.00053).
16 tap-mults per source position instead of 36, and no upsampled
intermediate.

``upsample2x_conv3x3(x, kernel)`` == ``conv3x3_same(nearest_up2(x),
kernel)`` to float tolerance; parity is pinned by tests/test_models.py (test_fused_decoder_matches_naive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _phase_kernels(kernel):
    """(3, 3, Cin, Cout) -> dict[(r, s)] = (2, 2, Cin, Cout) phase kernels.

    Row grouping (dy -> source row offset a in {0, 1} of the 2-tap):
      r=0: taps (m-1, m):   a0 = W[0],        a1 = W[1] + W[2]
      r=1: taps (m, m+1):   a0 = W[0] + W[1], a1 = W[2]
    and identically for columns.
    """
    rows = {
        0: jnp.stack([kernel[0], kernel[1] + kernel[2]]),           # (2,3,i,o)
        1: jnp.stack([kernel[0] + kernel[1], kernel[2]]),
    }

    def cols(a, s):
        if s == 0:
            return jnp.stack([a[:, 0], a[:, 1] + a[:, 2]], axis=1)  # (2,2,i,o)
        return jnp.stack([a[:, 0] + a[:, 1], a[:, 2]], axis=1)

    return {(r, s): cols(rows[r], s) for r in (0, 1) for s in (0, 1)}


def upsample2x_conv3x3(x, kernel, preferred_dtype=None):
    """conv3x3-SAME over the nearest-2x upsampling of ``x``, fused.

    The four phase convolutions run as ONE convolution whose output
    channels are the concatenated phase groups (2, 2, Cin, 4*Cout):
    with the decoder's small Cout (16-32) a per-phase conv uses only
    Cout of the MXU's 128 output lanes, while the combined conv uses
    4*Cout -- the same lane-packing argument as ops/packed_conv.py.
    The (H+1, W+1) window grid is shared by all phases (phase (r, s)
    reads windows r..r+H-1, s..s+W-1), so the combined conv computes
    each phase's positions plus one redundant edge row/column.

    Args:
        x: (B, H, W, Cin).
        kernel: (3, 3, Cin, Cout) HWIO (the SAME parameter a plain
            ``nn.Conv(features, (3, 3))`` would hold).

    Returns: (B, 2H, 2W, Cout), numerically equal to
        ``lax.conv(nearest_up2(x), kernel, SAME)``.
    """
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    phases = _phase_kernels(kernel.astype(x.dtype))
    k_all = jnp.concatenate([phases[(r, s)] for r in (0, 1) for s in (0, 1)],
                            axis=-1)                       # (2,2,Cin,4*Cout)
    # padding in the conv config: an explicit jnp.pad materializes a
    # full-resolution activation copy on TPU (see ops/packed_conv.py)
    y = jax.lax.conv_general_dilated(
        x, k_all, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype)            # (B,H+1,W+1,4C)

    def phase(g, r, s):
        return y[:, r:r + h, s:s + w, g * cout:(g + 1) * cout]

    # interleave phases: (B, H, 2, W, 2, Cout) -> (B, 2H, 2W, Cout)
    top = jnp.stack([phase(0, 0, 0), phase(1, 0, 1)], axis=3)
    bot = jnp.stack([phase(2, 1, 0), phase(3, 1, 1)], axis=3)
    y = jnp.stack([top, bot], axis=2)
    return y.reshape(b, 2 * h, 2 * w, cout)


# tap-folding matrix: A[di, t] = 1 iff source tap di contributes to
# dilated-kernel tap t; T(0)={0}, T(1)={0,1}, T(2)={1,2}, T(3)={2}.
# A host-side numpy constant (a cached jnp array would leak tracers
# across jit scopes).
_FOLD = np.asarray([[1, 1, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1]],
                   dtype=np.float32)


def _dilated_fwd_conv(x, kernel, preferred_dtype=None):
    """The raw dilated-schedule forward (autodiff backward)."""
    a = _FOLD
    k4 = jnp.einsum("it,js,ijco->tsco", a, a, kernel.astype(jnp.float32))
    y = jax.lax.conv_general_dilated(
        x, k4.astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype)
    return y


# MEASURED NON-WIN, kept for the record (r3s6, one v5e, supervised
# B=128 @ 512px): a custom_vjp routing the dilated conv's backward
# through the phase-decomposed schedule -- each cotangent a
# jax.linear_transpose (the map is bilinear, so no forward recompute),
# to remove ~10 ms/step of XLA %reverse on the 1 GB output-grads
# feeding its kernel-grad convs -- LOSES in-step: 354.6 ms with both
# cotangents phased, 354.4 ms with only the kernel-grad phased
# (autodiff control: 321.6 ms).  The phase transpose's de-interleave of
# the full-resolution cotangent costs more than the reverses it
# removes.  Gradient parity of both variants vs the naive path was
# pinned at ~1e-6 rel on CPU before measuring (git history of this file
# has the implementation).  Production keeps plain autodiff of the
# lhs-dilated conv.


def upsample2x_conv3x3_dilated(x, kernel, preferred_dtype=None):
    """conv3x3-SAME over the nearest-2x upsampling of ``x`` as ONE
    input-dilated (transposed-style) convolution.

    Nearest upsampling duplicates pixels, so taps of the 3x3 kernel
    that land on the same source pixel can be PRE-SUMMED into a 4x4
    kernel over the 2x-dilated input grid:

        conv3x3_same(nearest_up2(x)) ==
        conv(x, k4, lhs_dilation=2, padding=(2, 2))
        with k4[t, s] = sum_{di in T(t), dj in T(s)} w[di, dj],
        T(0)={0}, T(1)={0,1}, T(2)={1,2}, T(3)={2}.

    Unlike the phase-decomposed form above, there is no slice/stack
    interleave on the output side -- XLA:TPU lowers ``lhs_dilation``
    convolutions natively (its transposed-conv path), and the
    duplicate-tap folding means 16 tap-mults per 2x2 output quad
    instead of the naive 36.  The fold runs in f32 on the (3,3,Ci,Co)
    weights (one tiny einsum per step); exactness vs the naive path is
    pinned by tests/test_models.py.

    Backward: plain autodiff.  XLA:TPU reverses the full-resolution
    output-grad before the kernel-grad conv (~10 ms/step of %reverse at
    B=128 @ 512px, r3s6 profile), but both phase-routed alternatives
    measured SLOWER in-step -- see the ledger note above
    ``upsample2x_conv3x3_dilated``.
    """
    return _dilated_fwd_conv(x, kernel, preferred_dtype)
