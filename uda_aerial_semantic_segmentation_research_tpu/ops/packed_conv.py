"""Lane-packed 3x3 convolution for low-channel high-resolution layers.

The U-Net decoder's high-resolution convolutions have few output
channels (16-32 at 256-512px; reference smp decoder_channels, mirrored
in models/unet.py).  On TPU a convolution is an im2col matmul whose
OUTPUT lanes are the output channels: with Cout=16 only 16 of the
MXU's 128 output lanes do work (~12.5% occupancy) -- the profiled MFU
sink of the whole training step (BASELINE.md).

Space-to-depth output packing fixes the occupancy at the cost of extra
taps.  The four outputs of a 2x2 pixel block under a 3x3 stride-1 SAME
conv all read from one 4x4 input window, so the conv is EXACTLY a
stride-2 4x4 convolution producing ``4*Cout`` channels (one group per
output phase (r, s) in {0,1}^2), interleaved back with depth-to-space:

    K4[a, b, :, (r, s, o)] = K3[a - r, b - s, :, o]   (0 <= a-r, b-s < 3)

16 taps instead of 9 (1.78x MAC count), 4x the output lanes -- a ~2.25x
net win on lane-bound convolutions, and a no-op choice for wide ones
(which is why the decoder applies it only where Cout <= 32).

``conv3x3_packed`` wires the same trick into BOTH backward convolutions
via a custom VJP:

- dgrad is itself a 3x3 SAME conv (spatially-flipped, in/out-transposed
  kernel) with Cin output lanes -- recursively computed 2x2-packed;
- wgrad is taken through the forward composition, so XLA differentiates
  the stride-2 conv (producing the 4*Cout-lane packed kernel gradient)
  and the K3->K4 embedding's adjoint (a cheap sum of slices) folds it
  back to the 3x3 kernel gradient.

Exactness vs ``lax.conv_general_dilated(..., SAME)`` is pinned by
tests/test_models.py (same dtype, same contraction order per tap).

MEASURED VERDICT (r3, BASELINE.md variant ledger): the packing is a NET
LOSS on the v5e and is NOT wired into any production path.

- Inference (B=256 @ 512px, full Unet forward): 262.2 ms vs 154.0 ms
  for the plain convs -- the depth-to-space interleave materializes as
  6-D transpose copies that cost more than the lane-occupancy gain, and
  the 1.78x extra MACs compound it.
- Training (B=128 @ 512px): compile-time OOM at 30.9 G -- the
  transpose adjoints materialize f32 (B, H/2, 2, W/2, 2, C) buffers
  (2 GB each) on the backward path.

The lane-occupancy theory said a 16-channel conv wastes ~87% of MXU
output lanes; the measurement says XLA's own schedule for low-channel
convs beats explicit 2x2 packing end-to-end.  Kept as a tested,
documented negative result (``Unet(packed_decoder=True)`` remains
available for other chips/compilers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_kernel_2x2(k3):
    """(3, 3, Cin, Cout) -> (4, 4, Cin, 4*Cout) phase-embedded kernel.

    Output-channel group g = 2*r + s holds phase (r, s): K3 shifted down
    by r rows and right by s columns inside the 4x4 window, zero padded.
    """
    phases = [jnp.pad(k3, ((r, 1 - r), (s, 1 - s), (0, 0), (0, 0)))
              for r in (0, 1) for s in (0, 1)]
    return jnp.concatenate(phases, axis=-1)


def _depth_to_space_2x2(y):
    """(B, H/2, W/2, 4*C) phase-grouped -> (B, H, W, C)."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h2, w2, 2, 2, c)            # (.., r, s, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))     # (b, h2, r, w2, s, c)
    return y.reshape(b, h2 * 2, w2 * 2, c)


def _packed_fwd(x, k3):
    """3x3 SAME conv of NHWC ``x`` (even H, W) via the packed stride-2 conv.

    Padding rides in the convolution's own config -- an explicit
    ``jnp.pad`` materializes a full-resolution copy of the activation
    (XLA:TPU does not reliably fold pad into a strided conv operand; at
    B=128 @ 512px the training step's padded copies alone exceeded HBM).
    """
    y = jax.lax.conv_general_dilated(
        x, _expand_kernel_2x2(k3.astype(x.dtype)),
        window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _depth_to_space_2x2(y)


@jax.custom_vjp
def conv3x3_packed(x, k3):
    """2x2-lane-packed 3x3 SAME convolution (NHWC x, HWIO kernel).

    Numerically equal to ``lax.conv_general_dilated(x, k3, (1, 1),
    "SAME")`` with packed-MXU execution of forward, dgrad AND wgrad.
    Requires even H and W.
    """
    return _packed_fwd(x, k3)


def _fwd(x, k3):
    return _packed_fwd(x, k3), (x, k3)


def _bwd(res, dy):
    x, k3 = res
    # dgrad: adjoint of a 3x3 SAME conv is the 3x3 SAME conv with the
    # spatially flipped, in/out-transposed kernel -- same packing applies
    kt = jnp.transpose(k3[::-1, ::-1], (0, 1, 3, 2))
    dx = _packed_fwd(dy, kt.astype(dy.dtype)).astype(x.dtype)
    # wgrad: through the forward composition, so the kernel gradient is
    # computed in the packed (4*Cout-lane) form and summed back to 3x3
    _, vjp_k = jax.vjp(lambda k: _packed_fwd(x, k), k3)
    (dk,) = vjp_k(dy)
    return dx, dk


conv3x3_packed.defvjp(_fwd, _bwd)
