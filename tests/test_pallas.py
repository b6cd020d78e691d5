"""Pallas kernel parity tests (interpreter mode on CPU).

Every Pallas kernel must match its XLA reference implementation exactly
(the drop-in-replacement policy, SURVEY.md section 7): these tests pin
forward AND backward numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
    softmax_cross_entropy,
)
from uda_aerial_semantic_segmentation_research_tpu.ops.pallas_ops import (
    dihedral_normalize,
    flags_from_abc,
    fused_cross_entropy,
)

RNG = np.random.default_rng(0)


def test_fused_ce_forward_parity():
    logits = jnp.asarray(RNG.normal(size=(2, 24, 24, 7)).astype(np.float32))
    labels = jnp.asarray(RNG.integers(0, 7, (2, 24, 24)).astype(np.int32))
    lp = float(fused_cross_entropy(logits, labels))
    lx = float(softmax_cross_entropy(logits, labels))
    assert abs(lp - lx) < 1e-5


def test_fused_ce_grad_parity():
    logits = jnp.asarray(RNG.normal(size=(1, 16, 16, 5)).astype(np.float32))
    labels = jnp.asarray(RNG.integers(0, 5, (1, 16, 16)).astype(np.int32))
    gp = jax.grad(lambda x: fused_cross_entropy(x, labels))(logits)
    gx = jax.grad(lambda x: softmax_cross_entropy(x, labels))(logits)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-6)


def test_fused_ce_non_tile_multiple():
    """Row counts that don't divide the kernel tile are padded; the
    padded rows' analytic contribution is subtracted exactly."""
    n = 3000  # not a multiple of the 2048-row tile
    logits = jnp.asarray(RNG.normal(size=(n, 6)).astype(np.float32))
    labels = jnp.asarray(RNG.integers(0, 6, (n,)).astype(np.int32))
    lp = float(fused_cross_entropy(logits, labels))
    lx = float(softmax_cross_entropy(logits, labels))
    assert abs(lp - lx) < 1e-5


def test_dihedral_normalize_parity():
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _apply_dihedral,
        normalize_images,
    )

    B, S = 4, 16
    imgs = RNG.integers(0, 255, (B, S, S, 3)).astype(np.uint8)
    masks = RNG.integers(0, 7, (B, S, S)).astype(np.int32)
    a = jnp.asarray([False, True, False, True])
    b = jnp.asarray([False, False, True, True])
    c = jnp.asarray([True, False, False, True])

    x_p, m_p = dihedral_normalize(jnp.asarray(imgs), flags_from_abc(a, b, c),
                                  jnp.asarray(masks), normalize=True,
                                  interpret=True)
    x_ref = jnp.asarray(imgs).astype(jnp.float32) / 255.0
    x_ref, m_ref = _apply_dihedral(x_ref, jnp.asarray(masks), a, b, c)
    x_ref = normalize_images(x_ref)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_ref))


def test_dihedral_normalize_no_mask():
    B, S = 2, 16
    imgs = RNG.integers(0, 255, (B, S, S, 3)).astype(np.uint8)
    flags = jnp.asarray([0, 7], jnp.int32)
    x, m = dihedral_normalize(jnp.asarray(imgs), flags, None,
                              normalize=False, interpret=True)
    assert m is None
    # flags=0: identity (just dequantized)
    np.testing.assert_allclose(np.asarray(x[0]),
                               imgs[0].astype(np.float32) / 255.0, atol=1e-6)


# ---------------------------------------------------------------------------
# packed conv3x3 + BN-affine + ReLU (+ output moments) kernel
# ---------------------------------------------------------------------------
def test_packed_conv_bn_relu_parity():
    """Fused kernel == relu(scale*x + shift) -> conv3x3-SAME, with exact
    output moments (ops/pallas_conv.py; interpret mode on CPU)."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.pallas_conv import (
        packed_conv_bn_relu,
    )

    B, S, CI, CO = 2, 16, 8, 8
    x = jnp.asarray(RNG.normal(size=(B, S, S, CI)).astype(np.float32))
    k3 = jnp.asarray(0.1 * RNG.normal(size=(3, 3, CI, CO)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * RNG.normal(size=(CI,)).astype(np.float32))
    shift = jnp.asarray(0.1 * RNG.normal(size=(CI,)).astype(np.float32))

    y, (s, ss) = packed_conv_bn_relu(x, k3, scale, shift, moments=True,
                                     interpret=True)
    act = jnp.maximum(x * scale + shift, 0.0)
    ref = jax.lax.conv_general_dilated(
        act, k3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref.sum((0, 1, 2))),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss),
                               np.asarray((ref * ref).sum((0, 1, 2))),
                               rtol=1e-3, atol=1e-3)


def test_packed_conv_bn_relu_no_affine():
    from uda_aerial_semantic_segmentation_research_tpu.ops.pallas_conv import (
        packed_conv_bn_relu,
    )

    B, S, CI, CO = 1, 8, 4, 4
    x = jnp.asarray(RNG.normal(size=(B, S, S, CI)).astype(np.float32))
    k3 = jnp.asarray(0.1 * RNG.normal(size=(3, 3, CI, CO)).astype(np.float32))
    y = packed_conv_bn_relu(x, k3, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, k3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
