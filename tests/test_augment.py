"""On-device augmentation tests.

Verifies the TPU-native batched pipeline (ops/augment.py) against the
reference pipelines' semantic contracts (reference
src/models/augmentation.py): geometric ops are exact pixel
permutations, image/mask stay aligned, randomness is keyed, normalize
matches ImageNet stats.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
    NONE,
    STRONG,
    WEAK,
    AugmentConfig,
    Augmentation,
    augment_batch,
    denormalize_images,
    get_strong_augmentation,
    get_training_augmentation,
    get_validation_augmentation,
    normalize_images,
)

B, S = 2, 32
RNG = np.random.default_rng(3)
IMGS = RNG.integers(0, 255, (B, S, S, 3)).astype(np.uint8)
MASKS = RNG.integers(0, 7, (B, S, S)).astype(np.int32)
GEO_ONLY = AugmentConfig(p_rot90=1.0, p_flip=1.0, p_transpose=1.0, p_ssr=0.0,
                         p_noise=0, p_blur=0, p_color=0, p_hsv=0, p_distort=0)


def test_shapes_and_dtypes():
    x, m = augment_batch(jax.random.key(0), IMGS, MASKS, cfg=WEAK)
    assert x.shape == (B, S, S, 3) and x.dtype == jnp.float32
    assert m.shape == (B, S, S) and m.dtype == jnp.int32


def test_keyed_determinism():
    x1, _ = augment_batch(jax.random.key(0), IMGS, MASKS, cfg=STRONG)
    x2, _ = augment_batch(jax.random.key(0), IMGS, MASKS, cfg=STRONG)
    x3, _ = augment_batch(jax.random.key(1), IMGS, MASKS, cfg=STRONG)
    assert np.allclose(np.asarray(x1), np.asarray(x2))
    assert not np.allclose(np.asarray(x1), np.asarray(x3))


def test_dihedral_is_exact_permutation():
    """rot90/flip/transpose land on integer coordinates: the output must
    be an exact permutation of input pixels, not a resampling."""
    xg, mg = augment_batch(jax.random.key(2), IMGS, MASKS, cfg=GEO_ONLY,
                           normalize=False)
    xg, mg = np.asarray(xg), np.asarray(mg)
    for b in range(B):
        assert sorted(mg[b].ravel().tolist()) == sorted(MASKS[b].ravel().tolist())
        np.testing.assert_allclose(
            np.sort(xg[b].ravel()),
            np.sort(IMGS[b].astype(np.float32).ravel() / 255.0), atol=1e-5)


def test_image_mask_alignment_dihedral_exact():
    """Under pure dihedral transforms the image and mask permute
    identically: a coordinate-coded image must equal its coded mask."""
    coded_m = (np.arange(S * S).reshape(1, S, S) % 251).astype(np.int32)
    coded_i = np.repeat(coded_m[..., None], 3, axis=-1).astype(np.uint8)
    xc, mc = augment_batch(jax.random.key(7), coded_i, coded_m, cfg=GEO_ONLY,
                           normalize=False)
    np.testing.assert_allclose(np.asarray(xc)[0, :, :, 0] * 255.0,
                               np.asarray(mc)[0], atol=1e-3)


def test_image_mask_alignment_ssr():
    """Under shift-scale-rotate (bilinear image / nearest mask) a blocky
    pattern must stay aligned away from block boundaries."""
    blocks = (np.arange(S)[:, None] // 8 * 4 + np.arange(S)[None, :] // 8)
    coded_m = blocks[None].astype(np.int32)
    coded_i = np.repeat((blocks[None] * 13 % 251)[..., None], 3, -1).astype(np.uint8)
    ssr = AugmentConfig(p_rot90=0, p_flip=0, p_transpose=0, p_ssr=1.0,
                        p_noise=0, p_blur=0, p_color=0, p_hsv=0, p_distort=0)
    xc, mc = augment_batch(jax.random.key(9), coded_i, coded_m, cfg=ssr,
                           normalize=False)
    xc = np.asarray(xc)[0, :, :, 0] * 255.0
    mc = np.asarray(mc)[0]
    # where the image landed exactly on a block value, the mask must be
    # the SAME block (alignment); interpolated boundary pixels are excluded
    expected_img = (mc * 13 % 251).astype(np.float32)
    exact = np.abs(xc - expected_img) < 0.5
    assert exact.mean() > 0.5, f"too few interior pixels exact ({exact.mean():.2f})"
    np.testing.assert_allclose(xc[exact], expected_img[exact], atol=0.5)


def test_none_config_is_normalize_only():
    x, m = augment_batch(jax.random.key(0), IMGS, MASKS, cfg=NONE)
    expected = np.asarray(normalize_images(jnp.asarray(IMGS)))
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m), MASKS)


def test_normalize_imagenet_stats():
    x = normalize_images(jnp.asarray(IMGS))
    manual = (IMGS.astype(np.float32) / 255.0
              - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(x), manual, atol=1e-5)
    back = denormalize_images(x)
    np.testing.assert_allclose(np.asarray(back), IMGS.astype(np.float32) / 255.0,
                               atol=1e-5)


def test_two_views_differ():
    """The phase-3 dual-view trick: two key splits, two distinct views."""
    k1, k2 = jax.random.split(jax.random.key(0))
    v1, _ = augment_batch(k1, IMGS, None, cfg=STRONG)
    v2, _ = augment_batch(k2, IMGS, None, cfg=STRONG)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_pipeline_objects():
    """Reference-shaped Compose interface (albumentations calling style)."""
    for factory in (get_training_augmentation, get_strong_augmentation,
                    get_validation_augmentation):
        aug = factory(seed=0)
        assert isinstance(aug, Augmentation)
        out = aug(image=IMGS[0], mask=MASKS[0])
        assert out["image"].shape == (S, S, 3)
        assert out["mask"].shape == (S, S)
    out = get_training_augmentation()(image=IMGS[0])
    assert out["mask"] is None


def test_rejects_non_square():
    with pytest.raises(ValueError):
        augment_batch(jax.random.key(0),
                      np.zeros((1, 16, 32, 3), np.uint8), None, cfg=WEAK)
