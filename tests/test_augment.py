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


def test_median3_matches_numpy():
    """The 19-exchange sorting network is an exact 3x3 median."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _median3,
    )

    x = RNG.random((1, 12, 12, 2)).astype(np.float32)
    got = np.asarray(_median3(jnp.asarray(x)))
    pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    for i in range(12):
        for j in range(12):
            win = pad[0, i:i + 3, j:j + 3, :]
            np.testing.assert_allclose(
                got[0, i, j], np.median(win.reshape(9, 2), axis=0), atol=1e-6)


def test_sharpen_emboss_kernels():
    """Per-image 3x3 kernels match a direct numpy cross-correlation."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _conv3x3_per_image,
        _emboss_kernel,
        _sharpen_kernel,
    )

    x = RNG.random((2, 10, 10, 3)).astype(np.float32)
    alpha = jnp.asarray([0.3, 0.45])
    ks = np.asarray(_sharpen_kernel(alpha, jnp.asarray([0.6, 0.9])))
    ke = np.asarray(_emboss_kernel(alpha, jnp.asarray([0.2, 0.65])))
    # identity blend property: alpha=0 -> identity kernel
    k0 = np.asarray(_sharpen_kernel(jnp.zeros(1), jnp.asarray([0.7])))
    np.testing.assert_allclose(
        k0[0], np.array([[0, 0, 0], [0, 1, 0], [0, 0, 0]]), atol=1e-7)
    assert np.allclose(ks.sum(axis=(1, 2)),
                       (1 - np.array([0.3, 0.45]))
                       + np.array([0.3, 0.45]) * np.array([0.6, 0.9]), atol=1e-6)
    for kern in (ks, ke):
        got = np.asarray(_conv3x3_per_image(jnp.asarray(x), jnp.asarray(kern)))
        pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        for b in range(2):
            want = sum(kern[b, dy, dx] * pad[b, dy:dy + 10, dx:dx + 10]
                       for dy in range(3) for dx in range(3))
            np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_motion_blur_directions():
    """Motion blur averages along the chosen integer-pixel ray."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _motion_blur,
    )

    x = np.zeros((4, 9, 9, 1), np.float32)
    x[:, 4, 4, 0] = 1.0  # impulse
    out = np.asarray(_motion_blur(jnp.asarray(x), 3,
                                  jnp.asarray([0, 1, 2, 3])))
    third = 1.0 / 3.0
    # 0deg: horizontal
    assert np.allclose(out[0, 4, 3:6, 0], third)
    # 45deg: diagonal (dy=1, dx=1)
    assert np.allclose([out[1, 3, 3, 0], out[1, 4, 4, 0], out[1, 5, 5, 0]], third)
    # 90deg: vertical
    assert np.allclose(out[2, 3:6, 4, 0], third)
    # 135deg: anti-diagonal
    assert np.allclose([out[3, 3, 5, 0], out[3, 4, 4, 0], out[3, 5, 3, 0]], third)
    for b in range(4):
        np.testing.assert_allclose(out[b].sum(), 1.0, atol=1e-5)


def test_clahe_matches_cv2_unclipped():
    """With a huge clip limit (no clipping, no redistribution) the
    device CLAHE must match cv2.createCLAHE exactly on the L channel."""
    cv2 = pytest.importorskip("cv2")
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _clahe_apply,
        _clahe_lut,
    )

    l_u8 = RNG.integers(0, 256, (1, 64, 64)).astype(np.int32)
    clip = jnp.asarray([1e6])
    lut = _clahe_lut(jnp.asarray(l_u8), clip, 8)
    got = np.asarray(_clahe_apply(jnp.asarray(l_u8), lut, 8))[0]

    ref = cv2.createCLAHE(clipLimit=1e6, tileGridSize=(8, 8)).apply(
        l_u8[0].astype(np.uint8))
    # cv2 rounds the interpolated value; allow the half-ulp boundary
    assert np.abs(np.round(got) - ref.astype(np.float64)).max() <= 1.0
    assert np.abs(got - ref).mean() < 0.51


def test_clahe_matches_cv2_clipped():
    """Clipped path matches cv2 EXACTLY: the integer clip limit, the
    per-256 redistribution, and the strided residual drop are all
    replicated bin for bin."""
    cv2 = pytest.importorskip("cv2")
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _clahe_apply,
        _clahe_lut,
    )

    outs = []
    for s in (256, 64):
        base = (np.linspace(60, 190, s)[None, :]
                + np.linspace(0, 30, s)[:, None])
        l_u8 = (base + RNG.normal(0, 6, (s, s))).clip(0, 255) \
            .astype(np.int32)[None]
        for cl in (2.0, 4.0):
            lut = _clahe_lut(jnp.asarray(l_u8), jnp.asarray([cl]), 8)
            got = np.asarray(_clahe_apply(jnp.asarray(l_u8), lut, 8))[0]
            ref = cv2.createCLAHE(clipLimit=cl, tileGridSize=(8, 8)).apply(
                l_u8[0].astype(np.uint8))
            np.testing.assert_array_equal(
                np.round(got), ref.astype(np.float64),
                err_msg=f"s={s} clip={cl}")
            outs.append(got)
    # different clip limits must actually produce different outputs
    assert np.abs(outs[0] - outs[1]).max() > 1.0


def test_lab_roundtrip_and_cv2():
    """RGB->LAB matches cv2's float conversion; roundtrip is lossless."""
    cv2 = pytest.importorskip("cv2")
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _lab_to_rgb,
        _rgb_to_lab,
    )

    rgb = RNG.random((8, 8, 3)).astype(np.float32)
    L, a, b = _rgb_to_lab(jnp.asarray(rgb[None]))
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)  # float path: L in [0,100]
    np.testing.assert_allclose(np.asarray(L)[0], ref[..., 0], atol=0.5)
    np.testing.assert_allclose(np.asarray(a)[0], ref[..., 1], atol=0.5)
    np.testing.assert_allclose(np.asarray(b)[0], ref[..., 2], atol=0.5)
    back = np.asarray(_lab_to_rgb(L, a, b))[0]
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_clahe_batched_chunking_consistent():
    """Chunked scan path must equal the single-shot path."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _clahe_impl,
        _clahe_rgb,
    )

    x = jnp.asarray(RNG.random((4, 32, 32, 3)).astype(np.float32))
    clip = jnp.asarray([1.5, 2.0, 3.0, 4.0])
    whole = _clahe_impl(x, clip, 8)
    chunked = _clahe_rgb(x, clip, 8, chunk=2)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                               atol=1e-4)


def test_warp_groups_divisor():
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _n_groups,
    )

    assert _n_groups(128, 8) == 8
    assert _n_groups(6, 8) == 6      # small batch -> per-image
    assert _n_groups(6, 4) == 3
    assert _n_groups(7, 4) == 1      # prime batch -> shared
    assert _n_groups(1, 8) == 1


def test_grouped_warps_differ_across_groups():
    """With per-group magnitudes, different groups see different warps."""
    n = 8
    imgs = np.broadcast_to(IMGS[0], (n, S, S, 3)).copy()
    ssr = AugmentConfig(p_rot90=0, p_flip=0, p_transpose=0, p_ssr=1.0,
                        p_noise=0, p_blur=0, p_color=0, p_hsv=0, p_distort=0,
                        warp_groups=8)
    x, _ = augment_batch(jax.random.key(4), imgs, None, cfg=ssr,
                         normalize=False)
    x = np.asarray(x)
    # identical inputs, per-image warp params: outputs must differ pairwise
    diffs = sum(not np.allclose(x[i], x[j], atol=1e-4)
                for i in range(n) for j in range(i + 1, n))
    assert diffs >= 24, f"warps look shared across groups ({diffs} pairs differ)"


def test_image_mask_alignment_grouped_ssr():
    """Grouped SSR keeps image/mask aligned for every group."""
    n = 4
    blocks = (np.arange(S)[:, None] // 8 * 4 + np.arange(S)[None, :] // 8)
    coded_m = np.broadcast_to(blocks[None], (n, S, S)).astype(np.int32).copy()
    coded_i = np.repeat(((coded_m * 13 % 251))[..., None], 3, -1).astype(np.uint8)
    ssr = AugmentConfig(p_rot90=0, p_flip=0, p_transpose=0, p_ssr=1.0,
                        p_noise=0, p_blur=0, p_color=0, p_hsv=0, p_distort=0,
                        warp_groups=4)
    xc, mc = augment_batch(jax.random.key(11), coded_i, coded_m, cfg=ssr,
                           normalize=False)
    xc = np.asarray(xc)[..., 0] * 255.0
    mc = np.asarray(mc)
    for b in range(n):
        expected_img = (mc[b] * 13 % 251).astype(np.float32)
        exact = np.abs(xc[b] - expected_img) < 0.5
        assert exact.mean() > 0.5
        np.testing.assert_allclose(xc[b][exact], expected_img[exact], atol=0.5)


def test_compact_apply_serves_within_budget():
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _compact_apply,
        _subset_budget,
    )

    n = 32
    x = jnp.asarray(RNG.normal(size=(n, 4, 4, 3)).astype(np.float32))
    want = jnp.asarray(np.arange(n) % 5 == 0)          # 7 of 32 selected
    out, served = _compact_apply(jax.random.key(1), x, want, 8,
                                 lambda sub: sub + 1.0)
    assert bool(jnp.all(served == want))               # budget not exceeded
    np.testing.assert_allclose(np.asarray(out[np.asarray(want)]),
                               np.asarray(x[np.asarray(want)]) + 1.0)
    np.testing.assert_allclose(np.asarray(out[~np.asarray(want)]),
                               np.asarray(x[~np.asarray(want)]))


def test_compact_apply_truncates_over_budget():
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _compact_apply,
    )

    n = 16
    x = jnp.asarray(RNG.normal(size=(n, 2, 2, 1)).astype(np.float32))
    want = jnp.ones((n,), bool)
    out, served = _compact_apply(jax.random.key(2), x, want, 4,
                                 lambda sub: sub * 2.0)
    assert int(jnp.sum(served)) == 4                   # exactly the budget
    sv = np.asarray(served)
    np.testing.assert_allclose(np.asarray(out[sv]), np.asarray(x[sv]) * 2.0)
    np.testing.assert_allclose(np.asarray(out[~sv]), np.asarray(x[~sv]))


def test_subset_budget_bounds():
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _subset_budget,
    )

    assert _subset_budget(4, 0.075) == 4               # tiny batches: all
    b = _subset_budget(128, 0.075)                     # WEAK color OneOf
    assert 12 <= b <= 32 and b % 4 == 0
    assert _subset_budget(128, 0.125) >= b             # STRONG needs more


def test_grid_sample_matches_scipy_bilinear():
    """_grid_sample_grouped == scipy map_coordinates(order=1, mode='mirror')
    (mirror == reflect-101), including out-of-range sample positions --
    pins the paired-corner gather rewrite to an independent reference."""
    from scipy.ndimage import map_coordinates

    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        _grid_sample_grouped,
    )

    rng = np.random.default_rng(9)
    n, h, w = 4, 16, 16
    x = rng.normal(size=(n, h, w, 3)).astype(np.float32)
    kg = 2
    # sample positions spilling well past the borders on both sides
    sx = rng.uniform(-6, w + 5, size=(kg, h, w)).astype(np.float32)
    sy = rng.uniform(-6, h + 5, size=(kg, h, w)).astype(np.float32)
    gate = jnp.ones((n,), bool)

    out, _ = _grid_sample_grouped(jnp.asarray(x), None, jnp.asarray(sx),
                                  jnp.asarray(sy), gate)
    out = np.asarray(out)

    for i in range(n):
        k = i // (n // kg)
        for c in range(3):
            want = map_coordinates(x[i, :, :, c], [sy[k], sx[k]],
                                   order=1, mode="mirror")
            np.testing.assert_allclose(out[i, :, :, c], want, atol=1e-4)
