"""Raster tiling tests (the spatial scaling analogue, SURVEY.md section 5.7)."""

import numpy as np
import pytest

from uda_aerial_semantic_segmentation_research_tpu.data.tiling import (

    TiledRasterDataset,
    stitch_tiles,
    tile_grid,
    tile_image,
)

# no jitted-model compiles here: part of the <3-min smoke tier
pytestmark = pytest.mark.smoke


def test_tile_grid_covers_exactly():
    origins = tile_grid(512, 512, 256)
    assert origins == [(0, 0), (0, 256), (256, 0), (256, 256)]
    # non-divisible: last row/col snap inward
    origins = tile_grid(600, 500, 256)
    ys = {y for y, _ in origins}
    xs = {x for _, x in origins}
    assert max(ys) + 256 == 600 and max(xs) + 256 == 500
    # full coverage
    cov = np.zeros((600, 500), bool)
    for y, x in origins:
        cov[y:y + 256, x:x + 256] = True
    assert cov.all()


def test_tile_grid_overlap():
    origins = tile_grid(512, 512, 256, overlap=128)
    assert (128, 128) in origins
    with pytest.raises(ValueError):
        tile_grid(512, 512, 256, overlap=256)


def test_tile_and_stitch_roundtrip_labels():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 23, (300, 400)).astype(np.int32)
    tiles, origins, hw = tile_image(img, 128)
    assert tiles.shape[1:] == (128, 128)
    back = stitch_tiles(tiles, origins, hw)
    np.testing.assert_array_equal(back[:300, :400], img)


def test_tile_and_stitch_roundtrip_float_overlap():
    rng = np.random.default_rng(1)
    img = rng.random((300, 400, 5), dtype=np.float32)
    tiles, origins, hw = tile_image(img, 128, overlap=32)
    back = stitch_tiles(tiles, origins, hw, reduce="mean")
    np.testing.assert_allclose(back[:300, :400], img, atol=1e-6)


def test_small_image_padded():
    img = np.ones((50, 60, 3), np.uint8)
    tiles, origins, hw = tile_image(img, 128)
    assert tiles.shape == (1, 128, 128, 3)
    assert hw == (128, 128)


def test_tiled_raster_dataset(workspace):
    import os

    from uda_aerial_semantic_segmentation_research_tpu.config import Config

    ds = TiledRasterDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        tile=16, overlap=0, verbose=False)
    # 6 images of 32x32 -> 4 tiles each
    assert len(ds) == 24
    t = ds.load_raw(0)
    assert t.shape == (16, 16, 3) and t.dtype == np.uint8
    assert np.asarray(ds[5]).shape == (16, 16, 3)
