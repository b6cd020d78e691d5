"""Inference-layer tests (reference src/models/predict.py surface)."""

import numpy as np
import pytest

from tests.conftest import BATCH, CLASSES, SIZE

RNG = np.random.default_rng(11)


def test_predict_mask_paths(workspace, seg_bundle):
    """Raw uint8, [0,1] float, normalized float and CHW inputs all work;
    output follows the reference's sigmoid>0.5 contract (predict.py:70-111)."""
    from uda_aerial_semantic_segmentation_research_tpu.inference.predict import (
        predict_mask,
    )

    raw = RNG.integers(0, 255, (SIZE, SIZE, 3)).astype(np.uint8)
    out = predict_mask(seg_bundle, raw)
    assert out.shape == (SIZE, SIZE, CLASSES)
    assert set(np.unique(out)).issubset({0.0, 1.0})

    batched = predict_mask(seg_bundle, raw[None])
    assert batched.shape == (SIZE, SIZE, CLASSES)

    chw = np.transpose(raw.astype(np.float32) / 255.0, (2, 0, 1))
    out_chw = predict_mask(seg_bundle, chw)
    assert out_chw.shape == (SIZE, SIZE, CLASSES)


def test_predict_batch_argmax(workspace, seg_bundle):
    from uda_aerial_semantic_segmentation_research_tpu.inference.predict import (
        predict_batch,
    )

    imgs = RNG.integers(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.uint8)
    preds = predict_batch(seg_bundle, imgs)
    assert preds.shape == (BATCH, SIZE, SIZE)
    assert preds.min() >= 0 and preds.max() < CLASSES


def test_create_colored_mask_and_overlay(workspace):
    import pandas as pd

    from uda_aerial_semantic_segmentation_research_tpu.inference.predict import (
        create_colored_mask,
        create_overlay,
    )

    df = pd.DataFrame({"name": [f"c{i}" for i in range(CLASSES)],
                       "r": range(CLASSES), "g": range(CLASSES),
                       "b": range(CLASSES)})
    pred = RNG.integers(0, CLASSES, (SIZE, SIZE))
    colored = create_colored_mask(pred, df)
    assert colored.shape == (SIZE, SIZE, 3) and colored.dtype == np.uint8
    # class i colored (i, i, i)
    ys, xs = np.nonzero(pred == 2)
    if len(ys):
        assert tuple(colored[ys[0], xs[0]]) == (2, 2, 2)

    img = RNG.integers(0, 255, (SIZE, SIZE, 3)).astype(np.uint8)
    overlay = create_overlay(img, pred > 0, alpha=0.5)
    assert overlay.shape == (SIZE, SIZE, 3) and overlay.dtype == np.uint8


def test_test_model_cli(workspace, seg_bundle, tmp_path):
    """Batch-prediction CLI writes predictions/overlays/colored_masks +
    stats report (reference predict.py:132-280, fixed)."""
    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.inference.predict import (
        test_model,
    )
    from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
        save_checkpoint,
    )

    ckpt = tmp_path / "m.pth"
    save_checkpoint({"model_state_dict": seg_bundle.state_dict()}, ckpt)

    out_dir = tmp_path / "out"
    n = test_model(str(ckpt), Config.TARGET_DATA_DIR, str(out_dir),
                   model=seg_bundle, max_images=2)
    assert n == 2
    assert len(list((out_dir / "predictions").glob("*.png"))) == 2
    assert len(list((out_dir / "overlays").glob("*.png"))) == 2
    stats = (out_dir / "prediction_stats.txt").read_text()
    assert "Prediction statistics" in stats


def test_predict_raster_tiled(workspace, seg_bundle):
    """Tiled full-raster inference: static-shape tile batches, overlap
    stitching, output matches the raster size."""
    from uda_aerial_semantic_segmentation_research_tpu.inference.predict import (
        predict_batch,
        predict_raster,
    )

    raster = RNG.integers(0, 255, (70, 90, 3)).astype(np.uint8)
    out = predict_raster(seg_bundle, raster, tile=SIZE, overlap=8, batch_size=4)
    assert out.shape == (70, 90)
    assert out.dtype == np.int32
    assert out.min() >= 0 and out.max() < CLASSES

    # a raster exactly one tile big must agree with direct prediction
    small = RNG.integers(0, 255, (SIZE, SIZE, 3)).astype(np.uint8)
    direct = predict_batch(seg_bundle, small[None])[0]
    tiled = predict_raster(seg_bundle, small, tile=SIZE, overlap=0)
    np.testing.assert_array_equal(tiled, direct)
