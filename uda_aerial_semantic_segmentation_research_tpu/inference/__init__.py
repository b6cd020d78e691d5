"""Inference: single-image / batch prediction and the batch-prediction CLI."""

from uda_aerial_semantic_segmentation_research_tpu.inference.predict import (
    create_colored_mask,
    create_overlay,
    load_class_dict,
    predict_batch,
    predict_mask,
    predict_raster,
    test_model,
)

__all__ = [
    "predict_mask", "predict_batch", "predict_raster", "test_model", "create_colored_mask",
    "create_overlay", "load_class_dict",
]
