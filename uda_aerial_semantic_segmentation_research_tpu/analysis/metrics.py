"""Histogram-based segmentation evaluation metrics.

Mirror of the reference's analysis layer (reference
src/analysis/metrics.py:5-68).  The implementation lives in
``ops.metrics`` (shared with the trainers, where the confusion-matrix
histogram is computed on device and reduces across chips with one
``psum``); this module preserves the reference's import path
``<pkg>.analysis.metrics.SegmentationMetrics``.
"""

from uda_aerial_semantic_segmentation_research_tpu.ops.metrics import (
    SegmentationMetrics,
    accuracy_from_hist,
    confusion_matrix,
    iou_from_hist,
)

__all__ = [
    "SegmentationMetrics",
    "confusion_matrix",
    "iou_from_hist",
    "accuracy_from_hist",
]
