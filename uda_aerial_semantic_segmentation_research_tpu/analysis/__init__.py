"""Standalone evaluation metrics (reference src/analysis/)."""

from uda_aerial_semantic_segmentation_research_tpu.analysis.metrics import (
    SegmentationMetrics,
)

__all__ = ["SegmentationMetrics"]
