"""Observability: TensorBoard-compatible logging and prediction overlays."""

from uda_aerial_semantic_segmentation_research_tpu.visualization.tensorboard_logger import (
    TensorboardLogger,
)
from uda_aerial_semantic_segmentation_research_tpu.visualization import utils

__all__ = ["TensorboardLogger", "utils"]
