"""Framework utilities: checkpoint I/O, event-file writing, profiling."""

from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
    AsyncPytreeCheckpointer,
    load_checkpoint,
    save_checkpoint,
)

__all__ = ["save_checkpoint", "load_checkpoint", "AsyncPytreeCheckpointer"]
