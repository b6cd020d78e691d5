from uda_aerial_semantic_segmentation_research_tpu.ops import augment, losses, metrics

__all__ = ["augment", "losses", "metrics"]
