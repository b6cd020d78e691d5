from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
    DroneDataset,
    Subset,
    WeightedRandomSampler,
    random_split,
)
from uda_aerial_semantic_segmentation_research_tpu.data.target_dataset import TargetDataset
from uda_aerial_semantic_segmentation_research_tpu.data.loader import DataLoader

__all__ = [
    "DroneDataset",
    "TargetDataset",
    "DataLoader",
    "Subset",
    "WeightedRandomSampler",
    "random_split",
]
