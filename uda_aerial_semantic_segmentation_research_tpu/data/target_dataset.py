"""Unlabeled target-domain (Holyrood) dataset.

Counterpart of the reference ``TargetDataset``
(reference src/data/target_dataset.py:7-55): sorted image listing,
cv2 decode, BGR->RGB, INTER_AREA resize to ``target_size``, optional
transform, returns image only.  Arrays are numpy NHWC.
"""

from __future__ import annotations

import os
from typing import Tuple

import cv2
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.data.dataset import IMG_EXTS


class TargetDataset:
    """Dataset of target-domain images (no labels)."""

    def __init__(
        self,
        images_dir: str,
        transform=None,
        target_size: Tuple[int, int] = (256, 256),
        verbose: bool = True,
    ):
        self.images_dir = images_dir
        self.transform = transform
        self.target_size = target_size

        self.images = sorted(
            f for f in os.listdir(images_dir) if f.endswith(IMG_EXTS)
        )

        if verbose:
            print(f"Found {len(self.images)} target domain images")
            if self.images:
                print(f"First target image: {self.images[0]}")

    def __len__(self):
        return len(self.images)

    def load_raw(self, idx: int) -> np.ndarray:
        """Decode one image -> uint8 (H, W, 3) RGB resized to target_size.

        JPEGs go through the native C++ loader (DCT-scaled decode,
        native/loader.cpp) -- multi-megapixel DJI photos decode at a
        fraction of the full-resolution cost; cv2 is the fallback.
        """
        path = os.path.join(self.images_dir, self.images[idx])
        if self.target_size and path.lower().endswith((".jpg", ".jpeg")):
            from uda_aerial_semantic_segmentation_research_tpu.data import native

            w, h = self.target_size
            out = native.decode_jpeg_rgb(path, h, w)
            if out is not None:
                return out
        image = cv2.imread(path)
        if image is None:
            raise ValueError(f"Failed to load image: {path}")
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        if self.target_size:
            image = cv2.resize(image, self.target_size, interpolation=cv2.INTER_AREA)
        return image

    def __getitem__(self, idx: int):
        image = self.load_raw(idx)
        if self.transform is not None:
            image = self.transform(image=image)["image"]
        return image
