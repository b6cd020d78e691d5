"""Build the 8-image sample Holyrood (target-domain) fixture.

Counterpart of reference src/data/create_sample_holyrood.py:5-46: copies
8 images from the prepared target set into ``data/sample/holyrood``
(the reference hand-picks 8 named DJI_*.JPG photos, :18-27).  Falls back
to the synthetic generator when the prepared set is absent.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from uda_aerial_semantic_segmentation_research_tpu.config import Config

IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG")


def create_sample_holyrood(
        source_dir: str | None = None,
        sample_dir: str | None = None,
        num_samples: int = 8) -> int:
    source_dir = Path(source_dir or Config.TARGET_DATA_DIR)
    sample_dir = Path(sample_dir or Config.SAMPLE_HOLYROOD_DIR)
    sample_dir.mkdir(parents=True, exist_ok=True)

    existing = [f for f in sample_dir.iterdir() if f.suffix in IMG_EXTS]
    if len(existing) >= num_samples:
        print(f"Sample Holyrood set already exists ({len(existing)} images)")
        return len(existing)

    candidates = (sorted(f for f in source_dir.iterdir() if f.suffix in IMG_EXTS)
                  if source_dir.exists() else [])
    if not candidates:
        print(f"No prepared Holyrood images under {source_dir}; generating "
              "synthetic fixtures instead")
        from uda_aerial_semantic_segmentation_research_tpu.data.setup_test_data import (
            setup_test_data,
        )

        setup_test_data(num_holyrood=num_samples)
        return num_samples

    for f in candidates[:num_samples]:
        shutil.copy2(f, sample_dir / f.name)
    n = min(num_samples, len(candidates))
    print(f"Created sample Holyrood set with {n} images at {sample_dir}")
    return n


if __name__ == "__main__":
    create_sample_holyrood()
