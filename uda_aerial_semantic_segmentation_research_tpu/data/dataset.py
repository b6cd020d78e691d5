"""Source-domain (Semantic Drone) dataset with class-balanced sampling.

TPU-native counterpart of the reference ``DroneDataset``
(reference src/data/dataset.py:11-138).  Capabilities mirrored:

- paired image/mask loading (cv2, BGR->RGB, grayscale masks),
- one-time class-frequency statistics over all masks (``class_stats``),
- inverse-frequency per-sample weights summing to 1 (``sample_weights``),
- ``get_sampler(indices=...)`` -> weighted sampler with subset support,
- optional ``transform`` hook applied per item.

TPU-first design differences (deliberate, not omissions):

- Arrays are numpy NHWC (channels-last); there is no per-item CPU tensor
  conversion.  Samples are ``(image, mask)`` where image is either raw
  ``uint8 (H, W, 3)`` (transform=None) or normalized ``float32 (H, W, 3)``
  after the transform, and mask is ``int32 (H, W)``.
- The class-stats pass decodes each mask ONCE and caches the result to
  JSON next to the mask dir (the reference decodes every mask twice per
  construction, reference src/data/dataset.py:48-83).
- The hot training path does NOT use the per-item transform: trainers pull
  raw uint8 batches and run the augmentation batched on device inside the
  jitted train step (see ops/augment.py).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Dict, Optional, Sequence

import cv2
import numpy as np

IMG_EXTS = (".jpg", ".png", ".jpeg", ".JPG", ".PNG", ".JPEG")


class WeightedRandomSampler:
    """Sample indices ``0..len(weights)-1`` with replacement, p proportional to weights.

    Host-side analogue of torch's WeightedRandomSampler as used by the
    reference (src/data/dataset.py:107-111).  Yields *positions into the
    weight vector* so it composes with ``Subset`` exactly like the
    reference's sampler-over-Subset pattern (src/test_system.py:56-64).
    """

    def __init__(self, weights: np.ndarray, num_samples: int, replacement: bool = True,
                 seed: Optional[int] = None):
        weights = np.asarray(weights, dtype=np.float64)
        if weights.ndim != 1 or len(weights) == 0:
            raise ValueError("weights must be a non-empty 1-D array")
        self.probabilities = weights / weights.sum()
        self.num_samples = int(num_samples)
        self.replacement = replacement
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        idx = self._rng.choice(
            len(self.probabilities),
            size=self.num_samples,
            replace=self.replacement,
            p=self.probabilities,
        )
        return iter(idx.tolist())

    def __len__(self):
        return self.num_samples


class Subset:
    """View over a dataset restricted to ``indices`` (torch.utils.data.Subset analogue)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def random_split(dataset, lengths: Sequence[int], seed: int = 0):
    """Split a dataset into non-overlapping random subsets (torch random_split analogue)."""
    if sum(lengths) != len(dataset):
        raise ValueError(f"sum of lengths {sum(lengths)} != dataset size {len(dataset)}")
    perm = np.random.default_rng(seed).permutation(len(dataset))
    out, ofs = [], 0
    for n in lengths:
        out.append(Subset(dataset, perm[ofs:ofs + n].tolist()))
        ofs += n
    return out


class DroneDataset:
    """Paired aerial image / label-mask dataset with class balancing."""

    def __init__(
        self,
        images_dir: str,
        masks_dir: str,
        transform=None,
        balance_classes: bool = True,
        image_size: Optional[int] = None,
        verbose: bool = True,
    ):
        self.images_dir = images_dir
        self.masks_dir = masks_dir
        self.transform = transform
        self.balance_classes = balance_classes
        self.image_size = image_size

        self.images = sorted(f for f in os.listdir(images_dir) if f.endswith(IMG_EXTS))
        self.masks = sorted(f for f in os.listdir(masks_dir) if f.endswith(".png"))

        if verbose:
            print(f"Found {len(self.images)} images and {len(self.masks)} masks")
            if self.images:
                print(f"First image: {self.images[0]}")
                print(f"First mask: {self.masks[0]}")

        assert len(self.images) == len(self.masks), (
            f"Number of images ({len(self.images)}) != number of masks ({len(self.masks)})"
        )

        if balance_classes:
            if verbose:
                print("Calculating class statistics...")
            self.class_stats, self.sample_weights = self._scan_masks()

    # ------------------------------------------------------------------
    # class statistics (single decode pass, cached)
    # ------------------------------------------------------------------
    def _cache_path(self) -> Path:
        key = hashlib.sha1(
            ("|".join(self.masks) + self.masks_dir).encode()
        ).hexdigest()[:16]
        return Path(self.masks_dir) / f".class_stats_{key}.json"

    def _scan_masks(self):
        """One pass over all masks: global pixel counts per class AND per-sample
        inverse-frequency weights.

        Semantics match reference src/data/dataset.py:48-83: sample weight is
        sum over classes present of (fraction of pixels of that class in the
        sample) / (global frequency of that class); weights normalized to sum 1.
        """
        cache = self._cache_path()
        if cache.exists():
            try:
                blob = json.loads(cache.read_text())
                stats = {int(k): int(v) for k, v in blob["class_stats"].items()}
                weights = np.asarray(blob["sample_weights"], dtype=np.float64)
                if len(weights) == len(self.masks):
                    return stats, weights
            except (json.JSONDecodeError, KeyError, ValueError):
                pass

        per_sample: list[Dict[int, int]] = []
        totals: Dict[int, int] = {}
        sizes: list[int] = []
        for name in self.masks:
            mask = cv2.imread(os.path.join(self.masks_dir, name), cv2.IMREAD_GRAYSCALE)
            if mask is None:
                raise ValueError(f"Failed to load mask: {name}")
            uniq, counts = np.unique(mask, return_counts=True)
            d = {int(u): int(c) for u, c in zip(uniq, counts)}
            per_sample.append(d)
            sizes.append(mask.size)
            for k, v in d.items():
                totals[k] = totals.get(k, 0) + v

        total_pixels = sum(totals.values())
        weights = np.zeros(len(self.masks), dtype=np.float64)
        for i, d in enumerate(per_sample):
            w = 0.0
            for cls, count in d.items():
                class_freq = totals[cls] / total_pixels
                w += (count / sizes[i]) * (1.0 / class_freq)
            weights[i] = w
        weights = weights / weights.sum()

        try:
            cache.write_text(json.dumps({
                "class_stats": {str(k): v for k, v in totals.items()},
                "sample_weights": weights.tolist(),
            }))
        except OSError:
            pass
        return totals, weights

    # ------------------------------------------------------------------
    def get_sampler(self, indices: Optional[Sequence[int]] = None):
        """Weighted sampler for balanced sampling (reference src/data/dataset.py:85-111).

        When ``indices`` is given (Subset training split), only those samples'
        weights are used and yielded positions index into the subset.
        """
        if not self.balance_classes:
            return None
        w = self.sample_weights[list(indices)] if indices is not None else self.sample_weights
        w = w / w.sum()
        return WeightedRandomSampler(weights=w, num_samples=len(w), replacement=True)

    def __len__(self):
        return len(self.images)

    def load_raw(self, idx: int):
        """Decode one (image uint8 HWC RGB, mask int32 HW) pair, resized if configured.

        Hot path goes through the native C++ loader (DCT-scaled JPEG
        decode + resize directly into the output buffer,
        native/loader.cpp); cv2 is the fallback.  With ``cache_raw``
        (see ``enable_raw_cache``) decoded pairs are kept in RAM after
        first decode -- on a 1-core host the JPEG decode is ~50 ms/tile
        of pure CPU, the dominant cost of every epoch after the first.
        """
        cache = getattr(self, "_raw_cache", None)
        if cache is not None and idx in cache:
            return cache[idx]
        out = self._decode_raw(idx)
        if cache is not None:
            cache[idx] = out
        return out

    def enable_raw_cache(self, max_bytes: int = 4 << 30):
        """Cache decoded tiles in RAM (skipped if the dataset exceeds
        ``max_bytes``).  Returns True when enabled."""
        if self.image_size is None:
            return False
        per = self.image_size * self.image_size * (3 + 4)
        if per * len(self.images) > max_bytes:
            return False
        self._raw_cache = {}
        return True

    def _decode_raw(self, idx: int):
        img_path = os.path.join(self.images_dir, self.images[idx])
        mask_path = os.path.join(self.masks_dir, self.masks[idx])

        if self.image_size is not None:
            from uda_aerial_semantic_segmentation_research_tpu.data import native

            s = self.image_size
            image = (native.decode_jpeg_rgb(img_path, s, s)
                     if img_path.lower().endswith((".jpg", ".jpeg")) else None)
            mask = native.decode_png_mask(mask_path, s, s)
            if image is not None and mask is not None:
                return image, mask

        image = cv2.imread(img_path)
        if image is None:
            raise ValueError(f"Failed to load image: {self.images[idx]}")
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        if mask is None:
            raise ValueError(f"Failed to load mask: {self.masks[idx]}")
        if self.image_size is not None and image.shape[:2] != (self.image_size, self.image_size):
            s = (self.image_size, self.image_size)
            image = cv2.resize(image, s, interpolation=cv2.INTER_AREA)
            mask = cv2.resize(mask, s, interpolation=cv2.INTER_NEAREST)
        return image, mask.astype(np.int32)

    def __getitem__(self, idx: int):
        image, mask = self.load_raw(idx)
        if self.transform is not None:
            out = self.transform(image=image, mask=mask)
            image, mask = out["image"], out["mask"]
            mask = np.asarray(mask).astype(np.int32)
        return image, mask
