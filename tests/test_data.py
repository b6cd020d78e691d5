"""Data-layer tests: fixtures, datasets, samplers, loaders.

Reference surfaces: src/data/{dataset,target_dataset}.py and the
missing setup_test_data module (SURVEY.md section 2).
"""

import numpy as np
import pytest

from tests.conftest import BATCH, CLASSES, SIZE

# no jitted-model compiles here: part of the <3-min smoke tier
pytestmark = pytest.mark.smoke



@pytest.fixture(scope="module")
def datasets(workspace):
    import os

    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
    )
    from uda_aerial_semantic_segmentation_research_tpu.data.target_dataset import (
        TargetDataset,
    )

    src = DroneDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        masks_dir=os.path.join(Config.SAMPLE_DATA_DIR, "label_images_semantic"),
        verbose=False)
    tgt = TargetDataset(images_dir=Config.TARGET_DATA_DIR, verbose=False,
                        target_size=(SIZE, SIZE))
    return src, tgt


def test_setup_test_data_idempotent(workspace):
    import os

    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.data.setup_test_data import (
        setup_test_data,
    )

    imgs = os.path.join(Config.SAMPLE_DATA_DIR, "original_images")
    before = sorted(os.listdir(imgs))
    setup_test_data(num_source=6, num_holyrood=4, image_size=SIZE)  # no force
    assert sorted(os.listdir(imgs)) == before
    assert os.path.exists(os.path.join(Config.DATA_DIR, "class_dict_seg.csv"))


def test_drone_dataset_stats_and_weights(datasets):
    src, _ = datasets
    assert len(src) == 6
    assert hasattr(src, "class_stats") and src.class_stats
    assert len(src.sample_weights) == len(src)
    assert np.isclose(src.sample_weights.sum(), 1.0)
    img, mask = src.load_raw(0)
    assert img.dtype == np.uint8 and img.shape == (SIZE, SIZE, 3)
    assert mask.dtype == np.int32 and mask.shape == (SIZE, SIZE)
    assert mask.min() >= 0 and mask.max() < CLASSES or mask.max() < 23


def test_weighted_sampler_subset(datasets):
    src, _ = datasets
    sampler = src.get_sampler(indices=[0, 2, 4])
    idx = list(iter(sampler))
    assert len(idx) == 3
    assert all(0 <= i < 3 for i in idx)  # positions into the subset


def test_random_split_disjoint(datasets):
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        random_split,
    )

    src, _ = datasets
    a, b = random_split(src, [4, 2], seed=0)
    assert len(a) == 4 and len(b) == 2
    assert set(a.indices).isdisjoint(b.indices)
    # deterministic under the same seed
    a2, b2 = random_split(src, [4, 2], seed=0)
    assert a.indices == a2.indices


def test_loader_shapes_and_drop_last(datasets):
    from uda_aerial_semantic_segmentation_research_tpu.data.loader import (
        DataLoader,
    )

    src, _ = datasets
    loader = DataLoader(src, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader.iter_raw())
    assert len(batches) == 1  # 6 // 4 with drop_last
    imgs, masks = batches[0]
    assert imgs.shape == (4, SIZE, SIZE, 3) and imgs.dtype == np.uint8
    assert masks.shape == (4, SIZE, SIZE)

    loader2 = DataLoader(src, batch_size=4, drop_last=False)
    assert len(loader2) == 2


def test_loader_prefetch_thread(datasets):
    from uda_aerial_semantic_segmentation_research_tpu.data.loader import (
        DataLoader,
    )

    src, _ = datasets
    loader = DataLoader(src, batch_size=2, num_workers=2)
    batches = list(loader.iter_raw())
    assert len(batches) == 3


def test_target_dataset(datasets):
    _, tgt = datasets
    assert len(tgt) == 4
    img = tgt.load_raw(0)
    assert img.shape == (SIZE, SIZE, 3) and img.dtype == np.uint8


def test_class_stats_cache(workspace, datasets):
    """Second construction must hit the JSON cache (single decode pass)."""
    import os

    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
    )

    masks_dir = os.path.join(Config.SAMPLE_DATA_DIR, "label_images_semantic")
    caches = [f for f in os.listdir(masks_dir) if f.startswith(".class_stats")]
    assert caches, "class-stats cache file missing"
    src2 = DroneDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        masks_dir=masks_dir, verbose=False)
    np.testing.assert_allclose(src2.sample_weights,
                               DroneDataset(
                                   images_dir=os.path.join(
                                       Config.SAMPLE_DATA_DIR, "original_images"),
                                   masks_dir=masks_dir, verbose=False
                               ).sample_weights)


def test_abandoned_prefetch_iterator_releases_thread(datasets):
    """Dropping a prefetching iterator mid-epoch (the cycling target
    loader pattern) must not leak the producer thread."""
    import gc
    import threading
    import time

    from uda_aerial_semantic_segmentation_research_tpu.data.loader import (
        DataLoader,
    )

    src, _ = datasets
    before = threading.active_count()
    for _ in range(5):
        it = DataLoader(src, batch_size=2, num_workers=2).iter_raw()
        next(it)
        del it
        gc.collect()
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_raw_cache_roundtrip(workspace):
    """enable_raw_cache serves identical pairs without re-decoding."""
    import os

    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
    )

    ds = DroneDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        masks_dir=os.path.join(Config.SAMPLE_DATA_DIR, "label_images_semantic"),
        balance_classes=False, image_size=32, verbose=False)
    assert ds.enable_raw_cache()
    i0, m0 = ds.load_raw(0)
    # poison the decoder: cached path must not call it again
    ds._decode_raw = lambda idx: (_ for _ in ()).throw(AssertionError("decoded twice"))
    i1, m1 = ds.load_raw(0)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(m0, m1)
