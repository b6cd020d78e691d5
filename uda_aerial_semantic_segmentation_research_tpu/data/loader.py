"""Host-side batch loader feeding device-resident training steps.

Replaces the reference's ``torch.utils.data.DataLoader`` usage
(reference src/test_system.py:59-71 etc.).  Design:

- Batches are stacked numpy arrays with STATIC shapes (``drop_last`` for
  training loops so every jitted step sees one shape -- avoiding the
  dynamic-shape recompiles the reference never had to think about).
- ``iter_raw()`` bypasses the dataset's per-item transform and yields raw
  uint8 NHWC batches: the hot path, where normalization + augmentation run
  batched on the TPU inside the jitted train step.
- A background prefetch thread overlaps image decode (cv2 releases the
  GIL) with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.data.dataset import Subset


def _unwrap_raw(dataset, idx: int):
    """Fetch the *untransformed* sample, unwrapping Subset views."""
    while isinstance(dataset, Subset):
        idx = dataset.indices[idx]
        dataset = dataset.dataset
    if hasattr(dataset, "load_raw"):
        return dataset.load_raw(idx)
    return dataset[idx]


def _stack(samples):
    """Stack a list of samples (arrays or tuples of arrays) into batch arrays."""
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(np.stack([s[i] for s in samples]) for i in range(len(first)))
    return np.stack(samples)


class DataLoader:
    """Minimal batching iterator over a dataset.

    Args:
        dataset: anything with ``__len__``/``__getitem__`` (DroneDataset,
            TargetDataset, Subset).
        batch_size: samples per batch.
        shuffle: reshuffle order each epoch (ignored when ``sampler`` given).
        sampler: optional index sampler (e.g. ``WeightedRandomSampler``).
        drop_last: drop the trailing partial batch (keeps shapes static).
        num_workers: >0 enables background prefetching of ``num_workers + 1``
            batches (thread-based; decode releases the GIL).
        seed: shuffle seed.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler=None,
        drop_last: bool = False,
        num_workers: int = 0,
        pin_memory: bool = False,  # accepted for API parity; no-op on TPU host
        seed: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.sampler = sampler
        self.drop_last = drop_last
        self.num_workers = int(num_workers)
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    # ------------------------------------------------------------------
    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = self._rng.permutation(idx)
        return idx.tolist()

    def _batched_indices(self):
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if chunk:
                yield chunk

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # ------------------------------------------------------------------
    def _iter_batches(self, fetch) -> Iterator:
        self._epoch += 1
        batches = self._batched_indices()
        if self.num_workers <= 0:
            for chunk in batches:
                yield _stack([fetch(self.dataset, i) for i in chunk])
            return

        q: queue.Queue = queue.Queue(maxsize=self.num_workers + 1)
        _SENTINEL = object()
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer is gone --
            otherwise an abandoned iterator (e.g. a cycling target loader
            dropped at epoch end) leaks the producer thread blocked on
            q.put() plus the batches it holds."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for chunk in batches:
                    if not _put(_stack([fetch(self.dataset, i) for i in chunk])):
                        return
                _put(_SENTINEL)
            except BaseException as e:  # surface decode errors to the consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on normal exhaustion AND GeneratorExit (abandonment)
            stop.set()

    def __iter__(self):
        """Yield batches with the dataset's transform applied (parity path)."""
        return self._iter_batches(lambda ds, i: ds[i])

    def iter_raw(self):
        """Yield raw uint8 batches, transform bypassed (device-augment hot path)."""
        return self._iter_batches(_unwrap_raw)


def prefetch_to_device(iterator, size: int = 2, cast_masks_uint8: bool = True,
                       put=None):
    """Overlap H2D transfers with device compute (flax-style prefetch).

    Wraps a host-batch iterator, issuing ``jax.device_put`` ``size``
    batches ahead -- JAX transfers are async, so the copy of batch N+1
    rides under the compute of batch N.  Mask arrays are shipped as
    uint8 when their values fit (4x fewer bytes over the host link; the
    jitted steps cast to int32 on device).

    ``put`` overrides the placement: a callable ``item -> placed item``
    (e.g. a trainer's mesh-sharding ``_place``); the default is plain
    ``jax.device_put`` with the uint8 mask narrowing.  This generator is
    the ONE prefetch implementation -- trainers reach it through
    ``training.train._raw_batches(place=...)``.
    """
    import collections

    import jax
    import numpy as np

    # the uint8-fits decision is made once per tuple position on the
    # first batch (label ranges are fixed by the dataset), then every
    # narrowed batch is range-ASSERTED: the min/max host pass (~ms) is
    # noise next to the 4x H2D byte saving, and a later batch smuggling
    # an out-of-range label (e.g. a negative ignore index absent from
    # batch 0) must fail loudly instead of wrapping into a valid label
    narrow: dict = {}

    def ship(item):
        def put(pos, a):
            a = np.asarray(a)
            if cast_masks_uint8 and a.dtype in (np.int32, np.int64):
                in_range = bool(a.size and a.min() >= 0 and a.max() < 256)
                if pos not in narrow:
                    narrow[pos] = in_range
                if narrow[pos]:
                    if not in_range:
                        raise ValueError(
                            "mask batch has values outside [0, 256) after "
                            "uint8 narrowing was enabled from the first "
                            "batch; pass cast_masks_uint8=False or fix the "
                            "dataset's label range")
                    a = a.astype(np.uint8)
            return jax.device_put(a)

        if isinstance(item, tuple):
            return tuple(put(i, a) for i, a in enumerate(item))
        return put(0, item)

    ship = put or ship
    queue = collections.deque()
    it = iter(iterator)
    try:
        while True:
            while len(queue) < size:
                queue.append(ship(next(it)))
            yield queue.popleft()
    except StopIteration:
        while queue:
            yield queue.popleft()
