"""Profiling and per-step timing utilities.

The reference has no tracing/profiling at all (SURVEY.md section 5.1 --
only tqdm bars).  TPU-native observability:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-profile traces (xplane) for the enclosed steps.
- ``StepTimer``: wall-clock per-step timing with device sync, tracking
  p50/p95 and steps/sec -- the numbers behind the tiles/sec/chip
  headline metric (BASELINE.md).
- ``annotate(name)``: named trace span (shows up on the TPU timeline).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "logs/profile"):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span on the device timeline (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with explicit device synchronization.

    Usage::

        timer = StepTimer(items_per_step=batch_size)
        for batch in loader:
            with timer.step(sync=metrics["loss"]):
                state, metrics = train_step(state, ...)
        print(timer.summary())
    """

    def __init__(self, items_per_step: int = 1, warmup: int = 2):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self.times: List[float] = []
        self._n_seen = 0

    @contextlib.contextmanager
    def step(self, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self._n_seen += 1
        if self._n_seen > self.warmup:
            self.times.append(dt)

    def record(self, seconds: float):
        self._n_seen += 1
        if self._n_seen > self.warmup:
            self.times.append(seconds)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p95": float(np.percentile(t, 95) * 1e3),
            "steps_per_sec": float(1.0 / t.mean()),
            "items_per_sec": float(self.items_per_step / t.mean()),
        }


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on JAX's persistent compilation cache.

    On this class of host (single CPU core, remote-compile tunnel) XLA
    compilation dominates cold-start time; the persistent cache makes
    every subsequent process reuse compiled executables.
    """
    import os

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "uda_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache support varies by backend/version
        print(f"compilation cache unavailable: {e}")
