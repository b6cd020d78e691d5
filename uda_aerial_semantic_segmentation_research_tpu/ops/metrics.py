"""Evaluation metrics.

Two reference surfaces merged into one TPU-friendly module:

- ``DomainAdaptationMetrics`` -- streaming accumulators for domain-
  adaptation health (reference src/models/metrics.py:5-74).
- ``SegmentationMetrics`` -- bincount-confusion-matrix IoU / pixel accuracy
  / F1 (reference src/analysis/metrics.py:5-68).

The confusion matrix is computed ON DEVICE inside jit
(``confusion_matrix``) and is an exact ``psum`` candidate under the data
mesh: per-replica histograms add elementwise, so cross-chip eval reduces
with one collective (SURVEY.md section 5.8).

Divergence from the reference, documented: the reference's
``DomainAdaptationMetrics.get_metrics`` returns STRING-formatted values
(reference src/models/metrics.py:61-63).  We return floats (the strings
were a bug magnet; every reference call site only checks key presence or
prints).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# device-side primitives
# ---------------------------------------------------------------------------
# largest pixel count whose one-hot contraction is integer-exact in the
# f32 MXU accumulator: partial sums are monotone integers <= 2^23 < 2^24
_EXACT_CHUNK = 1 << 23

# int8 x int8 -> int32 one-hot contraction: exact to 2^31 per cell (no
# chunking) and HALF the one-hot HBM bytes of the bf16 path.  Opt-in
# until verified on the target backend: a backend that silently upcasts
# the s8 dot to f32 would break exactness above 2^24, so the TPU default
# stays bf16-chunked unless the runtime self-check in tests/test_metrics
# (or bench) has blessed the generation.  Toggle: UDA_TPU_INT8_HIST=1.
import os as _os

_INT8_HIST = _os.environ.get("UDA_TPU_INT8_HIST", "0") == "1"


def _hist_chunk(true, pred, num_classes: int):
    """Exact (C, C) histogram of one <=2^23-pixel chunk via MXU matmul."""
    a = jax.nn.one_hot(true, num_classes,
                       dtype=jnp.bfloat16)          # invalid rows -> all-zero
    b = jax.nn.one_hot(pred, num_classes, dtype=jnp.bfloat16)
    hist = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return hist.astype(jnp.int32)


def _hist_int8(true, pred, num_classes: int):
    """Exact (C, C) histogram of the WHOLE input via an s8 MXU matmul."""
    a = jax.nn.one_hot(true, num_classes, dtype=jnp.int8)
    b = jax.nn.one_hot(pred, num_classes, dtype=jnp.int8)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred, true, num_classes: int, ignore_index: Optional[int] = None):
    """(num_classes, num_classes) histogram; rows=true, cols=pred (int32).

    Same semantics as the reference's ``_fast_hist``
    (src/analysis/metrics.py:17-27), computed as a one-hot matmul
    ``onehot(true)^T @ onehot(pred)`` instead of a bincount: the
    scatter-add behind bincount serializes on TPU, while the (C, N) x
    (N, C) contraction rides the MXU.  Elementwise-additive across
    replicas, so distributed eval reduces with one ``psum``.

    Counts are EXACT at any batch size: inputs above 2^23 pixels are
    chunked so no f32 partial sum can exceed 2^24 (where float32 loses
    integer exactness), and chunk histograms accumulate in int32.  At
    the headline bench shape (B=128 @ 512px = 33.5M pixels) a dominant-
    class cell overflows the single-matmul path's exactness.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    true = true.reshape(-1).astype(jnp.int32)
    mask = (true >= 0) & (true < num_classes)
    if ignore_index is not None:
        mask = mask & (true != ignore_index)
    true = jnp.where(mask, true, num_classes)       # one_hot zeroes the row

    if _INT8_HIST:
        return _hist_int8(true, pred, num_classes)

    n = true.shape[0]
    if n <= _EXACT_CHUNK:
        return _hist_chunk(true, pred, num_classes)

    pad = (-n) % _EXACT_CHUNK
    # padded tail: true=num_classes gives an all-zero one-hot row
    true = jnp.pad(true, (0, pad), constant_values=num_classes)
    pred = jnp.pad(pred, (0, pad))
    true = true.reshape(-1, _EXACT_CHUNK)
    pred = pred.reshape(-1, _EXACT_CHUNK)

    def body(acc, xs):
        t, p = xs
        return acc + _hist_chunk(t, p, num_classes), None

    hist, _ = jax.lax.scan(
        body, jnp.zeros((num_classes, num_classes), jnp.int32), (true, pred))
    return hist


def iou_from_hist(hist):
    """Per-class IoU + nanmean mIoU from a confusion matrix (float32)."""
    hist = hist.astype(jnp.float32)
    tp = jnp.diagonal(hist)
    denom = hist.sum(axis=1) + hist.sum(axis=0) - tp + 1e-7
    iou = tp / denom
    present = (hist.sum(axis=1) + hist.sum(axis=0)) > 0
    mean_iou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(
        jnp.sum(present.astype(jnp.float32)), 1.0)
    return iou, mean_iou


def accuracy_from_hist(hist):
    hist = hist.astype(jnp.float32)
    return jnp.sum(jnp.diagonal(hist)) / jnp.maximum(jnp.sum(hist), 1e-7)


def binary_entropy(probs):
    """Elementwise binary entropy of probabilities (natural log)."""
    p = jnp.clip(probs.astype(jnp.float32), 0.0, 1.0)
    return -p * jnp.log(p + 1e-10) - (1.0 - p) * jnp.log(1.0 - p + 1e-10)


# ---------------------------------------------------------------------------
# domain adaptation accumulator (reference src/models/metrics.py)
# ---------------------------------------------------------------------------
class DomainAdaptationMetrics:
    """Streaming accumulators over discriminator outputs.

    ``update*`` accepts probabilities in [0, 1] (shape (B, 1) or (B,)).
    Thresholds match the reference: source correct when p >= 0.5, target
    correct when p < 0.5; domain confusion = mean binary entropy.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.source_correct = 0
        self.source_total = 0
        self.target_correct = 0
        self.target_total = 0
        self.domain_entropy_sum = 0.0
        self.feature_alignment_sum = 0.0
        self.n_batches = 0

    def update(self, source_pred, target_pred, source_features=None,
               target_features=None):
        self.update_domain_accuracy(source_pred, target_pred)
        both = jnp.concatenate([jnp.ravel(jnp.asarray(source_pred)),
                                jnp.ravel(jnp.asarray(target_pred))])
        self.update_confusion_metrics(source_features, target_features, both)

    def update_domain_accuracy(self, source_pred, target_pred):
        from uda_aerial_semantic_segmentation_research_tpu.parallel.distributed import (
            host_array,
        )

        sp = host_array(source_pred).reshape(-1)
        tp = host_array(target_pred).reshape(-1)
        self.source_correct += int((sp >= 0.5).sum())
        self.source_total += sp.size
        self.target_correct += int((tp < 0.5).sum())
        self.target_total += tp.size

    def update_confusion_metrics(self, source_features, target_features,
                                 domain_predictions):
        from uda_aerial_semantic_segmentation_research_tpu.parallel.distributed import (
            host_array,
        )

        probs = host_array(domain_predictions).reshape(-1)
        probs = np.clip(probs, 0.0, 1.0)
        ent = -probs * np.log(probs + 1e-10) - (1 - probs) * np.log(1 - probs + 1e-10)
        self.domain_entropy_sum += float(ent.mean())

        if source_features is not None and target_features is not None:
            sf = host_array(source_features)
            tf = host_array(target_features)
            s = sf.mean(axis=0).reshape(-1)
            t = tf.mean(axis=0).reshape(-1)
            s = s / max(np.linalg.norm(s), 1e-12)
            t = t / max(np.linalg.norm(t), 1e-12)
            self.feature_alignment_sum += float(np.dot(s, t))
        self.n_batches += 1

    def get_metrics(self) -> Dict[str, float]:
        return {
            "source_domain_acc": self.source_correct / max(self.source_total, 1),
            "target_domain_acc": self.target_correct / max(self.target_total, 1),
            "domain_confusion": self.domain_entropy_sum / max(self.n_batches, 1),
        }

    def get_confusion_metrics(self) -> Dict[str, float]:
        return {
            "domain_entropy": self.domain_entropy_sum / max(self.n_batches, 1),
            "feature_alignment": self.feature_alignment_sum / max(self.n_batches, 1),
        }


# ---------------------------------------------------------------------------
# segmentation metrics (reference src/analysis/metrics.py)
# ---------------------------------------------------------------------------
class SegmentationMetrics:
    """Histogram-based IoU / pixel accuracy / F1 with optional ignore_index."""

    def __init__(self, num_classes: int, ignore_index: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def _hist(self, predictions, targets):
        return confusion_matrix(jnp.asarray(predictions), jnp.asarray(targets),
                                self.num_classes, self.ignore_index)

    def batch_iou(self, predictions, targets) -> dict:
        hist = np.asarray(jax.device_get(self._hist(predictions, targets)),
                          dtype=np.float64)
        tp = np.diag(hist)
        denom = hist.sum(axis=1) + hist.sum(axis=0) - tp + 1e-7
        iu = tp / denom
        present = (hist.sum(axis=1) + hist.sum(axis=0)) > 0
        iu_masked = np.where(present, iu, np.nan)
        mean_iou = float(np.nanmean(iu_masked)) if present.any() else 0.0
        return {"mean_iou": mean_iou,
                "class_iou": {i: float(v) for i, v in enumerate(iu)}}

    def pixel_accuracy(self, predictions, targets) -> float:
        p = np.asarray(jax.device_get(predictions))
        t = np.asarray(jax.device_get(targets))
        mask = (t != self.ignore_index) if self.ignore_index is not None \
            else np.ones_like(t, dtype=bool)
        correct = float(((p == t) & mask).sum())
        total = float(mask.sum())
        return correct / (total + 1e-7)

    def f1_score(self, predictions, targets, class_index: Optional[int] = None):
        hist = np.asarray(jax.device_get(self._hist(predictions, targets)),
                          dtype=np.float64)
        tp = np.diag(hist)
        fp = hist.sum(axis=0) - tp
        fn = hist.sum(axis=1) - tp
        f1 = 2 * tp / (2 * tp + fp + fn + 1e-7)
        if class_index is not None:
            return float(f1[class_index])
        return f1.tolist()
