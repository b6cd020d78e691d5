"""Metric tests: confusion matrix / IoU / accuracy / F1 vs sklearn goldens,
plus the domain-adaptation streaming accumulators.

Reference surfaces: src/analysis/metrics.py (histogram metrics) and
src/models/metrics.py (DomainAdaptationMetrics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.ops.metrics import (

    DomainAdaptationMetrics,
    SegmentationMetrics,
    accuracy_from_hist,
    confusion_matrix,
    iou_from_hist,
)

# no jitted-model compiles here: part of the <3-min smoke tier
pytestmark = pytest.mark.smoke

RNG = np.random.default_rng(7)
C = 5


def test_confusion_matrix_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    pred = RNG.integers(0, C, 1000)
    true = RNG.integers(0, C, 1000)
    ours = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(true), C))
    ref = sk.confusion_matrix(true, pred, labels=range(C))
    np.testing.assert_array_equal(ours, ref)


def test_confusion_matrix_ignore_index():
    pred = np.array([0, 1, 2, 0])
    true = np.array([0, 1, 2, 3])
    hist = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(true), C,
                                       ignore_index=3))
    assert hist.sum() == 3  # the ignored pixel is dropped
    assert hist[0, 0] == 1 and hist[1, 1] == 1 and hist[2, 2] == 1


def test_iou_and_accuracy_perfect():
    labels = RNG.integers(0, C, (4, 16, 16))
    hist = confusion_matrix(jnp.asarray(labels), jnp.asarray(labels), C)
    per_class, miou = iou_from_hist(hist)
    assert abs(float(miou) - 1.0) < 1e-5
    assert abs(float(accuracy_from_hist(hist)) - 1.0) < 1e-6


def test_iou_known_value():
    # 2 classes: pred half right on class 1
    true = np.array([0, 0, 1, 1])
    pred = np.array([0, 0, 1, 0])
    hist = confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 2)
    per_class, _ = iou_from_hist(hist)
    per_class = np.asarray(per_class)
    # class 0: inter 2, union 3 -> 2/3 ; class 1: inter 1, union 2 -> 1/2
    assert abs(per_class[0] - 2 / 3) < 1e-4
    assert abs(per_class[1] - 1 / 2) < 1e-4


def test_segmentation_metrics_f1_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    pred = RNG.integers(0, C, 500)
    true = RNG.integers(0, C, 500)
    m = SegmentationMetrics(num_classes=C)
    ours = np.asarray(m.f1_score(pred, true))
    ref = sk.f1_score(true, pred, labels=range(C), average=None)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_segmentation_metrics_pixel_accuracy():
    m = SegmentationMetrics(num_classes=C)
    pred = np.array([[0, 1], [2, 3]])
    true = np.array([[0, 1], [2, 0]])
    assert abs(m.pixel_accuracy(pred, true) - 0.75) < 1e-4


def test_domain_metrics_accumulators():
    """Thresholds per reference src/models/metrics.py:27-35: source correct
    when p >= 0.5, target correct when p < 0.5."""
    dm = DomainAdaptationMetrics()
    dm.update(source_pred=np.array([0.9, 0.6, 0.4]),
              target_pred=np.array([0.1, 0.7]))
    got = dm.get_metrics()
    assert abs(got["source_domain_acc"] - 2 / 3) < 1e-6
    assert abs(got["target_domain_acc"] - 1 / 2) < 1e-6
    assert 0 <= got["domain_confusion"] <= np.log(2) + 1e-6


def test_domain_metrics_confusion_max_at_half():
    dm = DomainAdaptationMetrics()
    dm.update(source_pred=np.full(4, 0.5), target_pred=np.full(4, 0.5))
    # binary entropy of 0.5 = ln 2
    assert abs(dm.get_metrics()["domain_confusion"] - np.log(2)) < 1e-4


def test_domain_metrics_feature_alignment():
    dm = DomainAdaptationMetrics()
    f = RNG.normal(size=(4, 16)).astype(np.float32)
    dm.update(source_pred=np.full(4, 0.5), target_pred=np.full(4, 0.5),
              source_features=f, target_features=f)
    got = dm.get_confusion_metrics()
    assert abs(got["feature_alignment"] - 1.0) < 1e-5
    assert "domain_entropy" in got


def test_confusion_matrix_exact_beyond_f32_precision():
    """A 2^25-pixel single-class batch must count exactly: 33,554,432
    exceeds 2^24, where a pure-f32 accumulation rounds (ADVICE round 1).
    Matches numpy bincount semantics exactly."""
    import jax.numpy as jnp

    from uda_aerial_semantic_segmentation_research_tpu.ops.metrics import (
        confusion_matrix,
    )

    n = 1 << 25
    pred = jnp.zeros((n,), jnp.int32)
    true = jnp.zeros((n,), jnp.int32)
    hist = np.asarray(confusion_matrix(pred, true, 2))
    assert hist.dtype == np.int32
    assert hist[0, 0] == n          # exact, not 2^24-rounded
    assert hist.sum() == n

    # non-chunk-aligned size with mixed classes still matches bincount
    rng = np.random.default_rng(0)
    m = (1 << 23) + 12345
    p = rng.integers(0, 3, m).astype(np.int32)
    t = rng.integers(0, 3, m).astype(np.int32)
    hist2 = np.asarray(confusion_matrix(jnp.asarray(p), jnp.asarray(t), 3))
    expected = np.zeros((3, 3), np.int64)
    np.add.at(expected, (t, p), 1)
    np.testing.assert_array_equal(hist2, expected)


def test_hist_int8_path_matches_chunked():
    """The opt-in s8 MXU histogram (UDA_TPU_INT8_HIST) must equal the
    bf16-chunked default, including above 2^24 where f32 accumulation
    would round (int32 accumulator via preferred_element_type)."""
    import jax.numpy as jnp

    from uda_aerial_semantic_segmentation_research_tpu.ops import metrics as M

    n = (1 << 25) + 777          # beyond f32 integer exactness, unaligned
    pred = jnp.zeros((n,), jnp.int32)
    true = jnp.zeros((n,), jnp.int32)
    hist = np.asarray(M._hist_int8(true, pred, 2))
    assert hist.dtype == np.int32
    assert hist[0, 0] == n and hist.sum() == n

    rng = np.random.default_rng(1)
    m = 100_003
    p = jnp.asarray(rng.integers(0, 5, m).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 5, m).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(M._hist_int8(t, p, 5)),
                                  np.asarray(M._hist_chunk(t, p, 5)))
