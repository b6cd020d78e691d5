"""Training-step and trainer-machinery tests.

Covers the jitted step factories (training/steps.py), EarlyStopping's
exact reference semantics (reference src/models/train.py:79-195), and
loss descent on a fixed batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import BATCH, CLASSES, SIZE
from uda_aerial_semantic_segmentation_research_tpu.ops.augment import NONE
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    AdversarialState,
    TrainState,
    adam,
)
from uda_aerial_semantic_segmentation_research_tpu.training.train import EarlyStopping


# ---------------------------------------------------------------------------
# EarlyStopping (pure host logic)
# ---------------------------------------------------------------------------
def test_early_stopping_max_mode_patience():
    es = EarlyStopping(patience=2, mode="max", min_epochs=0,
                       metrics_to_track=["iou"], weights={"iou": 1.0})
    assert not es(1, {"iou": 0.5})
    assert not es(2, {"iou": 0.6})   # improved
    assert not es(3, {"iou": 0.55})  # counter 1
    assert es(4, {"iou": 0.55})      # counter 2 -> stop
    assert es.early_stop
    assert es.get_best_metrics() == {"iou": 0.6}


def test_early_stopping_min_epochs_guard():
    es = EarlyStopping(patience=1, mode="max", min_epochs=10,
                       weights={"iou": 1.0})
    for e in range(1, 10):
        assert not es(e, {"iou": 0.5 - 0.01 * e}), "must not stop before min_epochs"


def test_early_stopping_weighted_score():
    es = EarlyStopping(mode="max", min_epochs=0,
                       metrics_to_track=["loss", "iou", "accuracy"],
                       weights={"loss": -1.0, "iou": 1.0, "accuracy": 0.5})
    score = es._calculate_score({"loss": 0.4, "iou": 0.6, "accuracy": 0.8})
    assert abs(score - (-0.4 + 0.6 + 0.4)) < 1e-9


def test_early_stopping_improvement_rate():
    es = EarlyStopping(min_epochs=0, metrics_to_track=["loss"],
                       weights={"loss": 1.0}, mode="min")
    es(1, {"loss": 1.0})
    es(2, {"loss": 0.5})
    rates = es.get_improvement_rate()
    assert abs(rates["loss"] - (-0.25)) < 1e-9


def test_early_stopping_logs_contract():
    """Must log early_stopping/score + counter every call (the harness
    asserts these tags exist, reference src/test_system.py:237-242)."""
    calls = []

    class FakeLogger:
        def log_scalar(self, tag, value, step):
            calls.append(tag)

    es = EarlyStopping(min_epochs=100, weights={"loss": 1.0})
    es(1, {"loss": 0.5}, FakeLogger())
    assert "early_stopping/score" in calls
    assert "early_stopping/counter" in calls


# ---------------------------------------------------------------------------
# jitted steps (shared compiled fns; NONE aug for compile speed)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def sup_step(seg_bundle):
    return step_lib.make_supervised_train_step(seg_bundle.module, CLASSES,
                                               aug_cfg=NONE)


def test_supervised_step_decreases_loss(seg_bundle, batch, sup_step):
    images, masks = batch
    state = TrainState.from_bundle(seg_bundle, adam(1e-3))
    key = jax.random.key(0)
    state, m0 = sup_step(state, key, images, masks)
    first = float(m0["loss"])
    for _ in range(12):
        state, m = sup_step(state, key, images, masks)
    last = float(m["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 13
    assert 0.0 <= float(m["iou"]) <= 1.0
    assert m["hist"].shape == (CLASSES, CLASSES)


def test_eval_step_metrics(seg_bundle, batch):
    images, masks = batch
    eval_step = step_lib.make_eval_step(seg_bundle.module, CLASSES)
    m = eval_step(seg_bundle.params, seg_bundle.batch_stats, images, masks)
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["accuracy"]) <= 1.0
    assert int(np.asarray(m["hist"]).sum()) == BATCH * SIZE * SIZE


def test_adversarial_step(seg_bundle, disc_bundle, batch):
    images, masks = batch
    step = step_lib.make_adversarial_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, lambda_adv=0.001,
        aug_cfg=NONE)
    state = AdversarialState(
        seg=TrainState.from_bundle(seg_bundle, adam(1e-3)),
        disc=TrainState.from_bundle(disc_bundle, adam(1e-3)))
    state, m = step(state, jax.random.key(0), images, masks, images)
    for k in ("loss", "seg_loss", "adv_loss", "d_loss"):
        assert np.isfinite(float(m[k])), k
    assert m["source_domain_prob"].shape == (BATCH, 1)
    p = np.asarray(m["source_domain_prob"])
    assert np.all((p >= 0) & (p <= 1))
    assert int(state.seg.step) == 1 and int(state.disc.step) == 1


def test_adversarial_sequential_matches_fused(seg_bundle, disc_bundle, batch):
    """make_adversarial_sequential_step == make_adversarial_train_step.

    Same key -> same in-program augment draws, so the 3-program
    decomposition must reproduce the fused step's D and G updates,
    metrics, and BN stats to cross-program float reassociation.  SGD(1.0)
    makes the post-step param delta the gradient itself (see the
    unsupervised equivalence test above for the rationale).
    """
    import optax

    images, masks = batch
    kw = dict(lambda_adv=0.001, aug_cfg=NOISE_ONLY)
    fused = step_lib.make_adversarial_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, **kw)
    seq = step_lib.make_adversarial_sequential_step(
        seg_bundle.module, disc_bundle.module, CLASSES, **kw)

    def mk():
        return AdversarialState(
            seg=TrainState.from_bundle(seg_bundle, optax.sgd(1.0)),
            disc=TrainState.from_bundle(disc_bundle, optax.sgd(1.0)))

    key = jax.random.key(7)
    sa, ma = fused(mk(), key, images, masks, images[::-1])
    sb, mb = seq(mk(), key, images, masks, images[::-1])
    for k in ("loss", "seg_loss", "adv_loss", "d_loss", "iou", "accuracy"):
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    for k in ("source_domain_prob", "target_domain_prob"):
        np.testing.assert_allclose(np.asarray(ma[k]), np.asarray(mb[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    assert int(sb.seg.step) == int(sb.disc.step) == 1
    for attr in ("params", "batch_stats"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3,
                                                    atol=5e-5),
            jax.device_get(getattr(sa.seg, attr)),
            jax.device_get(getattr(sb.seg, attr)))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3,
                                                    atol=5e-5),
            jax.device_get(getattr(sa.disc, attr)),
            jax.device_get(getattr(sb.disc, attr)))


def test_unsupervised_step_and_rampup(seg_bundle, disc_bundle, batch):
    from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
        FineTuningLoss,
    )

    images, _ = batch
    ft = FineTuningLoss(rampup_length=40)
    step = step_lib.make_unsupervised_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, ft, aug_cfg=NONE)
    tx = adam(1e-3, clip_norm=1.0)
    params = jax.tree.map(jnp.array, {"seg": seg_bundle.params,
                                      "disc": disc_bundle.params})
    stats = jax.tree.map(jnp.array, {"seg": seg_bundle.batch_stats,
                                     "disc": disc_bundle.batch_stats})
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params), tx=tx)

    state, m = step(state, jax.random.key(0), images, jnp.float32(0))
    assert float(m["rampup_weight"]) == 0.0
    # epoch is a traced arg: changing it must NOT trigger a retrace crash
    state, m = step(state, jax.random.key(1), images, jnp.float32(20))
    assert abs(float(m["rampup_weight"]) - 0.5) < 1e-6
    assert np.isfinite(float(m["total"]))
    assert bool(m["finite"])


def _unsup_state(seg_bundle, disc_bundle, tx=None):
    tx = tx or adam(1e-3, clip_norm=1.0)
    params = jax.tree.map(jnp.array, {"seg": seg_bundle.params,
                                      "disc": disc_bundle.params})
    stats = jax.tree.map(jnp.array, {"seg": seg_bundle.batch_stats,
                                     "disc": disc_bundle.batch_stats})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=stats, opt_state=tx.init(params), tx=tx)


# Gaussian noise only: the cheapest config whose two key splits yield
# genuinely DIFFERENT views, so the consistency KL has a real gradient.
# (Under NONE the views are identical, the true consistency gradient is
# exactly zero, and any optimizer that normalizes by gradient magnitude
# would amplify float-noise-level implementation differences to full
# lr-sized updates -- which is also why these tests drive plain SGD:
# after N SGD steps the param delta IS the summed gradient, making this
# a direct gradient-equivalence assertion.)
NOISE_ONLY = __import__("dataclasses").replace(NONE, p_noise=1.0)


@pytest.mark.parametrize("with_supervised", [False, True])
def test_unsupervised_sequential_matches_joint(seg_bundle, disc_bundle, batch,
                                               with_supervised):
    """make_unsupervised_sequential_step == make_unsupervised_train_step.

    Gradient equivalence, asserted directly: one SGD(1.0) step from
    identical states makes the parameter delta equal the gradient, so
    comparing post-step params compares the joint gradient against the
    decomposition's sum of partials element-by-element.  (A multi-step
    trajectory comparison is NOT meaningful at tight tolerance: the
    temperature-scaled KL's curvature amplifies benign float
    reassociation differences between the two compiled programs by
    ~1e3 per update.)  Loss components, batch stats, and the metric
    dict contract are asserted in the same step.
    """
    import optax

    from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
        FineTuningLoss,
    )

    images, masks = batch
    ft = FineTuningLoss(rampup_length=40)
    kw = dict(aug_cfg=NOISE_ONLY, with_supervised=with_supervised)
    joint = step_lib.make_unsupervised_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, ft, **kw)
    seq = step_lib.make_unsupervised_sequential_step(
        seg_bundle.module, disc_bundle.module, CLASSES, ft, **kw)

    sup = (images, masks) if with_supervised else ()
    tx = optax.sgd(1.0)
    sa = _unsup_state(seg_bundle, disc_bundle, tx)
    sb = _unsup_state(seg_bundle, disc_bundle, tx)
    key = jax.random.key(5)
    epoch = jnp.float32(20)
    sa, ma = joint(sa, key, images, epoch, *sup)
    sb, mb = seq(sb, key, images, epoch, *sup)
    for k in ("total", "consistency", "domain_confusion", "supervised",
              "rampup_weight"):
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    assert float(ma["consistency"]) > 0, "views must differ"
    assert bool(ma["finite"]) and bool(mb["finite"])
    np.testing.assert_allclose(np.asarray(ma["domain_prob"]),
                               np.asarray(mb["domain_prob"]),
                               rtol=1e-4, atol=1e-6)

    assert int(sa.step) == int(sb.step) == 1
    # params moved by exactly -gradient; observed cross-program
    # reassociation noise is <1e-5 absolute (f32 model)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5),
        jax.device_get(sa.params), jax.device_get(sb.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5),
        jax.device_get(sa.batch_stats), jax.device_get(sb.batch_stats))


def test_unsupervised_sequential_bf16_carry(seg_bundle, disc_bundle, batch):
    """carry_dtype=bfloat16 (the HBM-saving mode) stays close to joint."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
        FineTuningLoss,
    )

    images, _ = batch
    ft = FineTuningLoss(rampup_length=40)
    joint = step_lib.make_unsupervised_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, ft,
        aug_cfg=NOISE_ONLY)
    seq = step_lib.make_unsupervised_sequential_step(
        seg_bundle.module, disc_bundle.module, CLASSES, ft,
        aug_cfg=NOISE_ONLY, carry_dtype=jnp.bfloat16)
    sa, sb = _unsup_state(seg_bundle, disc_bundle), _unsup_state(seg_bundle,
                                                                 disc_bundle)
    key = jax.random.key(3)
    sa, ma = joint(sa, key, images, jnp.float32(20))
    sb, mb = seq(sb, key, images, jnp.float32(20))
    assert bool(mb["finite"])
    np.testing.assert_allclose(float(ma["total"]), float(mb["total"]),
                               rtol=2e-2, atol=2e-3)


def test_predict_step(seg_bundle, batch):
    images, _ = batch
    pred = step_lib.make_predict_step(seg_bundle.module)
    logits = pred(seg_bundle.params, seg_bundle.batch_stats, images)
    assert logits.shape == (BATCH, SIZE, SIZE, CLASSES)


def test_scan_driver_matches_sequential(seg_bundle, batch, sup_step):
    """make_scan_driver: S scanned steps == S sequential step calls."""
    images, masks = batch
    key = jax.random.key(7)
    s = 3
    state_a = TrainState.from_bundle(seg_bundle, adam(1e-3))
    for _ in range(s):
        state_a, ma = sup_step(state_a, key, images, masks)

    multi = step_lib.make_scan_driver(sup_step)
    state_b = TrainState.from_bundle(seg_bundle, adam(1e-3))
    imgs_s = jnp.broadcast_to(jnp.asarray(images), (s,) + images.shape)
    msks_s = jnp.broadcast_to(jnp.asarray(masks), (s,) + masks.shape)
    state_b, mb = multi(state_b, key, imgs_s, msks_s)

    assert mb["loss"].shape == (s,)
    assert int(state_b.step) == s
    # scan inlining changes fusion boundaries, so bit-exactness is not
    # expected -- assert the trajectories track closely instead
    np.testing.assert_allclose(float(mb["loss"][-1]), float(ma["loss"]),
                               rtol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-3),
        jax.device_get(state_a.params), jax.device_get(state_b.params))


def test_grl_domain_only_gradient_exact():
    """Skipping the target pass's decoder (``target_decoder_stats=False``,
    the production default) must leave the parameter update bit-for-bit
    intact: the target seg output is discarded by the GRL loss, so no
    gradient ever flows through the decoder on that traversal.  Only
    decoder BatchNorm EMAs may differ (they no longer see target
    batches -- the documented divergence, PARITY.md)."""
    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_uda_model,
    )

    bundle = create_uda_model(encoder_name="resnet18", classes=CLASSES,
                              image_size=SIZE, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    src = rng.integers(0, 255, (2, SIZE, SIZE, 3)).astype(np.uint8)
    masks = rng.integers(0, CLASSES, (2, SIZE, SIZE)).astype(np.int32)
    tgt = rng.integers(0, 255, (2, SIZE, SIZE, 3)).astype(np.uint8)
    key = jax.random.key(5)

    results = {}
    for stats_mode in (False, True):
        step = step_lib.make_grl_train_step(
            bundle.module, CLASSES, lambda_domain=0.001, aug_cfg=NONE,
            target_decoder_stats=stats_mode)
        state = TrainState.from_bundle(bundle, adam(1e-3))
        results[stats_mode] = step(state, key, src, masks, tgt,
                                   jnp.float32(1.0))

    (fast_state, fast_m), (ref_state, ref_m) = results[False], results[True]
    np.testing.assert_allclose(float(fast_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(fast_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # stats pytree structure must be preserved so later steps don't
    # retrace/restructure; decoder EMAs differ by design
    assert (jax.tree.structure(fast_state.batch_stats)
            == jax.tree.structure(ref_state.batch_stats))
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(fast_state.batch_stats),
                             jax.tree.leaves(ref_state.batch_stats))]
    assert max(diffs) > 0.0  # the divergence is real, and only in stats


def test_grl_sequential_matches_fused():
    """The 3-program GRL decomposition computes the fused step's exact
    update (the loss is additive across the two traversals; BN stat
    chaining src -> tgt preserved)."""
    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_uda_model,
    )

    bundle = create_uda_model(encoder_name="resnet18", classes=CLASSES,
                              image_size=SIZE, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    src = rng.integers(0, 255, (2, SIZE, SIZE, 3)).astype(np.uint8)
    masks = rng.integers(0, CLASSES, (2, SIZE, SIZE)).astype(np.int32)
    tgt = rng.integers(0, 255, (2, SIZE, SIZE, 3)).astype(np.uint8)
    key = jax.random.key(9)
    kw = dict(lambda_domain=0.001, aug_cfg=NONE)

    fused = step_lib.make_grl_train_step(bundle.module, CLASSES, **kw)
    seq = step_lib.make_grl_sequential_step(bundle.module, CLASSES, **kw)

    s1 = TrainState.from_bundle(bundle, adam(1e-3))
    s2 = TrainState.from_bundle(bundle, adam(1e-3))
    s1, m1 = fused(s1, key, src, masks, tgt, jnp.float32(1.0))
    s2, m2 = seq(s2, key, src, masks, tgt, jnp.float32(1.0))

    for name in ("loss", "seg_loss", "domain_loss", "domain_acc", "iou"):
        np.testing.assert_allclose(float(m1[name]), float(m2[name]),
                                   rtol=1e-5, atol=1e-7, err_msg=name)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
