"""Loss-function unit tests with PyTorch-parity golden values.

The reference never unit-tested its losses (SURVEY.md section 4); here
every loss is checked against the equivalent torch (CPU) computation
with the reference's exact conventions (src/models/losses.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (

    AdversarialLoss,
    ConsistencyLoss,
    DiceLoss,
    FineTuningLoss,
    SMPDiceLoss,
    WeightedSegmentationLoss,
    calculate_class_weights,
    sigmoid_bce_with_logits,
    softmax_cross_entropy,
)

# no jitted-model compiles here: part of the <3-min smoke tier
pytestmark = pytest.mark.smoke

torch = pytest.importorskip("torch")
F = torch.nn.functional

RNG = np.random.default_rng(42)
B, H, W, C = 2, 8, 8, 5


def _logits():
    return RNG.normal(size=(B, H, W, C)).astype(np.float32)


def _labels():
    return RNG.integers(0, C, (B, H, W)).astype(np.int64)


def test_bce_with_logits_matches_torch():
    x = RNG.normal(size=(4, 1)).astype(np.float32)
    y = RNG.integers(0, 2, (4, 1)).astype(np.float32)
    ours = float(sigmoid_bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    ref = float(F.binary_cross_entropy_with_logits(torch.tensor(x),
                                                   torch.tensor(y)))
    assert abs(ours - ref) < 1e-6


def test_cross_entropy_matches_torch():
    x, y = _logits(), _labels()
    ours = float(softmax_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    # torch CE is NCHW
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    ref = float(F.cross_entropy(xt, torch.tensor(y)))
    assert abs(ours - ref) < 1e-5


def test_weighted_cross_entropy_matches_torch():
    x, y = _logits(), _labels()
    w = RNG.uniform(0.5, 2.0, C).astype(np.float32)
    ours = float(softmax_cross_entropy(jnp.asarray(x), jnp.asarray(y), w))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    ref = float(F.cross_entropy(xt, torch.tensor(y), weight=torch.tensor(w)))
    assert abs(ours - ref) < 1e-5


def test_dice_loss_range_and_value():
    """Reference semantics (losses.py:110-152): softmax, one-hot, smooth=1,
    1 - mean dice, batched over (B, C)."""
    x, y = _logits(), _labels()
    loss = float(DiceLoss()(jnp.asarray(x), jnp.asarray(y)))
    assert 0.0 <= loss <= 1.0

    # golden: manual torch computation of the same formula
    xt = torch.tensor(x)
    probs = torch.softmax(xt, dim=-1)
    onehot = F.one_hot(torch.tensor(y), C).float()
    inter = (probs * onehot).sum(dim=(1, 2))
    union = probs.sum(dim=(1, 2)) + onehot.sum(dim=(1, 2))
    dice = (2 * inter + 1.0) / (union + 1.0)
    ref = float(1.0 - dice.mean())
    assert abs(loss - ref) < 1e-5


def test_smp_dice_loss_matches_smp_formula():
    """``SMPDiceLoss`` == smp.losses.DiceLoss(mode='multiclass') (the GRL
    alt stack's seg criterion, reference uda.py:84): per-class batch+space
    aggregation, smooth=0 with eps=1e-7 denominator clamp, absent classes
    zeroed, mean over all C.  Golden: independent torch reimplementation
    of the smp algorithm (smp itself is not installed here)."""
    x, y = _logits(), _labels()
    ours = float(SMPDiceLoss()(jnp.asarray(x), jnp.asarray(y)))

    xt = torch.tensor(x).permute(0, 3, 1, 2)             # smp is NCHW
    yt = torch.tensor(y)
    n, c = xt.shape[0], xt.shape[1]
    pred = xt.log_softmax(dim=1).exp().view(n, c, -1)    # (N, C, HW)
    true = F.one_hot(yt.view(n, -1), c).permute(0, 2, 1).float()
    dims = (0, 2)
    inter = torch.sum(pred * true, dim=dims)
    card = torch.sum(pred + true, dim=dims)
    score = (2.0 * inter) / card.clamp_min(1e-7)
    loss = (1.0 - score) * (true.sum(dim=dims) > 0).float()
    ref = float(loss.mean())
    assert abs(ours - ref) < 1e-6


def test_smp_dice_absent_classes_zeroed_but_counted():
    """Classes missing from the target contribute 0 loss yet stay in the
    mean's denominator (smp zeroes via the y_true.sum mask)."""
    y = np.zeros((B, H, W), np.int64)
    y[:, :, : W // 2] = 1                                # only classes 0, 1
    x = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    full = float(SMPDiceLoss()(jnp.asarray(x), jnp.asarray(y)))

    # manual: per-class losses for 0 and 1 only, averaged over ALL C
    probs = jax.nn.softmax(jnp.asarray(x), axis=-1)
    onehot = jax.nn.one_hot(jnp.asarray(y), C)
    inter = jnp.sum(probs * onehot, axis=(0, 1, 2))
    card = jnp.sum(probs + onehot, axis=(0, 1, 2))
    score = 2.0 * inter / jnp.maximum(card, 1e-7)
    expected = float((2.0 - score[0] - score[1]) / C)
    assert abs(full - expected) < 1e-6


def test_smp_dice_perfect_prediction_near_zero():
    y = _labels()
    x = np.where(np.eye(C, dtype=bool)[y], 20.0, -20.0).astype(np.float32)
    loss = float(SMPDiceLoss()(jnp.asarray(x), jnp.asarray(y)))
    assert loss < 1e-4


def test_dice_perfect_prediction_near_zero():
    y = _labels()
    x = np.full((B, H, W, C), -20.0, np.float32)
    np.put_along_axis(x, y[..., None], 20.0, axis=-1)
    loss = float(DiceLoss()(jnp.asarray(x), jnp.asarray(y)))
    assert loss < 0.05


def test_consistency_loss_matches_torch_kl():
    """Reference: symmetric temperature-scaled KL with batchmean reduction
    (losses.py:53-108)."""
    T = 0.5
    p1 = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    p2 = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    ours = float(ConsistencyLoss(temperature=T)(jnp.asarray(p1), jnp.asarray(p2)))

    t1, t2 = torch.tensor(p1) / T, torch.tensor(p2) / T
    kl1 = F.kl_div(F.log_softmax(t1, dim=-1), F.softmax(t2, dim=-1),
                   reduction="batchmean")
    kl2 = F.kl_div(F.log_softmax(t2, dim=-1), F.softmax(t1, dim=-1),
                   reduction="batchmean")
    ref = float((kl1 + kl2) / 2)
    assert abs(ours - ref) < 1e-4


def test_consistency_identical_inputs_zero():
    p = jnp.asarray(RNG.normal(size=(B, H, W, C)).astype(np.float32))
    assert abs(float(ConsistencyLoss()(p, p))) < 1e-6


def test_adversarial_loss_conventions():
    """source=1 / target=0 labels; generator pushes target to 1
    (losses.py:18-51)."""
    adv = AdversarialLoss(lambda_adv=0.001)
    big = jnp.full((4, 1), 10.0)
    small = jnp.full((4, 1), -10.0)
    # perfect discriminator: src logits high, tgt logits low -> ~0 loss
    assert float(adv.discriminator_loss(big, small)) < 1e-3
    # inverted -> large loss
    assert float(adv.discriminator_loss(small, big)) > 5.0
    # generator: tgt classified as source (logit high) -> ~0
    assert float(adv.generator_loss(big)) < 1e-4
    g = float(adv.generator_loss(small))
    ref = 0.001 * float(F.binary_cross_entropy_with_logits(
        torch.full((4, 1), -10.0), torch.ones(4, 1)))
    assert abs(g - ref) < 1e-6


def test_focal_weighted_loss_nonnegative_scalar():
    x, y = _logits(), _labels()
    w = calculate_class_weights_fixture()
    loss = WeightedSegmentationLoss(num_classes=C, class_weights=w)(
        jnp.asarray(x), jnp.asarray(y))
    assert loss.shape == ()
    assert float(loss) >= 0

    # domain_weight scales the whole loss (reference losses.py:189)
    half = WeightedSegmentationLoss(num_classes=C, class_weights=w)(
        jnp.asarray(x), jnp.asarray(y), domain_weight=0.5)
    assert abs(float(half) - 0.5 * float(loss)) < 1e-6


def calculate_class_weights_fixture():
    class FakeDS:
        class_stats = {i: (i + 1) * 100 for i in range(C)}

    return calculate_class_weights(FakeDS(), C)


def test_class_weights_effective_samples():
    """weights = (1-beta)/(1-beta^n), normalized to sum to C
    (reference losses.py:217-254)."""
    w = calculate_class_weights_fixture()
    assert w.shape == (C,)
    assert abs(float(w.sum()) - C) < 1e-4
    # rarer classes get larger weights
    assert w[0] > w[-1]

    beta = 0.9999
    counts = np.array([(i + 1) * 100 for i in range(C)], np.float64)
    expected = (1 - beta) / (1 - np.power(beta, counts))
    expected = expected / expected.sum() * C
    np.testing.assert_allclose(w, expected, rtol=1e-5)


def test_class_weights_inverse_frequency():
    class FakeDS:
        class_stats = {0: 100, 1: 200, 2: 400, 3: 100, 4: 100}

    w = calculate_class_weights(FakeDS(), C, method="inverse_freq")
    assert abs(w[0] / w[2] - 4.0) < 1e-5


def test_finetuning_rampup_schedule():
    """rampup: 0 at epoch 0, linear, 1 at >= rampup_length
    (reference losses.py:279-285; asserted by reference
    test_system.py:566-569)."""
    ft = FineTuningLoss(rampup_length=40)
    assert float(ft.rampup(0)) == 0.0
    assert abs(float(ft.rampup(20)) - 0.5) < 1e-6
    assert float(ft.rampup(40)) == 1.0
    assert float(ft.rampup(60)) == 1.0


def test_finetuning_loss_components():
    p1 = jnp.asarray(RNG.random((B, H, W, C), dtype=np.float32))
    p2 = jnp.asarray(RNG.random((B, H, W, C), dtype=np.float32))
    d = jnp.asarray(RNG.normal(size=(B, 1)).astype(np.float32))

    losses = FineTuningLoss(rampup_length=40)(p1, p2, d, 0)
    for key in ("total", "consistency", "domain_confusion", "supervised",
                "rampup_weight"):
        assert key in losses
    # at epoch 0 rampup is 0 -> total is 0 without supervised term
    assert float(losses["total"]) == 0.0

    sup_pred = jnp.asarray(RNG.random((B, H, W, C), dtype=np.float32))
    sup_tgt = jnp.asarray(RNG.integers(0, C, (B, H, W)))
    with_sup = FineTuningLoss(rampup_length=40)(
        p1, p2, d, 40, supervised_pred=sup_pred, supervised_target=sup_tgt)
    assert float(with_sup["supervised"]) > 0
    assert float(with_sup["total"]) > 0
