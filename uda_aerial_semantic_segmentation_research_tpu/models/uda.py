"""Feature-level UDA components: gradient reversal, feature discriminator,
single-pass UDA segmentation model, combined UDA loss.

Counterparts of the reference's alternative UDA stack
(reference src/models/uda.py):

- ``gradient_reverse_layer``       (:99-112)  identity forward, -alpha * grad
  backward -- here a ``jax.custom_vjp`` instead of a torch autograd.Function.
- ``FeatureDomainDiscriminator``   (:8-28)    conv stack over bottleneck
  encoder features -> (B, 1) logits.
- ``UDASegmentationModel``         (:30-78)   encoder-split forward that can
  return (segmentation, domain logits) in ONE pass through the GRL -- the
  jit-friendly fast path for adversarial training (no two-optimizer
  alternation, no recompile churn).
- ``UDALoss``                      (:80-97)   dice + lambda * BCE-with-logits.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn

from uda_aerial_semantic_segmentation_research_tpu.ops.lane_bn import (
    LaneBN,
)
import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.models.resnet import encoder_out_channels
from uda_aerial_semantic_segmentation_research_tpu.models.unet import Unet
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
    SMPDiceLoss,
    sigmoid_bce_with_logits,
)


# ---------------------------------------------------------------------------
# gradient reversal layer
# ---------------------------------------------------------------------------
@jax.custom_vjp
def gradient_reverse_layer(x, alpha=1.0):
    """Identity on the forward pass; scales the cotangent by -alpha on the
    backward pass (reference src/models/uda.py:103-112).

    ``alpha`` is a regular (possibly traced) argument with a zero
    cotangent -- schedules can feed it as a device scalar without
    retriggering compilation.
    """
    return x


def _grl_fwd(x, alpha):
    return x, jnp.asarray(alpha, jnp.float32)


def _grl_bwd(alpha, g):
    return (jax.tree.map(lambda t: (-alpha * t).astype(t.dtype), g),
            jnp.zeros_like(alpha))


gradient_reverse_layer.defvjp(_grl_fwd, _grl_bwd)


# ---------------------------------------------------------------------------
# feature-level discriminator
# ---------------------------------------------------------------------------
class FeatureDomainDiscriminator(nn.Module):
    """Conv stack over bottleneck features: C->512->256->128->1 + GAP."""

    num_channels: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = True):
        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        y = x.astype(self.dtype)
        y = nn.relu(norm(name="norm1")(conv(512, name="conv1")(y)))
        y = nn.relu(norm(name="norm2")(conv(256, name="conv2")(y)))
        y = nn.relu(norm(name="norm3")(conv(128, name="conv3")(y)))
        y = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv4")(y)
        logits = jnp.mean(y, axis=(1, 2)).astype(jnp.float32)   # (B, 1)
        if return_logits:
            return logits
        return jax.nn.sigmoid(logits)


# ---------------------------------------------------------------------------
# single-pass UDA model (GRL variant)
# ---------------------------------------------------------------------------
class UDASegmentationModel(nn.Module):
    """U-Net whose bottleneck feeds a feature-level domain head through a GRL.

    ``__call__(x, domain_adaptation=True, alpha=a)`` returns
    ``(seg_logits, domain_logits)`` from one traversal: the segmentation
    loss and the (reversed-gradient) domain loss backprop in a single
    fused step -- the TPU-native escape hatch from the reference's
    two-optimizer alternating scheme (SURVEY.md section 7, hard parts).
    """

    encoder_name: str = "resnet50"
    classes: int = 23
    in_channels: int = 3
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.net = Unet(encoder_name=self.encoder_name, classes=self.classes,
                        in_channels=self.in_channels, dtype=self.dtype)
        bottleneck = encoder_out_channels(self.encoder_name)[-1]
        self.domain_discriminator = FeatureDomainDiscriminator(
            num_channels=bottleneck, dtype=self.dtype)

    def __call__(self, x, train: bool = False, domain_adaptation: bool = False,
                 alpha: float = 1.0, domain_only: bool = False):
        """``domain_only=True`` skips the decoder: encoder -> GRL ->
        domain head, returning ``(None, domain_logits)``.  For the
        phase-2 target pass this is GRADIENT-EXACT (the target's seg
        output is discarded by the loss, so no cotangent ever flows
        through the decoder); the only divergence is that decoder
        BatchNorm EMAs no longer see target batches (the reference's
        train-mode forward updates them, trainer_phases.py:139 --
        documented in PARITY.md).  It removes a full decoder forward at
        feature map resolutions up to HxW, the GRL step's single
        largest avoidable cost.
        """
        features = self.net.encode(x, train=train)
        seg = None if domain_only else self.net.decode(features, train=train)
        if not domain_adaptation:
            return seg
        reversed_feat = gradient_reverse_layer(features[-1], alpha)
        domain_logits = self.domain_discriminator(reversed_feat, train=train)
        return seg, domain_logits

    def get_encoder_features(self, x, train: bool = False):
        return self.net.encode(x, train=train)[-1]


# ---------------------------------------------------------------------------
# combined loss
# ---------------------------------------------------------------------------
class UDALoss:
    """dice(seg, target) + lambda_adv * BCE(domain_logits, domain_target).

    The dice component is ``SMPDiceLoss`` -- the reference's ``UDALoss``
    trains with ``smp.losses.DiceLoss(mode='multiclass')`` (reference
    src/models/uda.py:84), whose per-class batch+space aggregation and
    smooth=0/eps clamp differ from the reference's own ``DiceLoss``
    class (see ops/losses.SMPDiceLoss).
    """

    def __init__(self, lambda_adv: float = 0.001):
        self.segmentation_loss = SMPDiceLoss()
        self.lambda_adv = float(lambda_adv)

    def __call__(self, pred, target, domain_pred=None, domain_target=None):
        seg_loss = self.segmentation_loss(pred, target)
        if domain_pred is not None and domain_target is not None:
            return seg_loss + self.lambda_adv * sigmoid_bce_with_logits(
                domain_pred, domain_target)
        return seg_loss
