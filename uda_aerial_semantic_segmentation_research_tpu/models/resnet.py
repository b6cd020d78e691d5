"""ResNet encoders (NHWC, Flax) producing U-Net feature pyramids.

The reference delegates its encoder to segmentation_models_pytorch
(``smp.Unet(encoder_name=...)``, instantiated at reference
src/test_system.py:90-95).  Here the encoder is a native Flax module:

- NHWC layout, bf16 compute / fp32 params (MXU-friendly),
- BatchNorm whose batch statistics are GLOBAL under pjit data
  parallelism for free (jnp.mean over the sharded batch lowers to a
  cross-replica reduction),
- returns the 6-level feature pyramid smp-style:
  [identity, stem(/2), stage1(/4), stage2(/8), stage3(/16), stage4(/32)].

Channel signatures match the torchvision/smp encoders so a converted
ImageNet checkpoint drops in:
  resnet18/34: (3, 64, 64, 128, 256, 512)
  resnet50:    (3, 64, 256, 512, 1024, 2048)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn

from uda_aerial_semantic_segmentation_research_tpu.ops.lane_bn import (
    LaneBN,
)
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

ModuleDef = Any

# Rematerialization-policy boundary: every conv output in the encoders
# and decoder is tagged with this name, so ``remat="convs"`` (a
# jax.checkpoint ``save_only_these_names`` policy) SAVES the conv
# outputs and recomputes only the cheap elementwise chain between them
# (BatchNorm normalize, ReLU, residual adds) on backward.  Unlike
# per-block remat -- which recomputes the in-block CONVS, i.e. a second
# MXU pass over the whole half of the network -- this trades a little
# more saved HBM for a near-zero recompute bill.  checkpoint_name is an
# identity outside a policy-equipped jax.checkpoint, so the tag is free
# on every other path.
CONV_SAVE_NAME = "conv_out"

# Conv outputs LARGER than this (elements per image, H*W*C) are tagged
# "_hi" instead and stay rematerialized under conv_policy: at 512px
# input, saving the high-resolution stage-1 outputs (128^2 x 64 =
# 1.05M, ~270 MB each at B=128) pushed phase 3's grad programs 83 MB
# past HBM at COMPILE time, and including stage 2 (64^2 x 128 = 0.52M)
# still RAN out at execution (the cross-program live set -- carried
# views/logits + saved activations -- is what binds, r3s7).  384K
# saves stages 3-4 (32^2 x 256 / 16^2 x 512, ~1 GB total at B=128),
# which still skips ~55% of the encoder's recompute FLOPs.
CONV_SAVE_MAX_ELEMS = 384 * 1024


def tag_conv_out(y):
    """Tag a conv output as a remat save point (size-thresholded)."""
    elems = 1
    for d in y.shape[1:]:
        elems *= d
    name = CONV_SAVE_NAME if elems <= CONV_SAVE_MAX_ELEMS else (
        CONV_SAVE_NAME + "_hi")
    return checkpoint_name(y, name)


def conv_policy():
    """jax.checkpoint policy: save conv outputs, recompute elementwise."""
    import jax

    return jax.checkpoint_policies.save_only_these_names(CONV_SAVE_NAME)


def named_conv(*args, **kwargs):
    """``nn.Conv`` whose output is tagged as a remat save point.

    Construction happens in the caller's compact scope with the same
    order/name as a plain ``nn.Conv``, so the parameter tree (auto
    names ``Conv_0``... and explicit ``name=`` kwargs) is unchanged and
    checkpoints interchange with the untagged modules.
    """
    c = nn.Conv(*args, **kwargs)
    return lambda x: tag_conv_out(c(x))


def _remat_stage_set(remat):
    """Parse stage-granular remat specs: ``"stage1"`` remats only stage
    1's blocks, ``"stage12"`` stages 1 and 2, etc. (1-based, matching
    the ``stageN_blockM`` parameter names).  Returns None for every
    other remat mode.  Rationale: at 512px the stage-1 block activations
    are the 256 MB-per-tensor ones — rematerializing ONLY them frees
    ~1.5 GB at ~19% of the full-encoder recompute bill (BASELINE.md
    r3s8), which is what lets phase 3 drop encoder-wide remat."""
    if isinstance(remat, str) and remat.startswith("stage"):
        stages = {int(c) for c in remat[len("stage"):]}
        if not stages or not stages <= {1, 2, 3, 4}:
            raise ValueError(f"Bad stage-remat spec {remat!r}; use e.g. "
                             "'stage1' or 'stage12' (stages 1-4)")
        return stages
    return None


def _tpad(k: int):
    """torch-style symmetric conv padding (k // 2 both sides).

    Equals "SAME" for stride 1 but NOT for stride 2 on even inputs,
    where SAME pads (0, 1) and shifts the sampling grid one pixel off
    torchvision's -- which would silently break converted ImageNet
    checkpoints (models/pretrained.py) at every downsampling conv.
    """
    p = k // 2
    return ((p, p), (p, p))


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (resnet18/34)."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=_tpad(3))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 (self.strides, self.strides), padding="VALID",
                                 name="downsample_conv")(x)
            residual = self.norm(name="downsample_norm")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (resnet50+)."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=_tpad(3))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1),
                                 (self.strides, self.strides), padding="VALID",
                                 name="downsample_conv")(x)
            residual = self.norm(name="downsample_norm")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """ResNet backbone returning the smp-style 6-feature pyramid."""

    stage_sizes: Sequence[int]
    block_cls: Callable
    in_channels: int = 3
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    # rematerialize each residual block on backward.  True saves only
    # block-boundary activations, trading ~1 extra in-block forward
    # (a second MXU pass over the block's convs) for HBM headroom;
    # "convs" additionally SAVES every tagged conv output (conv_policy)
    # so backward recomputes only the elementwise BN/ReLU chain --
    # more saved HBM than True, near-zero recompute.  Parameter tree is
    # unchanged either way, so checkpoints interchange with remat=False.
    remat: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(named_conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        remat_stages = _remat_stage_set(self.remat)
        if self.remat == "convs":
            block_cls = nn.remat(self.block_cls, policy=conv_policy())
        elif self.remat and remat_stages is None:
            block_cls = nn.remat(self.block_cls)
        else:
            block_cls = self.block_cls

        features = [x]
        y = conv(self.num_filters, (7, 7), (2, 2), padding=_tpad(7),
                 name="stem_conv")(x.astype(self.dtype))
        y = norm(name="stem_norm")(y)
        y = nn.relu(y)
        features.append(y)                                   # /2

        # torch MaxPool2d(3, 2, padding=1); -inf padding preserves max
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=_tpad(3))
        for stage, n_blocks in enumerate(self.stage_sizes):
            stage_cls = block_cls
            if remat_stages is not None and stage + 1 in remat_stages:
                stage_cls = nn.remat(self.block_cls)
            for blk in range(n_blocks):
                strides = 2 if stage > 0 and blk == 0 else 1
                y = stage_cls(
                    filters=self.num_filters * 2 ** stage,
                    strides=strides, conv=conv, norm=norm,
                    name=f"stage{stage + 1}_block{blk}")(y)
            features.append(y)                               # /4 /8 /16 /32
        return features


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual: 1x1 expand -> 3x3 depthwise -> 1x1
    project, residual when stride 1 and shapes match."""

    filters: int
    strides: int
    expand: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        y = x
        if self.expand != 1:
            y = nn.relu6(self.norm()(self.conv(cin * self.expand, (1, 1))(y)))
        y = self.conv(y.shape[-1], (3, 3), (self.strides, self.strides),
                      padding=_tpad(3), feature_group_count=y.shape[-1])(y)
        y = nn.relu6(self.norm()(y))
        y = self.norm()(self.conv(self.filters, (1, 1))(y))
        if self.strides == 1 and cin == self.filters:
            y = y + x
        return y


class MobileNetV2Encoder(nn.Module):
    """MobileNetV2 backbone with the smp-style 6-level pyramid
    (out_channels (3, 16, 24, 32, 96, 1280), matching smp's
    mobilenet_v2 encoder signature)."""

    in_channels: int = 3
    dtype: Any = jnp.bfloat16
    remat: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(named_conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        if _remat_stage_set(self.remat) is not None:
            raise ValueError("stage-granular remat is ResNet-only; "
                             "MobileNetV2 takes remat in {False, True, "
                             "'convs'}")
        if self.remat == "convs":
            block_cls = nn.remat(InvertedResidual, policy=conv_policy())
        elif self.remat:
            block_cls = nn.remat(InvertedResidual)
        else:
            block_cls = InvertedResidual
        block = partial(block_cls, conv=conv, norm=norm)

        features = [x]
        y = nn.relu6(norm(name="stem_norm")(
            conv(32, (3, 3), (2, 2), padding=_tpad(3),
                 name="stem_conv")(x.astype(self.dtype))))
        y = block(filters=16, strides=1, expand=1, name="ir0")(y)
        features.append(y)                                   # /2, 16ch

        # (expand, filters, repeats, first stride) per MobileNetV2 stage
        stages = [(6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                  (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        marks = {0: 2, 1: 3, 3: 4}  # stage idx -> pyramid level after it
        for si, (t, c, n, s) in enumerate(stages):
            for bi in range(n):
                y = block(filters=c, strides=s if bi == 0 else 1, expand=t,
                          name=f"stage{si}_block{bi}")(y)
            if si in marks:
                features.append(y)                           # /4, /8, /16
        y = nn.relu6(norm(name="head_norm")(
            conv(1280, (1, 1), name="head_conv")(y)))
        features.append(y)                                   # /32, 1280ch
        return features


ENCODERS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock,
                     out_channels=(3, 64, 64, 128, 256, 512)),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock,
                     out_channels=(3, 64, 64, 128, 256, 512)),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                     out_channels=(3, 64, 256, 512, 1024, 2048)),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck,
                      out_channels=(3, 64, 256, 512, 1024, 2048)),
    "resnet152": dict(stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck,
                      out_channels=(3, 64, 256, 512, 1024, 2048)),
    "mobilenet_v2": dict(stage_sizes=None, block_cls=InvertedResidual,
                         out_channels=(3, 16, 24, 32, 96, 1280)),
}


def encoder_out_channels(encoder_name: str) -> Tuple[int, ...]:
    return ENCODERS[encoder_name]["out_channels"]


def build_encoder(encoder_name: str, in_channels: int = 3,
                  dtype: Any = jnp.bfloat16,
                  remat: Any = False) -> ResNetEncoder:
    if encoder_name not in ENCODERS:
        raise ValueError(
            f"Unknown encoder '{encoder_name}'; available: {sorted(ENCODERS)}")
    if encoder_name == "mobilenet_v2":
        return MobileNetV2Encoder(in_channels=in_channels, dtype=dtype,
                                  remat=remat)
    spec = ENCODERS[encoder_name]
    return ResNetEncoder(stage_sizes=spec["stage_sizes"],
                         block_cls=spec["block_cls"],
                         in_channels=in_channels, dtype=dtype, remat=remat)
