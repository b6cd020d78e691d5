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

ModuleDef = Any


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
    # rematerialize each residual block on backward: only block-boundary
    # activations are saved, trading ~1 extra in-block forward for HBM
    # headroom (unlocks larger batches; phase 3's three grad-bearing
    # forwards at 512px OOM without it).  Parameter tree is unchanged,
    # so checkpoints are interchangeable with remat=False.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls

        features = [x]
        y = conv(self.num_filters, (7, 7), (2, 2), padding=_tpad(7),
                 name="stem_conv")(x.astype(self.dtype))
        y = norm(name="stem_norm")(y)
        y = nn.relu(y)
        features.append(y)                                   # /2

        # torch MaxPool2d(3, 2, padding=1); -inf padding preserves max
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=_tpad(3))
        for stage, n_blocks in enumerate(self.stage_sizes):
            for blk in range(n_blocks):
                strides = 2 if stage > 0 and blk == 0 else 1
                y = block_cls(
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
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        block_cls = (nn.remat(InvertedResidual) if self.remat
                     else InvertedResidual)
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
                  remat: bool = False) -> ResNetEncoder:
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
