"""U-Net segmentation model (Flax, NHWC) and the smp.Unet-style factory.

Mirrors the capability of ``smp.Unet(encoder_name, encoder_weights,
in_channels, classes)`` as instantiated by the reference
(src/test_system.py:90-95, src/models/train.py:572-577, src/models/uda.py:42-48):
ResNet encoder -> 5 decoder blocks with skip connections
(decoder channels 256/128/64/32/16) -> 3x3 segmentation head.

Logits are returned in float32 NHWC ``(B, H, W, classes)``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.models.resnet import build_encoder


def _upsample2x(x):
    """Nearest-neighbor 2x upsampling (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class _Conv3x3Kernel(nn.Module):
    """Bare 3x3 HWIO kernel parameter with nn.Conv's layout and init,
    so the fused decoder's state_dict matches the naive nn.Conv path
    (``.../conv1/kernel``) exactly."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, self.in_features, self.features), jnp.float32)


class DecoderBlock(nn.Module):
    """Upsample 2x -> concat skip -> (conv3x3 + BN + ReLU) x 2.

    ``fused`` computes conv1 WITHOUT materializing the
    4x upsampled/concatenated tensor:
      conv3x3(concat(up2(x), skip)) == upsample2x_conv3x3(x, W_up)
                                       + conv3x3(skip, W_skip)
    where (W_up, W_skip) are channel slices of the SAME conv1 kernel --
    the phase decomposition is exact (ops/upsample_conv.py) and the
    parameter tree is identical to the naive path, so checkpoints are
    interchangeable.
    """

    filters: int
    dtype: Any = jnp.bfloat16
    fused: bool = True

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        from uda_aerial_semantic_segmentation_research_tpu.ops.upsample_conv import (
            upsample2x_conv3x3,
        )

        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)

        cup = x.shape[-1]
        cs = 0 if skip is None else skip.shape[-1]
        if self.fused:
            w1 = _Conv3x3Kernel(self.filters, cup + cs, name="conv1")()
            w1 = w1.astype(self.dtype)
            y = upsample2x_conv3x3(x.astype(self.dtype), w1[:, :, :cup])
            if skip is not None:
                y = y + jax.lax.conv_general_dilated(
                    skip.astype(self.dtype), w1[:, :, cup:], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = _upsample2x(x)
            if skip is not None:
                y = jnp.concatenate([y, skip.astype(self.dtype)], axis=-1)
            y = conv(self.filters, (3, 3), name="conv1")(y)
        x = nn.relu(norm(name="norm1")(y))
        x = nn.relu(norm(name="norm2")(conv(self.filters, (3, 3), name="conv2")(x)))
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, features, train: bool = False):
        # features: [identity, /2, /4, /8, /16, /32]
        head = features[-1]
        skips = features[1:-1][::-1] + [None]   # /16, /8, /4, /2, None
        x = head.astype(self.dtype)
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            x = DecoderBlock(ch, dtype=self.dtype, fused=self.fused,
                             name=f"block{i}")(x, skip, train=train)
        return x


class Unet(nn.Module):
    """Encoder-decoder semantic segmentation network."""

    encoder_name: str = "resnet34"
    classes: int = 23
    in_channels: int = 3
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    activation: Optional[str] = None
    dtype: Any = jnp.bfloat16
    fused_decoder: bool = False
    # dtype the logits are RETURNED in.  float32 is the parity default;
    # bfloat16 halves the largest tensor in training (B, H, W, 23) and
    # lets a fused loss consume it without an f32 materialization -- the
    # per-pixel CE is computed in f32 either way (ops/losses.py upcasts).
    logits_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = build_encoder(self.encoder_name, self.in_channels, self.dtype)
        self.decoder = UnetDecoder(self.decoder_channels, self.dtype,
                                   fused=self.fused_decoder)
        self.segmentation_head = nn.Conv(
            self.classes, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="segmentation_head")

    def __call__(self, x, train: bool = False):
        features = self.encoder(x, train=train)
        y = self.decoder(features, train=train)
        logits = self.segmentation_head(y).astype(self.logits_dtype)
        if self.activation == "softmax":
            return jax.nn.softmax(logits, axis=-1)
        if self.activation == "sigmoid":
            return jax.nn.sigmoid(logits)
        return logits

    def encode(self, x, train: bool = False):
        """Feature pyramid only (for feature-level domain discriminators)."""
        return self.encoder(x, train=train)

    def decode(self, features, train: bool = False):
        y = self.decoder(features, train=train)
        return self.segmentation_head(y).astype(self.logits_dtype)
