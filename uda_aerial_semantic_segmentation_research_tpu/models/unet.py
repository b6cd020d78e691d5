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

from uda_aerial_semantic_segmentation_research_tpu.ops.lane_bn import (
    LaneBN,
)
import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.models.resnet import (
    build_encoder,
    conv_policy,
    tag_conv_out,
)


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


class _BNParams(nn.Module):
    """Declare BatchNorm's exact variables (params scale/bias,
    batch_stats mean/var) WITHOUT applying them, so a fused kernel can
    fold the affine itself.  Instantiated with the same ``name`` as the
    ``nn.BatchNorm`` it replaces on other code paths -> identical
    checkpoint structure."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                             None, (self.features,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones,
                            None, (self.features,), jnp.float32)
        return scale, bias, mean.value, var.value


class _PackedSegHead(nn.Module):
    """3x3 segmentation head computed via the 2x2 lane-packed conv.

    Parameter names/shapes/inits match ``nn.Conv(classes, (3, 3))``
    exactly (kernel + bias), so checkpoints interchange with the plain
    head; only the execution schedule differs (23 output lanes -> 92).
    """

    classes: int
    in_features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from uda_aerial_semantic_segmentation_research_tpu.ops.packed_conv import (
            conv3x3_packed,
        )

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.classes),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.classes,),
                          jnp.float32)
        if x.shape[1] % 2 or x.shape[2] % 2:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = conv3x3_packed(x, kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


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
    # which fused upsample+conv schedule: "phase" (combined 4-phase conv
    # + slice/stack interleave) or "dilated" (single lhs_dilation=2 conv
    # with the tap-folded 4x4 kernel; see ops/upsample_conv.py)
    fused_impl: str = "phase"
    # 2x2-space-to-depth lane packing for the low-channel convs (see
    # ops/packed_conv.py): applied to convs whose output channels would
    # occupy <= 32 of the MXU's 128 output lanes
    packed: bool = False
    # serving-path fusion: in eval mode run BN1-affine + ReLU + conv2 as
    # ONE Pallas kernel (ops/pallas_conv.py) -- BN folds to an affine
    # when running statistics are used, so the whole chain fuses without
    # the train-mode batch-moments dependency.  Same variable tree.
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        from uda_aerial_semantic_segmentation_research_tpu.ops.packed_conv import (
            conv3x3_packed,
        )
        from uda_aerial_semantic_segmentation_research_tpu.ops.upsample_conv import (
            upsample2x_conv3x3,
            upsample2x_conv3x3_dilated,
        )

        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        pack = self.packed and self.filters <= 32

        def conv3x3(y, name, cin):
            """3x3 SAME conv, lane-packed when this block qualifies
            (parameter tree identical to the nn.Conv path).  The output
            is tagged as a remat save point (see resnet.CONV_SAVE_NAME)."""
            if pack and y.shape[1] % 2 == 0 and y.shape[2] % 2 == 0:
                w = _Conv3x3Kernel(self.filters, cin, name=name)()
                out = conv3x3_packed(y, w.astype(self.dtype))
            else:
                out = conv(self.filters, (3, 3), name=name)(y)
            return tag_conv_out(out)

        cup = x.shape[-1]
        cs = 0 if skip is None else skip.shape[-1]
        if self.fused:
            up_conv = (upsample2x_conv3x3_dilated
                       if self.fused_impl == "dilated" else upsample2x_conv3x3)
            w1 = _Conv3x3Kernel(self.filters, cup + cs, name="conv1")()
            w1 = w1.astype(self.dtype)
            y = up_conv(x.astype(self.dtype), w1[:, :, :cup])
            if skip is not None:
                sk = skip.astype(self.dtype)
                if pack and sk.shape[1] % 2 == 0 and sk.shape[2] % 2 == 0:
                    y = y + conv3x3_packed(sk, w1[:, :, cup:])
                else:
                    y = y + jax.lax.conv_general_dilated(
                        sk, w1[:, :, cup:], (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = tag_conv_out(y)
        else:
            y = _upsample2x(x)
            if skip is not None:
                y = jnp.concatenate([y, skip.astype(self.dtype)], axis=-1)
            y = conv3x3(y, "conv1", cup + cs)
        if (self.pallas_eval and not train and pack
                and y.shape[1] % 2 == 0 and y.shape[2] % 2 == 0):
            from uda_aerial_semantic_segmentation_research_tpu.ops.pallas_conv import (
                packed_conv_bn_relu,
            )

            s1, b1, m1, v1 = _BNParams(self.filters, name="norm1")()
            inv = s1 * jax.lax.rsqrt(v1 + 1e-5)
            shift = b1 - m1 * inv
            # guard the fold against an exactly-zero BN scale (border
            # value of the fused pad ring divides by it)
            inv = jnp.where(jnp.abs(inv) < 1e-12, 1e-12, inv)
            w2 = _Conv3x3Kernel(self.filters, self.filters, name="conv2")()
            y2 = packed_conv_bn_relu(y.astype(self.dtype),
                                     w2.astype(self.dtype), inv, shift)
            return nn.relu(norm(name="norm2")(y2))
        x = nn.relu(norm(name="norm1")(y))
        x = nn.relu(norm(name="norm2")(conv3x3(x, "conv2", self.filters)))
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.bfloat16
    # True/False applies the fused upsample+conv to all/no blocks; a
    # tuple of block indices (0 = lowest resolution) fuses only those --
    # the high-resolution blocks (3, 4) are where the naive path's 4x
    # upsampled intermediate is the multi-GB one.  The string "dilated"
    # fuses all blocks via the single lhs_dilation=2 tap-folded conv
    # (ops/upsample_conv.upsample2x_conv3x3_dilated)
    fused: Any = False
    remat: Any = False
    packed: bool = False
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, features, train: bool = False):
        # features: [identity, /2, /4, /8, /16, /32]
        head = features[-1]
        skips = features[1:-1][::-1] + [None]   # /16, /8, /4, /2, None
        x = head.astype(self.dtype)
        # static_argnums counts the module itself as arg 0: (x, skip, train)
        # sit at (1, 2, 3) and only train is a static Python bool
        if self.remat == "convs":
            block_cls = nn.remat(DecoderBlock, static_argnums=(3,),
                                 policy=conv_policy())
        elif self.remat:
            block_cls = nn.remat(DecoderBlock, static_argnums=(3,))
        else:
            block_cls = DecoderBlock
        impl = "dilated" if self.fused == "dilated" else "phase"
        # trace-time tiny-shape gate: the dilated schedule is validated
        # on-chip at the production tile (block inputs 16-256px); runs
        # below 128px full-res (tests/smoke) keep the naive path, whose
        # tiny-shape compiles are proven (an axon relay outage coincided
        # with a 64px dilated compile and was never exonerated -- see
        # BASELINE.md r3 ledger)
        fused_cfg = self.fused
        if impl == "dilated" and features[0].shape[1] < 128:
            fused_cfg = False
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            fused = (i in fused_cfg if isinstance(fused_cfg, tuple)
                     else bool(fused_cfg))
            x = block_cls(ch, dtype=self.dtype, fused=fused,
                          fused_impl=impl,
                          packed=self.packed, pallas_eval=self.pallas_eval,
                          name=f"block{i}")(x, skip, train)
        return x


class Unet(nn.Module):
    """Encoder-decoder semantic segmentation network."""

    encoder_name: str = "resnet34"
    classes: int = 23
    in_channels: int = 3
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    activation: Optional[str] = None
    dtype: Any = jnp.bfloat16
    # bool, a tuple of decoder block indices to fuse, "dilated" for the
    # lhs_dilation=2 tap-folded schedule (see UnetDecoder), or "auto"
    # (the default): "dilated" on the TPU backend -- measured 346.4 vs
    # 405.6 ms/step at B=128 @ 512px (BASELINE.md r3 ledger), numerics
    # pinned by tests/test_models.py -- and the naive path elsewhere
    fused_decoder: Any = "auto"
    # dtype the logits are RETURNED in.  float32 is the parity default;
    # bfloat16 halves the largest tensor in training (B, H, W, 23) and
    # lets a fused loss consume it without an f32 materialization -- the
    # per-pixel CE is computed in f32 either way (ops/losses.py upcasts).
    logits_dtype: Any = jnp.float32
    # per-block activation rematerialization: True remats encoder AND
    # decoder blocks; "encoder"/"decoder" remat only that half (saving
    # the other half's activations buys back its recompute at the cost
    # of its saved-activation HBM -- phase 3's grad programs have ~4 GB
    # of headroom under full remat at B=128, see BASELINE.md).
    # "convs" / "encoder_convs" / "decoder_convs" use the
    # save-conv-outputs policy instead (resnet.conv_policy): backward
    # recomputes only the elementwise BN/ReLU chain between saved conv
    # outputs, not the convs themselves -- more saved HBM than plain
    # block remat, near-zero recompute.  "stage1"/"stage12"/... remat
    # only those encoder stages' blocks (minimum-recompute way to free
    # the 256 MB/tensor high-resolution activations; ResNet encoders
    # only).  All policy/stage modes are gradient-exact vs remat=False
    # (tests/test_models.py::test_remat_gradients_exact) but exceed the
    # 16 G chip at the production phase-3 shape -- see BASELINE.md r3s8
    # for the measured map; they are the first knobs to turn on
    # larger-HBM parts.  Same parameter tree in every mode, so
    # checkpoints interchange freely.
    remat: Any = False
    # 2x2 lane packing for the low-channel decoder/head convs
    # (ops/packed_conv.py); numerically exact, same parameter tree
    packed_decoder: bool = False
    # serving-path Pallas fusion (BN affine + ReLU + conv in one kernel)
    # for the packed decoder blocks in eval mode (ops/pallas_conv.py)
    pallas_eval: bool = False

    def setup(self):
        fused = self.fused_decoder
        if fused == "auto":
            # resolved at trace time; pure XLA either way, so both
            # resolutions are SPMD/mesh-safe (unlike the Pallas paths)
            fused = "dilated" if jax.default_backend() == "tpu" else False
        if self.remat == "convs":
            enc_remat = dec_remat = "convs"
        elif self.remat == "encoder_convs":
            enc_remat, dec_remat = "convs", False
        elif self.remat == "decoder_convs":
            enc_remat, dec_remat = False, "convs"
        elif isinstance(self.remat, str) and self.remat.startswith("stage"):
            # stage-granular encoder remat ("stage1", "stage12", ...):
            # remat only those encoder stages' blocks, decoder untouched
            # -- the minimum-recompute config that still frees the
            # 256 MB/tensor high-resolution activations (BASELINE.md r3s8)
            enc_remat, dec_remat = self.remat, False
        else:
            enc_remat = self.remat is True or self.remat == "encoder"
            dec_remat = self.remat is True or self.remat == "decoder"
        self.encoder = build_encoder(self.encoder_name, self.in_channels,
                                     self.dtype, remat=enc_remat)
        self.decoder = UnetDecoder(self.decoder_channels, self.dtype,
                                   fused=fused,
                                   remat=dec_remat,
                                   packed=self.packed_decoder,
                                   pallas_eval=self.pallas_eval)
        if self.packed_decoder and self.classes <= 32:
            self.segmentation_head = _PackedSegHead(
                self.classes, self.decoder_channels[-1], dtype=self.dtype,
                name="segmentation_head")
        else:
            self.segmentation_head = nn.Conv(
                self.classes, (3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
                name="segmentation_head")

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
