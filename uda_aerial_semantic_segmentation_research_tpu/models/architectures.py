"""Additional segmentation architectures (FPN / PSPNet / Linknet /
DeepLabV3+), NHWC Flax, sharing the ResNet encoders.

The reference instantiates its model as ``getattr(smp, model_name)(...)``
(reference src/models/train.py:570-576), i.e. ANY
segmentation_models_pytorch architecture selected by ``Config.MODEL_NAME``.
These are the TPU-native counterparts of the most used smp families;
``create_model`` (models/__init__.py) is the by-name factory.

Shared conventions (same as models/unet.py):
- bf16 compute / fp32 params, NHWC, logits returned float32 at input
  resolution;
- ``encode()`` exposes the smp-style 6-level feature pyramid so the
  domain-adaptation wrappers work with every family;
- BatchNorm with cross-replica statistics for free under the data mesh.

Documented approximations vs smp: PSPNet pools at (1, 2, 4, 8) bins via
resize-average (smp uses adaptive pooling at (1, 2, 3, 6)); FPN merges
with nearest upsampling and per-level conv blocks using BatchNorm (smp
uses GroupNorm).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn

from uda_aerial_semantic_segmentation_research_tpu.ops.lane_bn import (
    LaneBN,
)
import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.models.resnet import build_encoder


def _upsample_to(x, h, w, method="nearest"):
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method=method)


def _conv_bn_relu(x, filters, kernel, dtype, train, name, dilation=1):
    y = nn.Conv(filters, (kernel, kernel), padding="SAME",
                kernel_dilation=(dilation, dilation), use_bias=False,
                dtype=dtype, param_dtype=jnp.float32, name=f"{name}_conv")(x)
    y = LaneBN(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=dtype, param_dtype=jnp.float32,
                     name=f"{name}_norm")(y)
    return nn.relu(y)


class _SegBase(nn.Module):
    """Common scaffolding: encoder + float32 logits head contract."""

    encoder_name: str = "resnet34"
    classes: int = 23
    in_channels: int = 3
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = build_encoder(self.encoder_name, self.in_channels,
                                     self.dtype)

    def encode(self, x, train: bool = False):
        return self.encoder(x, train=train)


class FPN(_SegBase):
    """Feature Pyramid Network decoder (smp.FPN analogue).

    Laterals (1x1, 256ch) on C2..C5, top-down nearest-add merge,
    per-level segmentation blocks to 128ch at 1/4 scale, sum, head,
    upsample x4.
    """

    pyramid_channels: int = 256
    segmentation_channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = self.encode(x, train=train)
        c2, c3, c4, c5 = (f.astype(self.dtype) for f in feats[2:6])

        lat = partial(nn.Conv, features=self.pyramid_channels,
                      kernel_size=(1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)
        p5 = lat(name="lateral5")(c5)
        p4 = lat(name="lateral4")(c4) + _upsample_to(p5, *c4.shape[1:3])
        p3 = lat(name="lateral3")(c3) + _upsample_to(p4, *c3.shape[1:3])
        p2 = lat(name="lateral2")(c2) + _upsample_to(p3, *c2.shape[1:3])

        th, tw = c2.shape[1], c2.shape[2]   # 1/4 scale
        merged = 0.0
        for i, p in enumerate((p5, p4, p3, p2)):
            s = _conv_bn_relu(p, self.segmentation_channels, 3, self.dtype,
                              train, name=f"seg{i}")
            merged = merged + _upsample_to(s, th, tw)

        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(merged)
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)


class PSPNet(_SegBase):
    """Pyramid Scene Parsing network (smp.PSPNet analogue).

    PSP module over the bottleneck: resize-average pooling at
    (1, 2, 4, 8) bins -> 1x1 convs -> upsample -> concat -> 3x3 conv ->
    head -> upsample to input.
    """

    psp_channels: int = 512
    bins: Sequence[int] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        c5 = self.encode(x, train=train)[-1].astype(self.dtype)
        fh, fw = c5.shape[1], c5.shape[2]
        branch_ch = self.psp_channels // len(self.bins)

        branches = [c5]
        for i, b in enumerate(self.bins):
            pooled = jax.image.resize(c5, (c5.shape[0], b, b, c5.shape[3]),
                                      method="linear")
            pooled = _conv_bn_relu(pooled, branch_ch, 1, self.dtype, train,
                                   name=f"psp{i}")
            branches.append(_upsample_to(pooled, fh, fw, "bilinear"))

        y = jnp.concatenate(branches, axis=-1)
        y = _conv_bn_relu(y, self.psp_channels, 3, self.dtype, train,
                          name="bottleneck")
        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(y)
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)


class LinknetDecoderBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(x.shape[-1] // 4, 16)
        y = _conv_bn_relu(x, mid, 1, self.dtype, train, name="reduce")
        b, hh, ww, cc = y.shape
        y = jnp.broadcast_to(y[:, :, None, :, None, :],
                             (b, hh, 2, ww, 2, cc)).reshape(b, hh * 2, ww * 2, cc)
        y = _conv_bn_relu(y, mid, 3, self.dtype, train, name="up")
        return _conv_bn_relu(y, self.out_channels, 1, self.dtype, train,
                             name="expand")


class Linknet(_SegBase):
    """Linknet (smp.Linknet analogue): decoder blocks ADD encoder skips."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = self.encode(x, train=train)
        skips = [f.astype(self.dtype) for f in feats[1:5]]  # /2 /4 /8 /16
        y = feats[5].astype(self.dtype)                      # /32
        for i, skip in enumerate(reversed(skips)):           # /16 /8 /4 /2
            y = LinknetDecoderBlock(skip.shape[-1], dtype=self.dtype,
                                    name=f"block{i}")(y, train=train)
            y = y + skip
        y = LinknetDecoderBlock(32, dtype=self.dtype, name="block4")(
            y, train=train)                                  # /1
        logits = nn.Conv(self.classes, (3, 3), padding="SAME",
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="head")(y)
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)


class UnetPlusPlus(_SegBase):
    """UNet++ (smp.UnetPlusPlus analogue): nested dense decoder.

    Node X[i, j] (row i = pyramid level /2^(i+1), column j = decoder
    depth) convolves the concat of all same-row predecessors X[i, 0..j-1]
    with the upsampled X[i+1, j-1]; the output head reads X[0, 4] at /2
    and upsamples to input resolution.
    """

    row_channels: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = self.encode(x, train=train)
        rows = 5
        nodes = {(i, 0): feats[i + 1].astype(self.dtype) for i in range(rows)}

        for j in range(1, rows):
            for i in range(rows - j):
                up = _upsample_to(nodes[(i + 1, j - 1)],
                                  nodes[(i, 0)].shape[1],
                                  nodes[(i, 0)].shape[2])
                cat = jnp.concatenate(
                    [nodes[(i, k)] for k in range(j)] + [up], axis=-1)
                ch = self.row_channels[min(i, len(self.row_channels) - 1)]
                y = _conv_bn_relu(cat, ch, 3, self.dtype, train,
                                  name=f"x{i}_{j}a")
                y = _conv_bn_relu(y, ch, 3, self.dtype, train,
                                  name=f"x{i}_{j}b")
                nodes[(i, j)] = y

        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(
            nodes[(0, rows - 1)])
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)


class DeepLabV3Plus(_SegBase):
    """DeepLabV3+ (smp.DeepLabV3Plus analogue).

    ASPP over the /32 bottleneck (1x1, dilated 3x3 at rates (2, 4, 6)
    appropriate for the small /32 grid, image pooling) -> 1x1 256 ->
    upsample to /4 -> concat 48ch low-level (C2) -> 3x3 convs -> head.
    """

    aspp_channels: int = 256
    atrous_rates: Sequence[int] = (2, 4, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = self.encode(x, train=train)
        low = feats[2].astype(self.dtype)        # /4
        c5 = feats[5].astype(self.dtype)         # /32
        fh, fw = c5.shape[1], c5.shape[2]

        branches = [_conv_bn_relu(c5, self.aspp_channels, 1, self.dtype,
                                  train, name="aspp_1x1")]
        for i, r in enumerate(self.atrous_rates):
            branches.append(_conv_bn_relu(c5, self.aspp_channels, 3,
                                          self.dtype, train,
                                          name=f"aspp_r{r}", dilation=r))
        pooled = jnp.mean(c5, axis=(1, 2), keepdims=True)
        pooled = _conv_bn_relu(pooled, self.aspp_channels, 1, self.dtype,
                               train, name="aspp_pool")
        branches.append(jnp.broadcast_to(
            pooled, (c5.shape[0], fh, fw, self.aspp_channels)))

        y = jnp.concatenate(branches, axis=-1)
        y = _conv_bn_relu(y, self.aspp_channels, 1, self.dtype, train,
                          name="aspp_project")
        y = _upsample_to(y, low.shape[1], low.shape[2], "bilinear")

        low = _conv_bn_relu(low, 48, 1, self.dtype, train, name="low_project")
        y = jnp.concatenate([y, low], axis=-1)
        y = _conv_bn_relu(y, self.aspp_channels, 3, self.dtype, train,
                          name="refine1")
        y = _conv_bn_relu(y, self.aspp_channels, 3, self.dtype, train,
                          name="refine2")
        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(y)
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)


class PAN(_SegBase):
    """Pyramid Attention Network (smp.PAN analogue).

    FPA (feature pyramid attention) on the /32 bottleneck -- a 1x1 main
    branch modulated by a 7/5/3 downsampling conv pyramid plus a global
    pooling branch -- then three GAU (global attention upsample) blocks
    merge C4/C3/C2 on the way up to /4; head + x4 upsample.  The
    reference reaches this family through ``getattr(smp, MODEL_NAME)``
    (reference src/models/train.py:570-576).  Documented approximation:
    smp runs the encoder dilated at output stride 16; here the standard
    /32 pyramid is used (the FPA/GAU structure is unchanged).
    """

    decoder_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = self.encode(x, train=train)
        c2, c3, c4, c5 = (f.astype(self.dtype) for f in feats[2:6])
        ch = self.decoder_channels
        fh, fw = c5.shape[1], c5.shape[2]

        # --- FPA ------------------------------------------------------
        pooled = jnp.mean(c5, axis=(1, 2), keepdims=True)
        glob = nn.Conv(ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="fpa_pool")(pooled)
        mid = _conv_bn_relu(c5, ch, 1, self.dtype, train, name="fpa_mid")

        # 7/5/3 downsampling pyramid, truncated when the bottleneck grid
        # is too small to halve again (tiny test inputs)
        downs, cur = [], c5
        for kern, lname in ((7, "d1"), (5, "d2"), (3, "d3")):
            if min(cur.shape[1], cur.shape[2]) < 2:
                break
            cur = _conv_bn_relu(nn.avg_pool(cur, (2, 2), (2, 2)), ch, kern,
                                self.dtype, train, name=f"fpa_{lname}")
            downs.append((kern, cur))
        u = 0.0
        for j, (kern, d) in enumerate(reversed(downs)):
            u = _conv_bn_relu(d, ch, kern, self.dtype, train,
                              name=f"fpa_u{len(downs) - j}") + u
            target = downs[len(downs) - j - 2][1] if len(downs) - j >= 2 \
                else c5
            u = _upsample_to(u, *target.shape[1:3], "bilinear")
        y = (mid * u + glob) if downs else (mid + glob)

        # --- GAU ladder ----------------------------------------------
        for i, skip in enumerate((c4, c3, c2)):
            low = _conv_bn_relu(skip, ch, 3, self.dtype, train,
                                name=f"gau{i}_low")
            att = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"gau{i}_att")(
                jnp.mean(y, axis=(1, 2), keepdims=True))
            att = nn.sigmoid(LaneBN(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"gau{i}_att_norm")(att))
            y = _upsample_to(y, *skip.shape[1:3], "bilinear") + low * att

        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(y)
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)


class _PAB(nn.Module):
    """Position-wise attention block over the /32 bottleneck (MAnet).

    Spatial self-attention: softmax((WQ x)(WK x)^T) (WV x) at the
    bottleneck's 16x16 grid -- a 256x256 attention matrix, MXU-trivial.
    """

    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, fh, fw, c = x.shape
        mid = self.channels // 4
        pw = partial(nn.Conv, kernel_size=(1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)
        q = pw(features=mid, name="q")(x).reshape(b, fh * fw, mid)
        k = pw(features=mid, name="k")(x).reshape(b, fh * fw, mid)
        v = pw(features=c, name="v")(x).reshape(b, fh * fw, c)
        att = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k,
                       preferred_element_type=jnp.float32)
            / jnp.sqrt(jnp.float32(mid)), axis=-1).astype(self.dtype)
        y = jnp.einsum("bnm,bmc->bnc", att, v).reshape(b, fh, fw, c)
        return x + y


class _MFAB(nn.Module):
    """Multi-scale fusion attention block (MAnet decoder stage).

    Concat(upsampled deep, skip) -> two 3x3 conv-bn-relu -> channel
    attention (squeeze-excitation, reduction 16) -> residual scale.
    """

    out_channels: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, deep, skip, train: bool = False):
        y = _upsample_to(deep, *skip.shape[1:3])
        y = jnp.concatenate([y, skip], axis=-1)
        y = _conv_bn_relu(y, self.out_channels, 3, self.dtype, train,
                          name="fuse1")
        y = _conv_bn_relu(y, self.out_channels, 3, self.dtype, train,
                          name="fuse2")
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.Dense(max(self.out_channels // self.reduction, 4),
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="se_reduce")(s)
        s = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name="se_expand")(nn.relu(s))
        return y * nn.sigmoid(s)


class MAnet(_SegBase):
    """Multi-scale Attention Net (smp.MAnet analogue).

    PAB position attention on the bottleneck, then MFAB decoder stages
    (concat skip + channel attention) up the pyramid, final plain
    decoder block to full resolution.  Reference surface:
    ``getattr(smp, MODEL_NAME)`` (src/models/train.py:570-576).
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = self.encode(x, train=train)
        skips = [f.astype(self.dtype) for f in feats[1:5]]  # /2 /4 /8 /16
        y = feats[5].astype(self.dtype)                      # /32
        y = _PAB(y.shape[-1], dtype=self.dtype, name="pab")(y, train=train)

        for i, (skip, ch) in enumerate(zip(reversed(skips),
                                           self.decoder_channels)):
            y = _MFAB(ch, dtype=self.dtype, name=f"mfab{i}")(
                y, skip, train=train)

        b, hh, ww, cc = y.shape
        y = jnp.broadcast_to(y[:, :, None, :, None, :],
                             (b, hh, 2, ww, 2, cc)).reshape(
            b, hh * 2, ww * 2, cc)
        y = _conv_bn_relu(y, 16, 3, self.dtype, train, name="final")
        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(y)
        return _upsample_to(logits, h, w, "bilinear").astype(jnp.float32)
