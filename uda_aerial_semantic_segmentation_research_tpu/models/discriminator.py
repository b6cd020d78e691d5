"""Image-level domain discriminator.

Architecture mirrors the reference ``DomainDiscriminator``
(reference src/models/discriminator.py:4-56): four stride-2 4x4 convs
(3->64->128->256->512, LeakyReLU 0.2, BatchNorm on layers 2-4) ->
global average pool -> Dense(1).

Deliberate divergence (documented in ops/losses.py): the module outputs
LOGITS; ``__call__`` applies sigmoid only when ``return_logits=False``
(default False to match the reference's probability surface, e.g. the
test-suite assertion that outputs lie in [0, 1],
reference src/test_system.py:300-301).  Training code passes
``return_logits=True`` and uses logit-BCE.
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


class DomainDiscriminator(nn.Module):
    input_channels: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        conv = partial(nn.Conv, kernel_size=(4, 4), strides=(2, 2),
                       padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(LaneBN, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32)
        lrelu = partial(nn.leaky_relu, negative_slope=0.2)

        y = x.astype(self.dtype)
        y = lrelu(conv(64, name="conv1")(y))
        y = lrelu(norm(name="norm2")(conv(128, name="conv2")(y)))
        y = lrelu(norm(name="norm3")(conv(256, name="conv3")(y)))
        y = lrelu(norm(name="norm4")(conv(512, name="conv4")(y)))
        y = jnp.mean(y, axis=(1, 2))                       # global average pool
        logits = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                          name="classifier")(y).astype(jnp.float32)
        if return_logits:
            return logits
        return jax.nn.sigmoid(logits)
