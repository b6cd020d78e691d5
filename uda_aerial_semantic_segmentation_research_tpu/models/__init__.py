"""Model factories and modules.

``create_unet`` is the smp.Unet-analogue entry point used everywhere the
reference writes ``smp.Unet(encoder_name=..., encoder_weights=...,
in_channels=..., classes=...)`` (reference src/test_system.py:90-95).
It returns a ``ModelBundle`` (module + initialized variables).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from uda_aerial_semantic_segmentation_research_tpu.config import Config
from uda_aerial_semantic_segmentation_research_tpu.models.bundle import ModelBundle
from uda_aerial_semantic_segmentation_research_tpu.models.discriminator import (
    DomainDiscriminator,
)
from uda_aerial_semantic_segmentation_research_tpu.models.domain_model import (
    DomainAdaptationModel,
)
from uda_aerial_semantic_segmentation_research_tpu.models.pretrained import (
    load_imagenet_encoder,
)
from uda_aerial_semantic_segmentation_research_tpu.models.resnet import (
    ResNetEncoder,
    build_encoder,
    encoder_out_channels,
)
from uda_aerial_semantic_segmentation_research_tpu.models.uda import (
    FeatureDomainDiscriminator,
    UDALoss,
    UDASegmentationModel,
    gradient_reverse_layer,
)
from uda_aerial_semantic_segmentation_research_tpu.models.unet import Unet


def create_model(
    model_name: str = None,
    encoder_name: str = None,
    encoder_weights: Optional[str] = None,
    in_channels: int = None,
    classes: int = None,
    image_size: Optional[int] = None,
    seed: int = 0,
    dtype=None,
    **arch_kwargs,
) -> ModelBundle:
    """By-name architecture factory (smp ``getattr(smp, model_name)``
    analogue, reference src/models/train.py:570-576).

    Supported: Unet, UnetPlusPlus, FPN, PSPNet, Linknet,
    DeepLabV3Plus, PAN, MAnet.
    """
    from uda_aerial_semantic_segmentation_research_tpu.models import (
        architectures as arch,
    )

    model_name = model_name or Config.MODEL_NAME
    encoder_name = encoder_name or Config.ENCODER_NAME
    in_channels = in_channels or Config.IN_CHANNELS
    classes = classes or Config.NUM_CLASSES
    image_size = image_size or Config.IMAGE_SIZE
    dtype = dtype or Config.compute_dtype()

    registry = {"Unet": Unet, "FPN": arch.FPN, "PSPNet": arch.PSPNet,
                "Linknet": arch.Linknet, "DeepLabV3Plus": arch.DeepLabV3Plus,
                "UnetPlusPlus": arch.UnetPlusPlus,
                "PAN": arch.PAN, "MAnet": arch.MAnet}
    if model_name not in registry:
        raise ValueError(f"Unknown model '{model_name}'; "
                         f"available: {sorted(registry)}")
    module = registry[model_name](encoder_name=encoder_name, classes=classes,
                                  in_channels=in_channels, dtype=dtype,
                                  **arch_kwargs)
    sample = jnp.zeros((1, image_size, image_size, in_channels), jnp.float32)
    bundle = ModelBundle.create(module, sample, rng=jax.random.key(seed))
    if encoder_weights == "imagenet":
        load_imagenet_encoder(bundle, encoder_name)
    return bundle


def create_unet(
    encoder_name: str = None,
    encoder_weights: Optional[str] = None,
    in_channels: int = None,
    classes: int = None,
    activation: Optional[str] = None,
    image_size: Optional[int] = None,
    seed: int = 0,
    dtype=None,
    **unet_kwargs,
) -> ModelBundle:
    """Build + initialize a U-Net segmentation bundle (smp.Unet analogue).

    Extra keyword args (``fused_decoder``, ``logits_dtype``, ...) pass
    through to the ``Unet`` module.
    """
    encoder_name = encoder_name or Config.ENCODER_NAME
    in_channels = in_channels or Config.IN_CHANNELS
    classes = classes or Config.NUM_CLASSES
    image_size = image_size or Config.IMAGE_SIZE
    dtype = dtype or Config.compute_dtype()

    module = Unet(encoder_name=encoder_name, classes=classes,
                  in_channels=in_channels, activation=activation, dtype=dtype,
                  **unet_kwargs)
    sample = jnp.zeros((1, image_size, image_size, in_channels), jnp.float32)
    bundle = ModelBundle.create(module, sample, rng=jax.random.key(seed))
    if encoder_weights == "imagenet":
        load_imagenet_encoder(bundle, encoder_name)
    return bundle


def create_discriminator(input_channels: int = 3, image_size: Optional[int] = None,
                         seed: int = 1, dtype=None) -> ModelBundle:
    """Build + initialize the image-level domain discriminator bundle."""
    image_size = image_size or Config.IMAGE_SIZE
    dtype = dtype or Config.compute_dtype()
    module = DomainDiscriminator(input_channels=input_channels, dtype=dtype)
    sample = jnp.zeros((1, image_size, image_size, input_channels), jnp.float32)
    return ModelBundle.create(module, sample, rng=jax.random.key(seed))


def create_uda_model(encoder_name: str = "resnet50", classes: int = None,
                     image_size: Optional[int] = None, seed: int = 0,
                     dtype=None) -> ModelBundle:
    """Build + initialize the single-pass GRL UDA model bundle."""
    classes = classes or Config.NUM_CLASSES
    image_size = image_size or Config.IMAGE_SIZE
    dtype = dtype or Config.compute_dtype()
    module = UDASegmentationModel(encoder_name=encoder_name, classes=classes,
                                  dtype=dtype)
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    # init with the domain head active so its params exist from the start
    return ModelBundle.create(module, sample, rng=jax.random.key(seed),
                              domain_adaptation=True)


__all__ = [
    "ModelBundle", "Unet", "ResNetEncoder", "build_encoder",
    "encoder_out_channels", "DomainDiscriminator", "DomainAdaptationModel",
    "FeatureDomainDiscriminator", "UDASegmentationModel", "UDALoss",
    "gradient_reverse_layer", "create_model", "create_unet",
    "create_discriminator", "create_uda_model", "load_imagenet_encoder",
]
