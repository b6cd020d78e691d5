"""TPU-native UDA aerial semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``bempt/uda_aerial_semantic_segmentation_research`` (PyTorch, single-GPU),
redesigned TPU-first:

- Models are Flax modules in NHWC layout with bf16 compute.
- Training steps are pure jitted functions over pytree ``TrainState``s;
  the three training phases (supervised -> adversarial -> fine-tuning)
  differ only in the loss closure the step compiles.
- Augmentation runs batched *on device* inside the jitted step
  (replacing the reference's per-image CPU albumentations round trip,
  reference src/models/unsupervised_trainer.py:100-114).
- Data parallelism is a ``jax.sharding.Mesh`` over the ``data`` axis with
  pjit-style sharding; gradient/metric reductions ride ICI collectives.

Public surface mirrors the reference's ``python -m src.test_system`` CLI
(reference src/test_system.py:687-730) as
``python -m uda_aerial_semantic_segmentation_research_tpu.test_system``.
"""

__version__ = "0.1.0"

# tuned libtpu compiler defaults (LIBTPU_INIT_ARGS) -- must land in the
# environment before the first JAX backend touch; importing the package
# is the earliest hook every entry point shares.  User values win;
# UDA_TPU_NO_TUNED_FLAGS=1 opts out.  See tpu_flags.py for the numbers.
from uda_aerial_semantic_segmentation_research_tpu.tpu_flags import (
    apply_tuned_tpu_flags as _apply_tuned_tpu_flags,
)

_apply_tuned_tpu_flags()

from uda_aerial_semantic_segmentation_research_tpu.config import Config

__all__ = ["Config", "__version__"]
