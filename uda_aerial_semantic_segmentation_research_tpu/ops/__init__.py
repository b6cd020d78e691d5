"""Pure compute ops: on-device augmentation, losses, metrics, kernels.

- ``augment``        batched device-side augmentation pipelines
- ``losses``         task losses as pure jittable functions
- ``metrics``        confusion-matrix metrics + DA accumulators
- ``upsample_conv``  exact phase-decomposed upsample2x+conv3x3
- ``pallas_ops``     Pallas TPU kernels (import lazily -- pulls in
                     jax.experimental.pallas)
"""

from uda_aerial_semantic_segmentation_research_tpu.ops import (
    augment,
    losses,
    metrics,
    upsample_conv,
)

__all__ = ["augment", "losses", "metrics", "upsample_conv", "pallas_ops"]


def __getattr__(name):
    if name == "pallas_ops":
        from uda_aerial_semantic_segmentation_research_tpu.ops import (
            pallas_ops,
        )

        return pallas_ops
    raise AttributeError(name)
