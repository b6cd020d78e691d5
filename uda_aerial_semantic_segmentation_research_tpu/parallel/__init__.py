"""SPMD parallelism over a TPU device mesh.

The reference is strictly single-device (no torch.distributed / NCCL /
MPI anywhere -- SURVEY.md section 2.2).  Scaling here is TPU-native:

- one ``jax.sharding.Mesh`` over the slice with a ``data`` axis,
- batches sharded ``P('data')``, params/optimizer state replicated,
- the jitted train step is written once for the GLOBAL batch; XLA's
  SPMD partitioner inserts the gradient all-reduce (``psum``) and the
  cross-chip BatchNorm moment reduction over ICI automatically,
- eval confusion-matrix histograms add elementwise, so distributed
  eval is the same step function under the same mesh,
- beyond one host (v5e-16+): one process per host, stitched into the
  same global mesh by ``parallel.distributed`` (jax.distributed init,
  per-process dataset shards, ``make_array_from_process_local_data``
  batch assembly, process-0 checkpoint/log writes).
"""

from uda_aerial_semantic_segmentation_research_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    default_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

from uda_aerial_semantic_segmentation_research_tpu.parallel.spatial import (
    spatial_forward,
    spatial_image_sharding,
    spatial_mesh,
)

from uda_aerial_semantic_segmentation_research_tpu.parallel import (  # noqa: F401
    distributed,
)

__all__ = [
    "create_mesh",
    "default_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "spatial_mesh",
    "spatial_image_sharding",
    "spatial_forward",
    "distributed",
]
