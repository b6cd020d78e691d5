"""Device mesh construction and sharding helpers.

Everything here is standard ``jax.sharding``: we pick the mesh, annotate
shardings on the global arrays, and let the XLA SPMD partitioner place
the collectives on ICI.  No hand-written communication backend exists or
is needed (the reference has none either; its analogue is plain
single-device execution, SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uda_aerial_semantic_segmentation_research_tpu.config import Config

_DEFAULT_MESH: Optional[Mesh] = None


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: Optional[str] = None) -> Mesh:
    """1-D data-parallel mesh over ``devices`` (default: all local devices)."""
    axis_name = axis_name or Config.MESH_AXIS
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def default_mesh() -> Mesh:
    """Process-wide default mesh (created lazily over all devices)."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None or set(_DEFAULT_MESH.devices.flat) != set(jax.devices()):
        _DEFAULT_MESH = create_mesh()
    return _DEFAULT_MESH


def batch_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Sharding that splits axis 0 (batch) across the data axis."""
    mesh = mesh or default_mesh()
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, scalars)."""
    mesh = mesh or default_mesh()
    return NamedSharding(mesh, P())


def shard_batch(arrays, mesh: Optional[Mesh] = None):
    """Place host batch array(s) on device, sharded along the batch axis.

    The loader guarantees static batch sizes divisible by the mesh size
    (``DataLoader(drop_last=True)`` + ``global_batch_size`` helper); this
    asserts rather than silently padding.
    """
    mesh = mesh or default_mesh()
    sharding = batch_sharding(mesh)
    n = mesh.devices.size

    def put(a):
        if a is None:
            return None
        if a.shape[0] % n:
            raise ValueError(
                f"batch dim {a.shape[0]} not divisible by mesh size {n}; "
                "use global_batch_size() and drop_last=True")
        return jax.device_put(a, sharding)

    if isinstance(arrays, (tuple, list)):
        return type(arrays)(put(a) for a in arrays)
    return put(arrays)


def replicate(tree, mesh: Optional[Mesh] = None):
    """Place a pytree on device fully replicated across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def global_batch_size(per_device: int, mesh: Optional[Mesh] = None) -> int:
    """per-device batch size -> global batch size for the current mesh."""
    mesh = mesh or default_mesh()
    return int(per_device) * int(mesh.devices.size)
