"""Multi-host (multi-process) execution over a global device mesh.

The reference is strictly single-process, single-device — no
torch.distributed/NCCL/MPI anywhere (SURVEY.md sections 2.2 and 5.8).
On TPU the natural scale-out beyond one host (a v5e slice larger than
v5e-8) runs ONE Python process per host; ``jax.distributed`` stitches
every process's local chips into one global device set, and the same
SPMD-partitioned train steps run unchanged — the XLA partitioner lays
the gradient ``psum`` and cross-replica BatchNorm reductions over ICI
across all hosts.  This module owns that lifecycle:

- :func:`initialize` — env-gated ``jax.distributed.initialize`` entry.
  Call it before the first device touch on EVERY process.
- :func:`shard_dataset` / :func:`process_shard_indices` — which slice of
  the dataset THIS process feeds (the reference's DataLoader analogue of
  a DistributedSampler, which the reference never had).
- :func:`global_batch` — assemble the global, ``P('data')``-sharded
  ``jax.Array`` from each process's local batch
  (``jax.make_array_from_process_local_data``).
- :func:`replicate_global` — replicate a host pytree across ALL
  processes' devices (``jax.make_array_from_callback``; a plain
  ``device_put`` cannot address other processes' devices).
- :func:`is_primary` — checkpoint/TensorBoard writes happen on process 0
  only (``utils.checkpoint.save_checkpoint`` and the TB logger consult
  this); :func:`barrier` for cross-process sync points.

Verification without a multi-host slice: ``dryrun_multihost()`` spawns
N coordinated CPU processes on localhost (each with a virtual device
count), runs the real supervised train step over the global mesh, and
asserts the resulting params/loss match a single-process run of the
identical global batch to within a fraction of one optimizer update
(the cross-process psum only reassociates the float reduction) — the
N-process == 1-process gradient-equivalence contract
(tests/test_distributed.py); ``mode="pipeline"`` drives the full
three-phase pipeline across the processes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

__all__ = [
    "initialize",
    "is_initialized",
    "process_count",
    "process_index",
    "is_primary",
    "local_batch_size",
    "process_shard_indices",
    "shard_dataset",
    "align_local_batch",
    "broadcast_from_primary",
    "local_mesh_device_count",
    "global_batch",
    "replicate_global",
    "host_array",
    "barrier",
    "dryrun_multihost",
]

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None,
               env=os.environ) -> bool:
    """Initialize the JAX distributed runtime for this process.

    Resolution order (first match wins):

    1. Explicit arguments (``coordinator_address`` + ``num_processes`` +
       ``process_id``).
    2. ``UDA_TPU_COORDINATOR`` / ``UDA_TPU_NUM_PROCESSES`` /
       ``UDA_TPU_PROCESS_ID`` environment variables.
    3. ``UDA_TPU_MULTIHOST=1`` — let JAX auto-detect the cluster (the
       TPU-pod path: on Cloud TPU the coordinator and process ids come
       from the metadata server).
    4. Otherwise: no-op, single-process semantics (returns ``False``).

    Idempotent: a second call after successful initialization is a
    no-op returning ``True``.  Must run before the first JAX device
    touch (backend initialization binds the process topology).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    if coordinator_address is None and env.get("UDA_TPU_COORDINATOR"):
        coordinator_address = env["UDA_TPU_COORDINATOR"]
        num_processes = int(env.get("UDA_TPU_NUM_PROCESSES", "0")) or None
        pid = env.get("UDA_TPU_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    auto = env.get("UDA_TPU_MULTIHOST") == "1"
    if coordinator_address is None and not auto:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def is_initialized() -> bool:
    return _INITIALIZED


def _jax_or_none():
    """jax iff it is already imported — never force a backend init just
    to answer a topology question from single-process code paths."""
    import sys

    return sys.modules.get("jax")


def process_count() -> int:
    jax = _jax_or_none()
    return jax.process_count() if jax is not None else 1


def process_index() -> int:
    jax = _jax_or_none()
    return jax.process_index() if jax is not None else 0


def is_primary() -> bool:
    """True on the process that owns checkpoint/log writes (process 0)."""
    return process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of a global batch (must divide evenly)."""
    n = process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    return global_batch_size // n


def process_shard_indices(num_items: int,
                          index: Optional[int] = None,
                          count: Optional[int] = None,
                          even: bool = False) -> range:
    """Contiguous index range of a dataset that THIS process loads.

    Every process must see the same ``num_items``; shards are contiguous
    (tile caches stay local).  Two modes:

    - ``even=False``: shards cover the dataset exactly, with the first
      ``num_items % count`` processes taking one extra item.  Use for
      work that tolerates ragged per-process lengths (offline scans).
    - ``even=True``: every shard is exactly ``num_items // count`` items
      (the trailing remainder is dropped — DistributedSampler-style even
      division).  **Training loaders must use this**: with ragged shards
      and ``drop_last`` a process whose one-extra-item shard crosses a
      batch-size multiple would run one more SPMD step per epoch than
      its peers — a mid-epoch distributed hang (the collective the other
      processes never join).  Equal shard lengths make every process's
      batches-per-epoch identical by construction.
    """
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    base, extra = divmod(num_items, count)
    if even:
        start = index * base
        return range(start, start + base)
    start = index * base + min(index, extra)
    return range(start, start + base + (1 if index < extra else 0))


def shard_dataset(dataset, index: Optional[int] = None,
                  count: Optional[int] = None, even: bool = False):
    """This process's contiguous ``Subset`` view of ``dataset``.

    ``even=True`` equalizes shard lengths across processes (required for
    training loaders — see :func:`process_shard_indices`).
    """
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        Subset,
    )

    idx = process_shard_indices(len(dataset), index, count, even=even)
    if len(idx) == len(dataset):
        return dataset
    return Subset(dataset, list(idx))


def align_local_batch(n: int, arrays):
    """Make every array's leading dim a positive multiple of ``n``.

    Multi-process trailing-batch handling for the trainers' ``_place``:
    a ragged local batch cannot fall back to host numpy there (mixing
    locally-committed inputs with non-addressable global state fails
    with an incompatible-devices error), so align it — each array
    independently (leading dims may legitimately differ, e.g. a target
    batch next to a short trailing supervised batch): trim ``b`` to
    ``n * (b // n)`` rows, or, when ``b < n``, pad by cycling rows up to
    ``n`` (a slightly oversampled final batch beats dropping it).  With
    even dataset shards (``shard_dataset(even=True)``) every process
    sees the same loader length and batch shapes, so this alignment is
    identical everywhere and no process skips a collective.
    """
    import numpy as np

    def fix(a):
        if a is None:
            return None
        b = a.shape[0]
        if b % n == 0:
            return a
        if b >= n:
            return a[:n * (b // n)]
        return a[np.arange(n) % b]

    return type(arrays)(fix(a) for a in arrays)


def broadcast_from_primary(values):
    """Process 0's ``values`` (host array/pytree) on EVERY process;
    identity when single-process.

    For control-flow inputs that cannot be made bit-identical everywhere
    by construction — e.g. validation terms scored on process-local
    batches of a sharded/shuffled loader — broadcasting process 0's
    result keeps early-stopping counters, best-checkpoint selection and
    phase gates in lockstep across hosts (a process whose control flow
    diverges stops joining the others' collectives: a distributed hang).
    """
    if process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(values)


def local_mesh_device_count(mesh) -> int:
    """How many of ``mesh``'s devices this process hosts."""
    if process_count() == 1:
        return int(mesh.devices.size)
    import jax

    pi = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == pi)


def global_batch(arrays, mesh=None):
    """Assemble global batch array(s) from this process's LOCAL batch.

    Each process passes its own (local_B, ...) numpy batch; the result is
    one global ``jax.Array`` of shape (local_B * process_count, ...),
    sharded ``P('data')`` over the full mesh, of which this process only
    ever materializes its addressable shards.  Single-process this is
    exactly ``mesh.shard_batch`` (and delegates to it).
    """
    from uda_aerial_semantic_segmentation_research_tpu.parallel import (
        mesh as mesh_lib,
    )

    if process_count() == 1:
        return mesh_lib.shard_batch(arrays, mesh)

    import jax

    mesh = mesh or mesh_lib.default_mesh()
    sharding = mesh_lib.batch_sharding(mesh)

    def put(a):
        if a is None:
            return None
        local_devices = local_mesh_device_count(mesh)
        if local_devices == 0 or a.shape[0] % local_devices:
            raise ValueError(
                f"local batch dim {a.shape[0]} not divisible by this "
                f"process's {local_devices} mesh devices")
        return jax.make_array_from_process_local_data(sharding, a)

    if isinstance(arrays, (tuple, list)):
        return type(arrays)(put(a) for a in arrays)
    return put(arrays)


def _tree_fingerprint(tree):
    """Per-leaf crc32 digest (bytes + shape + dtype) as a uint32 vector.

    Cheap cross-process identity check: bitwise-identical host trees
    (same seed init, same checkpoint) produce identical digests; any
    divergent leaf flips its crc.  PRNG-key leaves digest their
    underlying uint32 key data.
    """
    import zlib

    import jax
    import numpy as np

    def digest(a):
        if hasattr(a, "dtype") and jax.dtypes.issubdtype(
                a.dtype, jax.dtypes.prng_key):
            a = jax.random.key_data(a)
        a = np.ascontiguousarray(np.asarray(a))
        meta = f"{a.shape}:{a.dtype}".encode()
        return np.uint32(zlib.crc32(a.tobytes(), zlib.crc32(meta)))

    return np.asarray([digest(a) for a in jax.tree.leaves(tree)])


def replicate_global(tree, mesh=None):
    """Replicate a host-resident pytree across ALL processes' devices.

    Every process must hold an identical copy of ``tree`` (e.g. params
    initialized from the same seed, or a checkpoint loaded everywhere);
    this is asserted cheaply via a cross-process fingerprint when the
    runtime is distributed (per-leaf crc32 compared through
    ``multihost_utils.assert_equal``; set ``UDA_TPU_SKIP_REPLICA_CHECK=1``
    to opt out).  ``jax.device_put`` can only address local
    devices, so the multi-process path builds each global array from a
    callback that serves every addressable shard the full host value.
    """
    from uda_aerial_semantic_segmentation_research_tpu.parallel import (
        mesh as mesh_lib,
    )

    if process_count() == 1:
        return mesh_lib.replicate(tree, mesh)

    import jax
    import numpy as np

    if os.environ.get("UDA_TPU_SKIP_REPLICA_CHECK") != "1":
        from jax.experimental import multihost_utils

        multihost_utils.assert_equal(
            _tree_fingerprint(tree),
            "replicate_global: host trees differ across processes "
            "(divergent init/checkpoint state — every process must hold "
            "an identical copy before replication)")

    mesh = mesh or mesh_lib.default_mesh()
    sharding = mesh_lib.replicated_sharding(mesh)

    def put(a):
        if hasattr(a, "dtype") and jax.dtypes.issubdtype(
                a.dtype, jax.dtypes.prng_key):
            # typed PRNG keys can't round-trip through numpy: replicate
            # the underlying uint32 data, then re-wrap (sharding-preserving)
            data = put(jax.random.key_data(a))
            return jax.jit(
                jax.random.wrap_key_data, out_shardings=sharding)(data)
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree.map(put, tree)


def host_array(a):
    """The full numpy value of ``a``, available on EVERY process.

    Plain ``np.asarray`` when single-process, replicated, or fully
    addressable; for process-sharded global arrays (e.g. per-batch
    discriminator probabilities feeding a host-side streaming
    accumulator) this all-gathers across processes so every host sees
    the whole batch — keeping accumulators identical everywhere, which
    the no-collective validation design relies on.
    """
    import numpy as np

    if not hasattr(a, "sharding") or process_count() == 1:
        return np.asarray(a)
    if a.sharding.is_fully_replicated or a.is_fully_addressable:
        return np.asarray(a)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(a, tiled=True))


def barrier(name: str = "uda_tpu_barrier") -> None:
    """Block until every process reaches this point (no-op single-proc)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


# ---------------------------------------------------------------------------
# localhost dry run: N coordinated CPU processes, gradient equivalence
# ---------------------------------------------------------------------------
_WORKER_ENTRY = "uda_aerial_semantic_segmentation_research_tpu.parallel.distributed"


def _worker_main(argv) -> None:
    """Entry for one dryrun process (spawned by :func:`dryrun_multihost`).

    Usage: python -m ...parallel.distributed worker <coord> <nprocs> <pid>
           <devices_per_proc> <global_batch> <out_dir> [mode]
    """
    coord, nprocs, pid, dev_per_proc, global_b, out_dir = argv[:6]
    mode = argv[6] if len(argv) > 6 else "step"
    nprocs, pid = int(nprocs), int(pid)
    dev_per_proc, global_b = int(dev_per_proc), int(global_b)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dev_per_proc}")

    import jax

    # remote-TPU environments (axon) register their plugin from
    # sitecustomize and set jax_platforms at interpreter start, silently
    # overriding the env var -- pin the CPU backend via config (the same
    # lesson as __graft_entry__.dryrun_multichip / tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    initialize(coordinator_address=coord, num_processes=nprocs,
               process_id=pid)

    import jax
    import numpy as np

    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs * dev_per_proc

    if mode == "pipeline":
        _pipeline_worker(global_b, out_dir)
    else:
        state, metrics = _equivalence_step(global_b)
        spatial_ok = _spatial_check()
        if is_primary():
            from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
                save_checkpoint,
            )

            save_checkpoint(
                {"params": state.params, "loss": float(metrics["loss"]),
                 "iou": float(metrics["iou"]), "spatial_ok": spatial_ok},
                os.path.join(out_dir, "multihost_result.pth"))
    barrier("dryrun_done")


def _spatial_check() -> bool:
    """Height-sharded forward with the SPACE axis spanning ALL processes:
    the conv halo exchanges (boundary rows) cross the host boundary.
    Every process computes the unsharded reference locally and compares
    against the all-gathered sharded output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_unet,
    )
    from uda_aerial_semantic_segmentation_research_tpu.parallel.spatial import (
        spatial_forward,
        spatial_mesh,
    )

    size, classes = 32, 7
    bundle = create_unet(encoder_name="resnet18", encoder_weights=None,
                         classes=classes, image_size=size, seed=0,
                         dtype=jnp.float32)
    mesh = spatial_mesh(1, jax.device_count())   # height across every host
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, size, size, 3)).astype(np.float32)
    ref = np.asarray(bundle.module.apply(bundle.variables, jnp.asarray(x),
                                         train=False))
    out = host_array(spatial_forward(bundle.module, bundle.variables, x, mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    return True


def _pipeline_worker(global_b: int, out_dir: str) -> None:
    """Run the FULL three-phase pipeline (1 epoch/phase, tiny shapes)
    across the distributed topology: per-process dataset shards, mesh-
    engaged trainers over the global device set, full val on every
    process, process-0 checkpoint/metadata/TB writes.  Uses the repo's
    synthetic fixtures (cwd must be the repo root)."""
    import json

    os.environ["UDA_TPU_IMAGE_SIZE"] = "32"
    os.environ["UDA_TPU_ENCODER"] = "resnet18"
    # per-process batch = local device count (1 sample/device)
    import jax

    os.environ["UDA_TPU_BATCH_SIZE"] = str(jax.local_device_count())

    from uda_aerial_semantic_segmentation_research_tpu.training.pipeline import (
        run_pipeline,
    )

    summary = run_pipeline(phase1_epochs=1, phase2_epochs=1, phase3_epochs=1,
                           force_transitions=True,
                           checkpoints_dir=os.path.join(out_dir, "ckpt"))
    if is_primary():
        with open(os.path.join(out_dir, "multihost_pipeline.json"), "w") as f:
            json.dump({"final_phase": summary.get("final_phase"),
                       "phases": sorted(summary.get("phases", {}))}, f)


def _equivalence_step(global_b: int):
    """One supervised train step on the deterministic equivalence fixture.

    Runs on whatever topology is active: the global batch is generated
    identically on every process from a fixed seed; distributed processes
    feed only their slice via :func:`global_batch`.  Returns the updated
    state (params replicated) and metrics.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_unet,
    )
    from uda_aerial_semantic_segmentation_research_tpu.parallel.mesh import (
        create_mesh,
    )
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        steps as step_lib,
    )
    from uda_aerial_semantic_segmentation_research_tpu.training.state import (
        TrainState,
        adam,
    )

    size, classes = 32, 7
    bundle = create_unet(encoder_name="resnet18", encoder_weights=None,
                         classes=classes, image_size=size, seed=0,
                         dtype=jnp.float32)
    mesh = create_mesh()
    state = TrainState.from_bundle(bundle, adam(1e-3))
    state = replicate_global(state, mesh)

    rng = np.random.default_rng(123)
    images = rng.integers(0, 255, (global_b, size, size, 3)).astype(np.uint8)
    masks = rng.integers(0, classes, (global_b, size, size)).astype(np.int32)
    lo = process_index() * local_batch_size(global_b)
    hi = lo + local_batch_size(global_b)
    batch = global_batch((images[lo:hi], masks[lo:hi]), mesh)
    key = replicate_global(jax.random.key(7), mesh)

    step = step_lib.make_supervised_train_step(bundle.module, classes)
    return step(state, key, *batch)


def dryrun_multihost(num_processes: int = 2, devices_per_process: int = 4,
                     global_batch_size: int = 8, out_dir: Optional[str] = None,
                     timeout: float = 600.0, mode: str = "step") -> dict:
    """Spawn ``num_processes`` coordinated localhost CPU processes and run
    distributed work over the global mesh.

    ``mode="step"`` (default): one data-parallel supervised step plus a
    cross-host height-sharded forward check; returns process 0's
    ``{params, loss, iou, spatial_ok}`` for equivalence checks.
    ``mode="pipeline"``: the full three-phase pipeline at tiny shapes
    (1 epoch/phase, repo fixtures; run from the repo root) — per-process
    dataset shards, mesh-engaged trainers, process-0 writes; returns
    process 0's ``{final_phase, phases}`` summary.
    """
    import socket
    import subprocess
    import sys
    import tempfile

    from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    own_dir = out_dir is None
    out_dir = out_dir or tempfile.mkdtemp(prefix="uda_multihost_")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "UDA_TPU_COORDINATOR")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", _WORKER_ENTRY, "worker", coord,
             str(num_processes), str(pid), str(devices_per_process),
             str(global_batch_size), out_dir, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(num_processes)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outputs):
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost worker failed (rc={p.returncode}):\n"
                f"{out[-4000:]}")
    if mode == "pipeline":
        import json

        with open(os.path.join(out_dir, "multihost_pipeline.json")) as f:
            result = json.load(f)
    else:
        result = load_checkpoint(os.path.join(out_dir, "multihost_result.pth"))
    if own_dir:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    return result


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        _worker_main(sys.argv[2:])
    elif len(sys.argv) > 1 and sys.argv[1] == "pipeline":
        res = dryrun_multihost(mode="pipeline", timeout=1500.0)
        print(f"dryrun_multihost(2x4, pipeline): "
              f"final_phase={res['final_phase']} "
              f"phases={res['phases']} — OK")
    else:
        res = dryrun_multihost()
        print(f"dryrun_multihost(2x4): loss={res['loss']:.4f} "
              f"iou={res['iou']:.4f} — OK")
