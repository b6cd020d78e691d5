"""Checkpoint serialization.

The reference checkpoints with ``torch.save``/``torch.load`` of dicts
holding tensors + metadata (reference src/models/train.py:491-499,
src/models/phase_manager.py:94-113).  Here checkpoints are framework-
neutral: every array is converted to numpy and the whole object is
pickled (protocol 4), so a checkpoint written on TPU loads anywhere
with no JAX/torch import.

``save_checkpoint`` is atomic (tmp file + rename) so an interrupted
write never corrupts the previous checkpoint -- the failure-recovery
property the reference lacks (SURVEY.md section 5.3).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from pathlib import Path
from typing import Any


def _to_numpy(obj: Any) -> Any:
    """Recursively convert array leaves (jax/np) to plain numpy arrays."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple (optax states)
        return type(obj)(*(_to_numpy(v) for v in obj))
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_to_numpy(v) for v in obj)
    if hasattr(obj, "__array__") and not isinstance(obj, (str, bytes)):
        arr = np.asarray(obj)
        # jax bfloat16 has no numpy pickle support; store as float32
        if arr.dtype.name == "bfloat16":
            arr = arr.astype(np.float32)
        return arr
    return obj


def save_checkpoint(obj: Any, path: str | os.PathLike) -> None:
    """Atomically pickle ``obj`` (arrays converted to numpy) to ``path``.

    Multi-host: only process 0 writes (training state is replicated, so
    every process holds the same values; N identical writers racing on a
    shared filesystem would be wasted IO at best).  Single-process runs
    are unaffected — the topology probe never initializes a backend.
    """
    from uda_aerial_semantic_segmentation_research_tpu.parallel.distributed import (
        is_primary,
    )

    if not is_primary():
        return
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = _to_numpy(obj)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str | os.PathLike) -> Any:
    """Load a checkpoint written by :func:`save_checkpoint`."""
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Orbax-backed async pytree checkpointing (large-scale runs)
# ---------------------------------------------------------------------------
class AsyncPytreeCheckpointer:
    """Asynchronous device-pytree checkpointing via Orbax.

    For production-scale runs: ``save`` returns as soon as the device
    arrays are snapshotted; serialization overlaps the next training
    steps (the TPU-native upgrade over the reference's synchronous
    torch.save, SURVEY.md section 5.4).  ``wait()`` blocks until all
    pending saves are durable; always call it before exiting.
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str | os.PathLike, pytree: Any) -> None:
        self._ckptr.save(os.path.abspath(path), args=_standard_args().StandardSave(pytree))

    def restore(self, path: str | os.PathLike, target: Any = None) -> Any:
        if target is not None:
            return self._ckptr.restore(
                os.path.abspath(path),
                args=_standard_args().StandardRestore(target))
        return self._ckptr.restore(os.path.abspath(path))

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def _standard_args():
    import orbax.checkpoint as ocp

    return ocp.args
