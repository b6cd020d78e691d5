"""Phase lifecycle state machine + checkpoint/resume.

Counterpart of reference src/models/phase_manager.py:10-233, preserving
the exact behavioral contract the system tests assert on
(reference src/test_system.py:460-516):

- timestamped experiment dir with ``phase{1,2,3}_*`` subdirectories,
- ``training_metadata.json`` with start_time / phases_completed /
  current_phase / phase_transitions / best_metrics (+
  last_loaded_checkpoint after loads),
- ``best_model.pth`` / ``latest_model.pth`` per phase, with the
  discriminator state included for phases 2/3,
- metric-gated transitions: P1->P2 requires iou>0.5 and accuracy>0.75,
  P2->P3 requires domain_confusion>0.4 and iou>0.45,
- checkpoint GC keeping best/latest.

Checkpoints are framework-neutral numpy pickles (utils/checkpoint.py)
written atomically -- the reference's torch.save equivalent.
"""

from __future__ import annotations

import datetime
import json
from enum import Enum, auto
from pathlib import Path
from typing import Any, Dict, Optional

from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


class TrainingPhase(Enum):
    """Training phases (reference phase_manager.py:10-16)."""

    SEGMENTATION = auto()   # phase 1: supervised segmentation
    ADVERSARIAL = auto()    # phase 2: adversarial domain adaptation
    FINE_TUNING = auto()    # phase 3: unsupervised fine-tuning


class PhaseManager:
    """Manages training phases, transitions, and per-phase checkpoints."""

    def __init__(self, model, device=None, checkpoints_dir: str = "checkpoints"):
        self.model = model
        self.device = device
        self.checkpoints_dir = Path(checkpoints_dir)
        self.current_phase = TrainingPhase.SEGMENTATION
        self.phase_metrics: Dict[str, Any] = {}
        self.last_checkpoint: Optional[Dict[str, Any]] = None

        timestamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
        self.experiment_dir = self.checkpoints_dir / timestamp
        self.phase_dirs = {
            TrainingPhase.SEGMENTATION: self.experiment_dir / "phase1_segmentation",
            TrainingPhase.ADVERSARIAL: self.experiment_dir / "phase2_adversarial",
            TrainingPhase.FINE_TUNING: self.experiment_dir / "phase3_finetuning",
        }
        for d in self.phase_dirs.values():
            d.mkdir(parents=True, exist_ok=True)

        self.metadata_path = self.experiment_dir / "training_metadata.json"
        self._initialize_metadata()

    # ------------------------------------------------------------------
    @classmethod
    def resume(cls, model, device=None, experiment_dir: str = None,
               load_best: bool = True) -> "PhaseManager":
        """Rebind to an existing experiment directory and reload weights.

        Restores ``current_phase`` from training_metadata.json and loads
        the current phase's best (or latest) checkpoint into ``model``
        (falling back to the most recent phase that has one).  The
        reference supports per-phase checkpoint loading but has no
        resume entry point (SURVEY.md section 5.4); this completes it.

        Phase-2/3 checkpoints also carry ``discriminator_state_dict``
        (reference src/models/phase_manager.py:102-104); the loaded
        checkpoint is kept on ``self.last_checkpoint`` so callers can
        restore the discriminator too (see
        ``load_discriminator_state``) -- resuming must not restart the
        adversary from scratch.
        """
        pm = cls.__new__(cls)
        pm.model = model
        pm.device = device
        pm.experiment_dir = Path(experiment_dir)
        pm.checkpoints_dir = pm.experiment_dir.parent
        pm.phase_metrics = {}
        pm.last_checkpoint = None
        pm.phase_dirs = {
            TrainingPhase.SEGMENTATION: pm.experiment_dir / "phase1_segmentation",
            TrainingPhase.ADVERSARIAL: pm.experiment_dir / "phase2_adversarial",
            TrainingPhase.FINE_TUNING: pm.experiment_dir / "phase3_finetuning",
        }
        pm.metadata_path = pm.experiment_dir / "training_metadata.json"
        if not pm.metadata_path.exists():
            raise FileNotFoundError(
                f"no training_metadata.json under {experiment_dir}")
        md = pm._load_metadata()
        pm.current_phase = TrainingPhase[md.get("current_phase", "SEGMENTATION")]

        # load the most recent phase that has a checkpoint, newest first
        order = [TrainingPhase.SEGMENTATION, TrainingPhase.ADVERSARIAL,
                 TrainingPhase.FINE_TUNING]
        candidates = [p for p in order if order.index(p)
                      <= order.index(pm.current_phase)][::-1]
        for phase in candidates:
            ckpt = (pm.load_checkpoint(phase, load_best=load_best)
                    or pm.load_checkpoint(phase, load_best=not load_best))
            if ckpt is not None:
                break
        return pm

    def phases_completed(self):
        """Names of phases recorded complete in the metadata."""
        return list(self._load_metadata().get("phases_completed", []))

    # ------------------------------------------------------------------
    def _initialize_metadata(self):
        self._save_metadata({
            "start_time": datetime.datetime.now().isoformat(),
            "phases_completed": [],
            "current_phase": self.current_phase.name,
            "phase_transitions": [],
            "best_metrics": {},
        })

    def _save_metadata(self, metadata: Dict[str, Any]):
        # multi-host: metadata follows the checkpoint-ownership rule --
        # process 0 writes, others keep their in-memory copy (metrics
        # are computed on replicated values, so the copies agree)
        from uda_aerial_semantic_segmentation_research_tpu.parallel.distributed import (
            is_primary,
        )

        if not is_primary():
            return
        with open(self.metadata_path, "w") as f:
            json.dump(metadata, f, indent=4)

    def _load_metadata(self) -> Dict[str, Any]:
        if self.metadata_path.exists():
            with open(self.metadata_path) as f:
                return json.load(f)
        return {}

    # ------------------------------------------------------------------
    def save_checkpoint(self, trainer, metrics: Dict[str, float],
                        phase: TrainingPhase, is_best: bool = False):
        """Save a phase checkpoint (reference :75-113)."""
        checkpoint = {
            "model_state_dict": self.model.state_dict(),
            "metrics": metrics,
            "phase": phase.name,
            "timestamp": datetime.datetime.now().isoformat(),
        }
        if phase in (TrainingPhase.ADVERSARIAL, TrainingPhase.FINE_TUNING):
            disc = getattr(trainer, "discriminator", None)
            if disc is not None and hasattr(disc, "state_dict"):
                checkpoint["discriminator_state_dict"] = disc.state_dict()

        path = self.phase_dirs[phase] / (
            "best_model.pth" if is_best else "latest_model.pth")
        save_checkpoint(checkpoint, path)

        metadata = self._load_metadata()
        metadata["best_metrics"][phase.name] = (
            metrics if is_best else metadata["best_metrics"].get(phase.name, {}))
        self._save_metadata(metadata)

    def load_checkpoint(self, phase: TrainingPhase,
                        load_best: bool = True) -> Optional[Dict[str, Any]]:
        """Load a phase checkpoint into the model (reference :115-151)."""
        name = "best_model.pth" if load_best else "latest_model.pth"
        path = self.phase_dirs[phase] / name
        if not path.exists():
            return None

        checkpoint = load_checkpoint(path)
        self.model.load_state_dict(checkpoint["model_state_dict"])
        self.last_checkpoint = checkpoint

        metadata = self._load_metadata()
        metadata["last_loaded_checkpoint"] = {
            "phase": phase.name,
            "checkpoint_type": "best" if load_best else "latest",
            "timestamp": datetime.datetime.now().isoformat(),
        }
        self._save_metadata(metadata)
        return checkpoint

    def load_discriminator_state(self, discriminator) -> bool:
        """Restore the discriminator from the last loaded checkpoint.

        Returns True when a ``discriminator_state_dict`` was present and
        loaded.  Completes the resume path: the reference saves the
        discriminator for phases 2/3 but its loader restores only the
        model (reference src/models/phase_manager.py:115-151, same hole).
        """
        state = (self.last_checkpoint or {}).get("discriminator_state_dict")
        if state is None or discriminator is None:
            return False
        discriminator.load_state_dict(state)
        return True

    # ------------------------------------------------------------------
    def can_transition(self, metrics: Dict[str, float]) -> bool:
        """Metric gates for phase transitions (reference :153-172)."""
        if self.current_phase == TrainingPhase.SEGMENTATION:
            return (float(metrics.get("iou", 0)) > 0.5
                    and float(metrics.get("accuracy", 0)) > 0.75)
        if self.current_phase == TrainingPhase.ADVERSARIAL:
            return (float(metrics.get("domain_confusion", 0)) > 0.4
                    and float(metrics.get("iou", 0)) > 0.45)
        return False

    def transition_to_next_phase(self) -> TrainingPhase:
        """Advance to the next phase, recording the transition (reference :174-204)."""
        metadata = self._load_metadata()
        metadata["phases_completed"].append(self.current_phase.name)
        metadata["phase_transitions"].append({
            "from_phase": self.current_phase.name,
            "timestamp": datetime.datetime.now().isoformat(),
        })

        if self.current_phase == TrainingPhase.SEGMENTATION:
            self.current_phase = TrainingPhase.ADVERSARIAL
        elif self.current_phase == TrainingPhase.ADVERSARIAL:
            self.current_phase = TrainingPhase.FINE_TUNING

        metadata["current_phase"] = self.current_phase.name
        metadata["phase_transitions"][-1]["to_phase"] = self.current_phase.name
        self._save_metadata(metadata)
        return self.current_phase

    def get_current_phase(self) -> TrainingPhase:
        return self.current_phase

    def get_phase_metrics(self, phase: Optional[TrainingPhase] = None
                          ) -> Dict[str, Any]:
        phase = phase or self.current_phase
        return self._load_metadata().get("best_metrics", {}).get(phase.name, {})

    def cleanup_old_checkpoints(self, keep_best: bool = True,
                                keep_latest: bool = True):
        """Delete non-best/latest checkpoints (reference :220-233)."""
        for phase_dir in self.phase_dirs.values():
            for f in phase_dir.glob("*.pth"):
                if (keep_best and f.name == "best_model.pth") or (
                        keep_latest and f.name == "latest_model.pth"):
                    continue
                f.unlink()
