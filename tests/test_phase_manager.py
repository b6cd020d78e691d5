"""PhaseManager lifecycle contract tests.

Asserts the exact behavioral contract of reference
src/models/phase_manager.py as exercised by the reference harness
(src/test_system.py:460-516): metadata schema, gated transitions,
best/latest checkpoints, discriminator state inclusion, GC.
"""

import json

import numpy as np
import pytest

from uda_aerial_semantic_segmentation_research_tpu.training.phase_manager import (

    PhaseManager,
    TrainingPhase,
)

# no jitted-model compiles here: part of the <3-min smoke tier
pytestmark = pytest.mark.smoke


class FakeModel:
    """Minimal state_dict surface (stands in for ModelBundle)."""

    def __init__(self):
        self.state = {"w": np.ones(3, np.float32)}

    def state_dict(self):
        return dict(self.state)

    def load_state_dict(self, state, strict=True):
        self.state = dict(state)
        return self


class FakeTrainer:
    discriminator = FakeModel()


@pytest.fixture
def pm(tmp_path):
    return PhaseManager(model=FakeModel(), device="cpu",
                        checkpoints_dir=str(tmp_path))


def test_initial_state_and_metadata(pm):
    assert pm.get_current_phase() == TrainingPhase.SEGMENTATION
    assert pm.metadata_path.exists()
    md = json.loads(pm.metadata_path.read_text())
    assert md["current_phase"] == "SEGMENTATION"
    assert md["phases_completed"] == []
    assert md["phase_transitions"] == []
    assert md["best_metrics"] == {}
    assert "start_time" in md
    for d in pm.phase_dirs.values():
        assert d.exists()


def test_save_load_checkpoint(pm):
    metrics = {"iou": 0.6, "accuracy": 0.85}
    pm.save_checkpoint(FakeTrainer(), metrics, TrainingPhase.SEGMENTATION,
                       is_best=True)
    path = pm.phase_dirs[TrainingPhase.SEGMENTATION] / "best_model.pth"
    assert path.exists()
    md = pm._load_metadata()
    assert md["best_metrics"]["SEGMENTATION"] == metrics

    ckpt = pm.load_checkpoint(TrainingPhase.SEGMENTATION, load_best=True)
    assert ckpt is not None
    assert "model_state_dict" in ckpt and "metrics" in ckpt
    assert pm._load_metadata()["last_loaded_checkpoint"]["phase"] == "SEGMENTATION"


def test_discriminator_state_in_phase2_checkpoint(pm):
    pm.save_checkpoint(FakeTrainer(), {"iou": 0.5}, TrainingPhase.ADVERSARIAL)
    from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    ckpt = load_checkpoint(
        pm.phase_dirs[TrainingPhase.ADVERSARIAL] / "latest_model.pth")
    assert "discriminator_state_dict" in ckpt


def test_transition_gates(pm):
    # P1 -> P2 requires iou > 0.5 AND accuracy > 0.75
    assert not pm.can_transition({"iou": 0.6, "accuracy": 0.7})
    assert not pm.can_transition({"iou": 0.4, "accuracy": 0.9})
    assert pm.can_transition({"iou": 0.6, "accuracy": 0.85})

    assert pm.transition_to_next_phase() == TrainingPhase.ADVERSARIAL
    md = pm._load_metadata()
    assert "SEGMENTATION" in md["phases_completed"]
    assert md["phase_transitions"][-1]["to_phase"] == "ADVERSARIAL"

    # P2 -> P3 requires domain_confusion > 0.4 AND iou > 0.45
    assert not pm.can_transition({"domain_confusion": 0.3, "iou": 0.5})
    assert not pm.can_transition({"domain_confusion": 0.5, "iou": 0.4})
    assert pm.can_transition({"domain_confusion": 0.5, "iou": 0.5})
    assert pm.transition_to_next_phase() == TrainingPhase.FINE_TUNING
    # no transition beyond P3
    assert not pm.can_transition({"iou": 1.0, "accuracy": 1.0,
                                  "domain_confusion": 1.0})


def test_missing_checkpoint_returns_none(pm):
    assert pm.load_checkpoint(TrainingPhase.FINE_TUNING) is None


def test_cleanup_old_checkpoints(pm):
    d = pm.phase_dirs[TrainingPhase.SEGMENTATION]
    pm.save_checkpoint(FakeTrainer(), {}, TrainingPhase.SEGMENTATION, is_best=True)
    pm.save_checkpoint(FakeTrainer(), {}, TrainingPhase.SEGMENTATION, is_best=False)
    (d / "stale_model.pth").write_bytes(b"x")
    pm.cleanup_old_checkpoints()
    names = {f.name for f in d.glob("*.pth")}
    assert names == {"best_model.pth", "latest_model.pth"}


def test_resume_restores_phase_and_weights(tmp_path):
    """PhaseManager.resume rebinds an experiment dir, restores the
    current phase, and reloads the newest checkpoint into the model."""
    m1 = FakeModel()
    pm = PhaseManager(model=m1, device="cpu", checkpoints_dir=str(tmp_path))
    m1.state = {"w": np.full(3, 7.0, np.float32)}
    pm.save_checkpoint(FakeTrainer(), {"iou": 0.6, "accuracy": 0.9},
                       TrainingPhase.SEGMENTATION, is_best=True)
    pm.transition_to_next_phase()
    assert pm.get_current_phase() == TrainingPhase.ADVERSARIAL

    m2 = FakeModel()  # fresh model with default weights
    pm2 = PhaseManager.resume(model=m2, device="cpu",
                              experiment_dir=str(pm.experiment_dir))
    assert pm2.get_current_phase() == TrainingPhase.ADVERSARIAL
    # phase-2 has no checkpoint yet -> falls back to phase-1 best
    np.testing.assert_array_equal(m2.state["w"], np.full(3, 7.0, np.float32))
    assert pm2.phases_completed() == ["SEGMENTATION"]


def test_resume_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        PhaseManager.resume(model=FakeModel(), experiment_dir=str(tmp_path / "nope"))


def test_resume_restores_discriminator_state(tmp_path):
    """Phase-2/3 resume must restore the saved discriminator, not leave
    the adversary to restart from scratch (ADVICE round 1; the
    reference shares this hole, src/models/phase_manager.py:115-151)."""
    m1 = FakeModel()
    pm = PhaseManager(model=m1, device="cpu", checkpoints_dir=str(tmp_path))
    pm.transition_to_next_phase()  # -> ADVERSARIAL

    trainer = FakeTrainer()
    trainer.discriminator = FakeModel()
    trainer.discriminator.state = {"w": np.full(3, 5.0, np.float32)}
    pm.save_checkpoint(trainer, {"iou": 0.5}, TrainingPhase.ADVERSARIAL,
                       is_best=True)

    pm2 = PhaseManager.resume(model=FakeModel(), device="cpu",
                              experiment_dir=str(pm.experiment_dir))
    assert pm2.last_checkpoint is not None
    assert "discriminator_state_dict" in pm2.last_checkpoint

    fresh_disc = FakeModel()
    assert pm2.load_discriminator_state(fresh_disc)
    np.testing.assert_array_equal(fresh_disc.state["w"],
                                  np.full(3, 5.0, np.float32))

    # a phase-1-only experiment has no discriminator to restore
    m3 = FakeModel()
    pm3 = PhaseManager(model=m3, device="cpu", checkpoints_dir=str(tmp_path))
    pm3.save_checkpoint(FakeTrainer(), {}, TrainingPhase.SEGMENTATION,
                        is_best=True)
    pm4 = PhaseManager.resume(model=FakeModel(), device="cpu",
                              experiment_dir=str(pm3.experiment_dir))
    assert not pm4.load_discriminator_state(FakeModel())
