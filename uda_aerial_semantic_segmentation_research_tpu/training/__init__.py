"""Training: pytree states, jitted step functions, trainers, phase lifecycle.

TPU-first layering (SURVEY.md section 7 design stance):

- ``state``    -- immutable pytree ``TrainState``s (params, batch_stats,
                  optimizer state); no stateful trainer objects on the
                  compute path.
- ``steps``    -- pure jitted step-function factories.  The three
  training phases differ only in the loss the step closes over; data
  augmentation runs batched *inside* the step.
- ``train`` / ``adversarial_trainer`` / ``unsupervised_trainer`` --
  user-facing trainer classes mirroring the reference API
  (reference src/models/{train,adversarial_trainer,unsupervised_trainer}.py),
  thin epoch drivers around the jitted steps.
- ``phase_manager`` / ``trainer_phases`` -- checkpoint/resume + phase
  lifecycle state machine (reference src/models/phase_manager.py) and the
  self-contained multi-phase trainer (reference src/models/trainer_phases.py).
"""

from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    AdversarialState,
    TrainState,
)
from uda_aerial_semantic_segmentation_research_tpu.training.train import (
    EarlyStopping,
    SegmentationTrainer,
    launch_tensorboard,
    load_class_dict,
    train_model,
)
from uda_aerial_semantic_segmentation_research_tpu.training.adversarial_trainer import (
    AdversarialTrainer,
)
from uda_aerial_semantic_segmentation_research_tpu.training.unsupervised_trainer import (
    UnsupervisedTrainer,
)
from uda_aerial_semantic_segmentation_research_tpu.training.phase_manager import (
    PhaseManager,
    TrainingPhase,
)
from uda_aerial_semantic_segmentation_research_tpu.training.trainer_phases import (
    MultiPhaseTrainer,
)

__all__ = [
    "TrainState", "AdversarialState", "EarlyStopping", "SegmentationTrainer",
    "AdversarialTrainer", "UnsupervisedTrainer", "PhaseManager",
    "TrainingPhase", "MultiPhaseTrainer", "train_model", "load_class_dict",
    "launch_tensorboard", "run_pipeline",
]


def run_pipeline(*args, **kwargs):
    """Three-phase pipeline entry point (lazy import, see training/pipeline.py)."""
    from uda_aerial_semantic_segmentation_research_tpu.training.pipeline import (
        run_pipeline as _run,
    )

    return _run(*args, **kwargs)
