"""End-to-end trainer integration tests on tiny synthetic data (CPU).

Mirrors the reference's system-test scale-down strategy (epochs<=2,
tiny batches, reference src/test_system.py:212,617-657) at unit-test
sizes, covering the full trainer classes the step-level tests don't:
epoch loops, validation, early stopping wiring, checkpointing,
TB logging, and the MultiPhaseTrainer GRL path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import BATCH, CLASSES, SIZE

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def loaders(workspace):
    import os

    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
        random_split,
    )
    from uda_aerial_semantic_segmentation_research_tpu.data.loader import DataLoader
    from uda_aerial_semantic_segmentation_research_tpu.data.target_dataset import (
        TargetDataset,
    )

    # keep figure logging out of the hot loop (sklearn/mpl on 1 core)
    Config.LOG_INTERVAL = 1000

    ds = DroneDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        masks_dir=os.path.join(Config.SAMPLE_DATA_DIR, "label_images_semantic"),
        verbose=False)
    train_ds, val_ds = random_split(ds, [4, 2], seed=0)
    train_loader = DataLoader(train_ds, batch_size=2, drop_last=True)
    val_loader = DataLoader(val_ds, batch_size=2)
    tgt = TargetDataset(images_dir=Config.TARGET_DATA_DIR, verbose=False,
                        target_size=(SIZE, SIZE))
    tgt_loader = DataLoader(tgt, batch_size=2, drop_last=True)
    return train_loader, val_loader, tgt_loader


@pytest.fixture(scope="module")
def tiny_model(workspace):
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet

    return create_unet(encoder_name="resnet18", classes=23, image_size=SIZE,
                       encoder_weights=None, dtype=jnp.float32)


def test_segmentation_trainer_end_to_end(workspace, tiny_model, loaders):
    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        SegmentationTrainer,
    )

    train_loader, val_loader, _ = loaders
    before = tiny_model.state_dict()
    trainer = SegmentationTrainer(tiny_model, device="cpu")
    best = trainer.train(train_loader, val_loader, epochs=2,
                         learning_rate=1e-3, patience=Config.PATIENCE)
    # reference EarlyStopping semantics: best_metrics stays empty for
    # runs shorter than min_epochs=10 (reference src/models/train.py:160)
    assert isinstance(best, dict)
    # weights must have been written back after training
    after = tiny_model.state_dict()
    changed = any(not np.allclose(before[k], after[k])
                  for k in before if before[k].dtype.kind == "f")
    assert changed, "training did not update the bundle weights"

    # TB event files with the early-stopping contract must exist
    import time
    from pathlib import Path

    time.sleep(0.2)
    events = list(Path(Config.LOGS_DIR).rglob("events.out.tfevents.*"))
    assert events


def test_adversarial_trainer_end_to_end(workspace, tiny_model, loaders):
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        AdversarialTrainer,
    )

    train_loader, val_loader, tgt_loader = loaders
    trainer = AdversarialTrainer(tiny_model, device="cpu", lambda_adv=0.001)
    best_loss = trainer.train(train_loader, tgt_loader, val_loader,
                              epochs=1, learning_rate=1e-3, patience=3)
    assert np.isfinite(best_loss)
    metrics = trainer.domain_metrics.get_metrics()
    for k in ("source_domain_acc", "target_domain_acc", "domain_confusion"):
        assert k in metrics


def test_unsupervised_trainer_end_to_end(workspace, tiny_model, loaders):
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        UnsupervisedTrainer,
    )

    _, val_loader, tgt_loader = loaders
    trainer = UnsupervisedTrainer(tiny_model, device="cpu", rampup_length=4,
                                  log_interval=1000)
    best = trainer.train(tgt_loader, val_loader, epochs=1,
                         learning_rate=1e-4, patience=7)
    assert np.isfinite(best)
    assert "domain_confusion" in trainer.domain_metrics.get_metrics()


def test_multiphase_trainer_phases(workspace, loaders, tmp_path):
    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_uda_model,
    )
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        MultiPhaseTrainer,
    )

    train_loader, val_loader, tgt_loader = loaders
    bundle = create_uda_model(encoder_name="resnet18", classes=23,
                              image_size=SIZE, dtype=jnp.float32)
    tr = MultiPhaseTrainer(bundle, device="cpu",
                           checkpoint_dir=str(tmp_path))
    iou1 = tr.phase1_train(train_loader, val_loader, epochs=1,
                           learning_rate=1e-3)
    assert 0.0 <= iou1 <= 1.0
    assert (tmp_path / "phase1_best.pth").exists()

    score2 = tr.phase2_train(train_loader, tgt_loader, val_loader,
                             epochs=1, learning_rate=5e-5)
    assert np.isfinite(score2)
    assert (tmp_path / "phase2_best.pth").exists()

    loss3 = tr.phase3_train(tgt_loader, val_loader, epochs=1,
                            learning_rate=1e-5)
    assert np.isfinite(loss3)
    assert (tmp_path / "phase3_best.pth").exists()
