"""Phase-2 adversarial domain-adaptation trainer.

Counterpart of reference src/models/adversarial_trainer.py:9-217: the
two-optimizer alternating scheme where an image-level discriminator is
trained to separate source/target (labels 1/0) and the segmentation
"generator" is trained on source CE plus a lambda-scaled loss pushing
D(target) toward 1.  Both sub-updates are fused into ONE jitted step
(training/steps.py:make_adversarial_train_step) so the alternation
costs no recompiles and no extra host round trips.

The cycling target iterator (reference :62-73) lives host-side; every
compiled step sees static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.config import Config
from uda_aerial_semantic_segmentation_research_tpu.models import create_discriminator
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import AdversarialLoss
from uda_aerial_semantic_segmentation_research_tpu.ops.metrics import (
    DomainAdaptationMetrics,
)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    AdversarialState,
    TrainState,
    adam,
)
from uda_aerial_semantic_segmentation_research_tpu.training.train import (
    SegmentationTrainer,
    _raw_batches,
)


def _cycle_raw(dataloader):
    """Endlessly cycle raw batches of a loader (reference :62-73)."""
    while True:
        got = False
        for batch in _raw_batches(dataloader):
            got = True
            yield batch
        if not got:
            raise ValueError("empty target dataloader")


def match_batch_size(arr, b):
    """Cycle-repeat then trim ``arr`` to exactly ``b`` leading rows.

    Every source batch is paired with one target batch (reference
    :62-73); a short (trailing) target batch is padded by cycling its
    rows, an oversized one trimmed, so the jitted step always sees
    matching static batch shapes.  Shared by the adversarial trainer
    and both MultiPhaseTrainer phase-2 loops.
    """
    if arr.shape[0] < b:
        reps = -(-b // arr.shape[0])
        arr = np.concatenate([arr] * reps)
    return arr[:b] if arr.shape[0] > b else arr


class AdversarialTrainer(SegmentationTrainer):
    """Adversarial UDA trainer (reference src/models/adversarial_trainer.py)."""

    def __init__(self, model, device=None, lambda_adv: float = 0.001):
        super().__init__(model, device)
        self.discriminator = create_discriminator(
            input_channels=3, image_size=Config.IMAGE_SIZE)
        self.adversarial_loss = AdversarialLoss(lambda_adv)
        self.lambda_adv = float(lambda_adv)
        self.domain_metrics = DomainAdaptationMetrics()
        self._adv_step = None

    # ------------------------------------------------------------------
    def calculate_iou(self, pred, target) -> float:
        """Binary IoU over two masks (reference :25-39 semantics)."""
        p = jnp.asarray(pred).astype(bool)
        t = jnp.asarray(target).astype(bool)
        inter = jnp.sum(jnp.logical_and(p, t)).astype(jnp.float32)
        union = jnp.sum(jnp.logical_or(p, t)).astype(jnp.float32)
        return float(inter / (union + 1e-8))

    def _build_adv_step(self):
        if self._adv_step is None:
            self._adv_step = step_lib.make_adversarial_train_step(
                self.model.module, self.discriminator.module,
                self.num_classes, self.lambda_adv)

    # ------------------------------------------------------------------
    def train_epoch(self, source_dataloader, target_dataloader, state, epoch):
        """One adversarial epoch; returns (state, mean total loss, domain metrics)."""
        from tqdm import tqdm

        self._build_adv_step()
        self.domain_metrics.reset()
        total_loss, n = 0.0, 0
        target_iter = _cycle_raw(target_dataloader)
        n_total = len(source_dataloader) if hasattr(source_dataloader, "__len__") else None
        epoch_key = self._epoch_key(epoch)

        def log_pending(global_step, metrics):
            """Fetch + log one already-computed step (one step of lag
            overlaps the host round trip with device execution)."""
            self.domain_metrics.update(metrics["source_domain_prob"],
                                       metrics["target_domain_prob"])
            loss = float(metrics["loss"])
            self.logger.log_scalar("train/seg_loss", float(metrics["seg_loss"]),
                                   global_step)
            self.logger.log_scalar("train/d_loss", float(metrics["d_loss"]),
                                   global_step)
            self.logger.log_scalar("train/adv_loss", float(metrics["adv_loss"]),
                                   global_step)
            md = self.domain_metrics.get_metrics()
            pbar.set_postfix({
                "seg_loss": f'{float(metrics["seg_loss"]):.4f}',
                "d_loss": f'{float(metrics["d_loss"]):.4f}',
                "adv_loss": f'{float(metrics["adv_loss"]):.4f}',
                "domain_conf": f'{md["domain_confusion"]:.4f}',
            })
            return loss

        pending = None
        pbar = tqdm(_raw_batches(source_dataloader), total=n_total,
                    desc=f"Epoch {epoch}")
        for batch_idx, (src_images, src_masks) in enumerate(pbar):
            tgt_images, _ = next(target_iter)
            # static-shape guard: match target batch to source batch size
            tgt_images = match_batch_size(tgt_images, src_images.shape[0])

            src_images, src_masks, tgt_images = self._place(
                src_images, src_masks, tgt_images)
            state, metrics = self._adv_step(state, epoch_key,
                                            src_images, src_masks, tgt_images)
            if pending is not None:
                total_loss += log_pending(*pending)
                n += 1
            pending = ((epoch - 1) * (n_total or 1) + batch_idx, metrics)

        if pending is not None:
            total_loss += log_pending(*pending)
            n += 1
        return state, total_loss / max(n, 1), self.domain_metrics.get_metrics()

    # ------------------------------------------------------------------
    def validate(self, dataloader, state: Optional[AdversarialState] = None):
        """Source-val CE + IoU + accuracy (reference :130-176).

        Divergence, documented: the reference formats iou/accuracy as
        strings (:171-174); we return floats.
        """
        self._build_steps()
        params = state.seg.params if state is not None else self.model.params
        stats = (state.seg.batch_stats if state is not None
                 else self.model.batch_stats)
        from uda_aerial_semantic_segmentation_research_tpu.training.train import (
            _local_eval_variables,
        )

        params, stats = _local_eval_variables(params, stats)

        total_loss, ious, accs, n = 0.0, [], [], 0
        for images, masks in _raw_batches(dataloader):
            m = self._eval_step(params, stats, images, masks)
            total_loss += float(m["loss"])
            ious.append(float(m["iou"]))
            accs.append(float(m["accuracy"]))
            n += 1
        avg_loss = total_loss / max(n, 1)
        metrics = {"iou": float(np.mean(ious)) if ious else 0.0,
                   "accuracy": float(np.mean(accs)) if accs else 0.0}
        return avg_loss, metrics

    # ------------------------------------------------------------------
    def train(self, source_dataloader, target_dataloader, valid_dataloader,
              epochs: int, learning_rate: float, patience: int = 3):
        """Adversarial training loop (reference :178-217): simple
        val-loss early stopping, discriminator Adam lazily created at the
        generator LR (here: both transformations built up front)."""
        self._build_steps()
        self._build_adv_step()
        self._lr = float(learning_rate)
        state = AdversarialState(
            seg=TrainState.from_bundle(self.model, adam(learning_rate)),
            disc=TrainState.from_bundle(self.discriminator, adam(learning_rate)))
        state = self._setup_mesh(source_dataloader, state)

        best_valid_loss = float("inf")
        patience_counter = 0
        for epoch in range(1, epochs + 1):
            self.current_epoch = epoch
            state, train_loss, domain_metrics = self.train_epoch(
                source_dataloader, target_dataloader, state, epoch)
            valid_loss, valid_metrics = self.validate(valid_dataloader, state)

            print(f"Train Loss: {train_loss:.4f}")
            print(f"Valid Loss: {valid_loss:.4f}")
            print(f"Valid Metrics: {valid_metrics}")
            print(f"Domain Metrics: {domain_metrics}")
            self.logger.log_scalar("val/loss", valid_loss, epoch)
            self.logger.log_scalars("val/domain", domain_metrics, epoch)

            if valid_loss < best_valid_loss:
                best_valid_loss = valid_loss
                patience_counter = 0
            else:
                patience_counter += 1
                if patience_counter >= patience:
                    print(f"Early stopping after {epoch} epochs")
                    break

        state.seg.write_back(self.model)
        state.disc.write_back(self.discriminator)
        return best_valid_loss
