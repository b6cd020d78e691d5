"""Phase-3 unsupervised fine-tuning trainer.

Counterpart of reference src/models/unsupervised_trainer.py:13-392:
consistency regularization over two strong augmentations of unlabeled
target images, plus a domain-confusion term, with linear rampup.

TPU-native reshaping of the reference's hot loop (its two strong views
required a per-image CPU albumentations round trip, reference :100-114):
here both views are two RNG-key splits of ONE batched on-device
augmentation, fused into the jitted step.  The non-finite-loss skip
(:135-137), grad-clip 1.0 (:144) and combined seg+discriminator Adam
(:334) all live inside the compiled step; OOM catch-and-continue and
cache clearing are obsolete (static shapes, ahead-of-time compilation).

Wrapping parity: the reference builds a fresh discriminator and wraps
the incoming model in a DomainAdaptationModel even if it is already one
(:28-31 + test_system.py:597 -- the double-wrap quirk).  We accept
either a ModelBundle or a DomainAdaptationModel and reuse an existing
discriminator instead of shadowing it (documented divergence: the
double wrap silently trained a discriminator that the passed-in wrapper
never saw).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.config import Config
from uda_aerial_semantic_segmentation_research_tpu.models import create_discriminator
from uda_aerial_semantic_segmentation_research_tpu.models.domain_model import (
    DomainAdaptationModel,
)
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import FineTuningLoss
from uda_aerial_semantic_segmentation_research_tpu.ops.metrics import (
    DomainAdaptationMetrics,
)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState,
    adam,
)
from uda_aerial_semantic_segmentation_research_tpu.training.train import (
    SegmentationTrainer,
    _raw_batches,
)


class UnsupervisedTrainer(SegmentationTrainer):
    """Unsupervised consistency fine-tuning (reference phase 3)."""

    def __init__(self, model, device=None, consistency_weight: float = 1.0,
                 domain_weight: float = 0.1, supervised_weight: float = 0.1,
                 rampup_length: int = 40, log_interval: int = 10,
                 patience: int = 7, remat="auto",
                 sequential: Optional[bool] = None, carry_dtype=None):
        if isinstance(model, DomainAdaptationModel):
            seg_bundle = model.segmentation_model
            discriminator = model.discriminator
        else:
            seg_bundle = model
            discriminator = None
        if discriminator is None:
            discriminator = create_discriminator(input_channels=3,
                                                 image_size=Config.IMAGE_SIZE)

        super().__init__(seg_bundle, device)
        self.discriminator = discriminator
        self.domain_model = DomainAdaptationModel(seg_bundle, discriminator)

        self.fine_tuning_loss = FineTuningLoss(
            consistency_weight=consistency_weight,
            domain_weight=domain_weight,
            supervised_weight=supervised_weight,
            rampup_length=rampup_length)
        self.domain_metrics = DomainAdaptationMetrics()
        self.log_interval = log_interval
        self.patience = patience
        # phase 3 holds three grad-bearing activation sets at once; per-
        # block remat (numerically identical, same param tree) lifts the
        # HBM wall from B=16 to B>=64 at 512px (BASELINE.md).  Accepts
        # True / False / "encoder" / "decoder" (models/unet.py): partial
        # remat saves one half's activations to skip its recompute where
        # the HBM headroom allows.  "auto" = encoder-only remat -- the
        # measured phase-3 production point at B=128 @ 512px (r3 A/B,
        # one v5e: encoder 978.5 ms vs full 1022.4 vs decoder-only
        # compile-OOM by 181 MB; saving the decoder activations skips
        # the pricier high-resolution recompute).
        self.remat = "encoder" if remat == "auto" else remat
        # sequential: split the update into per-view backward programs
        # (steps.make_unsupervised_sequential_step) -- identical gradients
        # at one forward+backward's peak HBM, for still-larger batches.
        # None = auto: ON for the TPU backend (measured r3: seq@B=128 =
        # 106.7 t/s vs joint@B=64 = 86.3 t/s on one v5e), OFF elsewhere
        # (CPU tests compile 1 program instead of 6).  carry_dtype
        # narrows the cross-pass logits buffers; auto picks bfloat16 on
        # TPU (value-near-identical: the KL consumes bf16-computed
        # logits either way).
        if sequential is None:
            sequential = jax.default_backend() == "tpu"
            if sequential and carry_dtype is None:
                carry_dtype = jnp.bfloat16
        self.sequential = sequential
        self.carry_dtype = carry_dtype

        self.best_score = float("-inf")
        self.best_epoch = 0
        self.counter = 0
        self._unsup_steps: dict = {}

    # ------------------------------------------------------------------
    def _make_state(self, learning_rate: float) -> TrainState:
        tx = adam(learning_rate, clip_norm=1.0)
        # copy leaves: the jitted step donates these buffers (see
        # TrainState.from_bundle)
        params = jax.tree.map(jnp.array, {
            "seg": self.model.params, "disc": self.discriminator.params})
        batch_stats = jax.tree.map(jnp.array, {
            "seg": self.model.batch_stats,
            "disc": self.discriminator.batch_stats})
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=tx.init(params),
                          tx=tx)

    def _write_back(self, state: TrainState) -> None:
        self.model.update(params=state.params["seg"],
                          batch_stats=state.batch_stats["seg"])
        self.discriminator.update(params=state.params["disc"],
                                  batch_stats=state.batch_stats["disc"])

    def _get_unsup_step(self, with_supervised: bool):
        if with_supervised not in self._unsup_steps:
            seg_module = self.model.module
            # apply the trainer's remat setting whenever it differs from
            # the module's (True / False / "encoder" / "decoder"): the
            # param tree is remat-invariant, so the clone is free
            if (hasattr(seg_module, "remat")
                    and seg_module.remat != self.remat):
                seg_module = seg_module.clone(remat=self.remat)
            # bf16 logits are VALUE-IDENTICAL when the head computes in
            # bf16 (the f32 logits are upcast bf16 numbers) and halve the
            # phase-3 step's dominant buffers: p1/p2 are held across the
            # whole program as KL targets (2x f32 (B, H, W, C) was the
            # single largest allocation group in the B=64 OOM dump)
            if (getattr(seg_module, "dtype", None) == jnp.bfloat16
                    and getattr(seg_module, "logits_dtype", None) == jnp.float32):
                seg_module = seg_module.clone(logits_dtype=jnp.bfloat16)
            if self.sequential:
                make = partial(step_lib.make_unsupervised_sequential_step,
                               carry_dtype=self.carry_dtype)
            else:
                make = step_lib.make_unsupervised_train_step
            self._unsup_steps[with_supervised] = make(
                seg_module, self.discriminator.module, self.num_classes,
                self.fine_tuning_loss, with_supervised=with_supervised)
        return self._unsup_steps[with_supervised]

    # ------------------------------------------------------------------
    def train_epoch(self, target_dataloader, state: TrainState, epoch: int,
                    supervised_dataloader=None):
        """One unsupervised epoch; returns (state, mean loss, domain metrics)."""
        from tqdm import tqdm

        self.domain_metrics.reset()
        total_loss, n = 0.0, 0
        n_total = (len(target_dataloader)
                   if hasattr(target_dataloader, "__len__") else None)

        sup_iter = None
        if supervised_dataloader is not None:
            def _cycle():
                while True:
                    for b in _raw_batches(supervised_dataloader):
                        yield b
            sup_iter = _cycle()
        step = self._get_unsup_step(sup_iter is not None)

        def log_pending(batch_idx, metrics):
            """Fetch + log one already-computed step (one step of lag
            overlaps the host round trip with device execution)."""
            nonlocal total_loss, n
            # reference quirk preserved: phase 3 has no separate source
            # batch, so both accumulator slots see the target probs
            # (reference unsupervised_trainer.py:149-152)
            self.domain_metrics.update(source_pred=metrics["domain_prob"],
                                       target_pred=metrics["domain_prob"])
            loss = float(metrics["total"])
            if np.isfinite(loss):
                total_loss += loss
                n += 1
            md = self.domain_metrics.get_metrics()
            pbar.set_postfix({
                "loss": f"{loss:.4f}" if np.isfinite(loss) else "NaN",
                "cons_loss": f'{float(metrics["consistency"]):.4f}',
                "domain_conf": f'{md["domain_confusion"]:.4f}',
                "rampup": f'{float(metrics["rampup_weight"]):.2f}',
            })
            if batch_idx % self.log_interval == 0:
                self._log_training_step(metrics, md,
                                        epoch * (n_total or 1) + batch_idx)

        epoch_key = self._epoch_key(epoch)
        pending = None
        pbar = tqdm(_raw_batches(target_dataloader), total=n_total,
                    desc=f"Epoch {epoch}")
        for batch_idx, (tgt_images, _) in enumerate(pbar):
            if sup_iter is not None:
                sup_images, sup_masks = next(sup_iter)
                tgt_images, sup_images, sup_masks = self._place(
                    tgt_images, sup_images, sup_masks)
                state, metrics = step(state, epoch_key, tgt_images,
                                      jnp.float32(epoch), sup_images, sup_masks)
            else:
                (tgt_images,) = self._place(tgt_images)
                state, metrics = step(state, epoch_key, tgt_images,
                                      jnp.float32(epoch))
            if pending is not None:
                log_pending(*pending)
            pending = (batch_idx, metrics)

        if pending is not None:
            log_pending(*pending)
        return state, total_loss / max(n, 1), self.domain_metrics.get_metrics()

    # ------------------------------------------------------------------
    def _log_training_step(self, loss_dict: Dict, metrics: Dict[str, float],
                           step: int):
        """Scalar logging (reference :189-197)."""
        for name in ("total", "consistency", "domain_confusion", "supervised",
                     "rampup_weight"):
            if name in loss_dict:
                self.logger.log_scalar(f"train/loss_{name}",
                                       float(loss_dict[name]), step)
        for name, value in metrics.items():
            self.logger.log_scalar(f"train/{name}", float(value), step)

    def _log_validation_step(self, metrics: Dict[str, float], step: int):
        """Validation scalar + sample logging (reference :199-272)."""
        for name, value in metrics.items():
            try:
                self.logger.log_scalar(f"val/{name}", float(value), step)
            except (TypeError, ValueError):
                continue
        for name, value in self.domain_metrics.get_metrics().items():
            self.logger.log_scalar(f"val/domain_{name}", float(value), step)

    # ------------------------------------------------------------------
    def validate(self, dataloader, state: Optional[TrainState] = None):
        """Labeled source-val metrics + periodic sample logging
        (reference :274-312)."""
        self._build_steps()
        params = (state.params["seg"] if state is not None else self.model.params)
        stats = (state.batch_stats["seg"] if state is not None
                 else self.model.batch_stats)
        from uda_aerial_semantic_segmentation_research_tpu.training.train import (
            _local_eval_variables,
        )

        params, stats = _local_eval_variables(params, stats)

        total_iou, accs, losses, n = 0.0, [], [], 0
        metrics: Dict[str, float] = {}
        for batch_idx, (images, masks) in enumerate(_raw_batches(dataloader)):
            m = self._eval_step(params, stats, images, masks)
            metrics = {"iou": float(m["iou"]), "accuracy": float(m["accuracy"]),
                       "loss": float(m["loss"])}
            total_iou += metrics["iou"]
            accs.append(metrics["accuracy"])
            losses.append(metrics["loss"])
            if batch_idx % self.log_interval == 0:
                self._log_validation_step(
                    metrics, self.current_epoch * max(len(dataloader), 1) + batch_idx)
            n += 1

        metrics["iou"] = total_iou / max(n, 1)
        if accs:
            metrics["accuracy"] = float(np.mean(accs))
            metrics["loss"] = float(np.mean(losses))
        return metrics

    # ------------------------------------------------------------------
    def train(self, target_dataloader, valid_dataloader, epochs: int,
              learning_rate: float, supervised_dataloader=None,
              patience: Optional[int] = None):
        """Unsupervised fine-tuning loop (reference :314-359)."""
        if patience is not None:
            self.patience = patience
        self._lr = float(learning_rate)
        state = self._make_state(learning_rate)
        state = self._setup_mesh(target_dataloader, state)

        for epoch in range(1, epochs + 1):
            self.current_epoch = epoch
            state, train_loss, train_metrics = self.train_epoch(
                target_dataloader, state, epoch,
                supervised_dataloader=supervised_dataloader)
            valid_metrics = self.validate(valid_dataloader, state)

            print(f"\nEpoch {epoch}:")
            print(f"Train Loss: {train_loss:.4f}")
            print(f"Train Metrics: {train_metrics}")
            print(f"Valid Metrics: {valid_metrics}")

            if self.early_stopping(epoch, valid_metrics):
                print("Early stopping triggered")
                break

        self._write_back(state)
        return self.best_score

    # ------------------------------------------------------------------
    def early_stopping(self, epoch: int, metrics: Dict[str, float]) -> bool:
        """IoU-max early stopping with the reference's logging contract
        (reference :361-392)."""
        current_score = float(metrics.get("iou", 0))
        if current_score > self.best_score:
            self.best_score = current_score
            self.best_epoch = epoch
            self.counter = 0
        else:
            self.counter += 1

        self.logger.log_scalar("early_stopping/score", current_score, epoch)
        self.logger.log_scalar("early_stopping/counter", self.counter, epoch)

        if self.counter >= self.patience:
            print(f"\nEarly stopping triggered. Best score: "
                  f"{self.best_score:.4f} at epoch {self.best_epoch}")
            return True
        return False
