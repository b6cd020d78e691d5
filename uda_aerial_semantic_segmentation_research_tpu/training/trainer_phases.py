"""Self-contained multi-phase trainer over the GRL UDA model.

Counterpart of reference src/models/trainer_phases.py:13-385 -- the
alternative generation that trains ``UDASegmentationModel`` (feature-
level discriminator behind a gradient-reversal layer) with a SINGLE
optimizer per phase:

- ``phase1_train`` (:49-102)   supervised segmentation with smp
                               multiclass dice (``UDALoss()``, :54),
                               lr 1e-4, 50 epochs
- ``phase2_train`` (:104-208)  joint ``dice + 0.001 * domain`` GRL loss
                               (``UDALoss(lambda_adv=0.001)``, :109),
                               lr 5e-5, 30 epochs; model selection by
                               ``iou * domain_acc`` (:196)
- ``phase3_train`` (:210-277)  MSE consistency between two strong views
                               + ``0.1 * -mean|sigmoid(domain) - 0.5|``
                               confusion term (:251), lr 1e-5, 20 epochs

One traversal per domain, one backward pass, one optimizer -- no D/G
alternation (SURVEY.md section 7).  Measured (r4s1, one v5e, B=128 @
512px, resnet34, ``bench.py --mode grl``): 484.8 ms/step = 264.0
tiles/s with the production sequential step (r3's fused-CE step ran
570.0 ms; the r4 gains: gradient-exact target decoder skip + the
3-program sequential decomposition, BASELINE.md r4s1) vs the
two-optimizer image-disc path's 434.4 ms / 294.7 t/s -- the
feature-level GRL discriminator rides a SECOND grad-bearing encoder
pass (the target batch), which costs more than the image-level
scheme's conv-cheap discriminator updates.  The schemes are not
substitutes: only the GRL path propagates an adversarial gradient into
the encoder (the image-disc generator term has zero generator gradient,
a preserved reference quirk -- see steps.make_adversarial_train_step).
Divergence, documented: the reference calls EarlyStopping
with the wrong signature (``early_stopping(val_loss)`` at :100 vs the
actual ``__call__(epoch, metrics, logger)``, a latent crash); we use a
correct simple patience counter on the per-phase selection score.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.config import Config
from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
    STRONG,
    augment_batch,
    normalize_images,
)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.adversarial_trainer import (
    _cycle_raw,
    match_batch_size,
)
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState,
    adam,
)
from uda_aerial_semantic_segmentation_research_tpu.training.train import _raw_batches
from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
    save_checkpoint,
)
from uda_aerial_semantic_segmentation_research_tpu.visualization.tensorboard_logger import (
    TensorboardLogger,
)


class MultiPhaseTrainer:
    """Three-phase UDA training over a GRL model bundle."""

    def __init__(self, model, device=None, checkpoint_dir: str = "checkpoints",
                 num_classes: Optional[int] = None,
                 lambda_domain: float = 0.001,
                 confusion_weight: float = 0.1,
                 log_dir: Optional[str] = None):
        """``model``: ModelBundle of a UDASegmentationModel.

        ``lambda_domain`` defaults to the reference's phase-2 joint-loss
        weight: ``UDALoss(lambda_adv=0.001)``, total = ``seg + 0.001 *
        domain`` (reference trainer_phases.py:109 + uda.py:82).
        ``confusion_weight`` is the reference's phase-3 domain-confusion
        weight: total = ``consistency + 0.1 * confusion`` (reference
        trainer_phases.py:251).
        """
        self.model = model
        self.device = device or Config.get_device()
        self.num_classes = num_classes or Config.NUM_CLASSES
        self.lambda_domain = float(lambda_domain)
        self.confusion_weight = float(confusion_weight)
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.logger = TensorboardLogger(log_dir=log_dir or Config.LOGS_DIR)
        self._rng = jax.random.key(Config.SEED)
        self._steps: dict = {}

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _state(self, lr: float) -> TrainState:
        return TrainState.from_bundle(self.model, adam(lr))

    # ------------------------------------------------------------------
    # data-parallel mesh (same auto-engage contract as
    # SegmentationTrainer._setup_mesh/_place, train.py)
    # ------------------------------------------------------------------
    def _engage_mesh(self, loader, state) -> TrainState:
        """Replicate state over the mesh when >1 device and the
        per-process batch divides the local devices; no-op otherwise."""
        from uda_aerial_semantic_segmentation_research_tpu.parallel import (
            distributed as dist,
        )
        from uda_aerial_semantic_segmentation_research_tpu.parallel.mesh import (
            default_mesh,
        )

        ndev = jax.device_count()
        bs = getattr(loader, "batch_size", None)
        if ndev > 1 and bs and bs % jax.local_device_count() == 0:
            self._mesh = default_mesh()
            return dist.replicate_global(state, self._mesh)
        self._mesh = None
        return state

    def _place(self, *arrays):
        if getattr(self, "_mesh", None) is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from uda_aerial_semantic_segmentation_research_tpu.parallel import (
            distributed as dist,
        )

        n = dist.local_mesh_device_count(self._mesh)
        if any(a is not None and a.shape[0] % n for a in arrays):
            # single-process: host pass-through (jit replicates); multi-
            # process: align instead — host arrays cannot mix with
            # non-addressable global state (ADVICE round 4), and even
            # shards make the alignment identical on every process
            if dist.process_count() == 1:
                return arrays if len(arrays) > 1 else arrays[0]
            arrays = dist.align_local_batch(n, arrays)
        out = tuple(dist.global_batch(a, self._mesh) if a is not None
                    else None for a in arrays)
        return out if len(out) > 1 else out[0]

    # ------------------------------------------------------------------
    # jitted step builders (cached per phase)
    # ------------------------------------------------------------------
    def _phase1_step(self):
        if "p1" not in self._steps:
            # reference phase 1 trains with ``UDALoss()`` = smp multiclass
            # dice (trainer_phases.py:54, uda.py:84), not cross-entropy
            self._steps["p1"] = step_lib.make_supervised_train_step(
                self.model.module, self.num_classes, seg_loss="dice")
        return self._steps["p1"]

    def _phase2_step(self):
        if "p2" not in self._steps:
            # sequential 3-program decomposition: gradient-identical to
            # the fused step (tests/test_training.py) and faster at the
            # bench shape (484.8 vs 541.5 ms, BASELINE.md r4s1 -- the
            # fused program's two grad-bearing traversals trip XLA's
            # silent HLO rematerializer)
            self._steps["p2"] = step_lib.make_grl_sequential_step(
                self.model.module, self.num_classes,
                lambda_domain=self.lambda_domain)
        return self._steps["p2"]

    def _phase3_step(self):
        if "p3" in self._steps:
            return self._steps["p3"]
        module = self.model.module
        confusion_weight = self.confusion_weight

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, key, tgt_images):
            key = jax.random.fold_in(key, state.step)  # in-program derivation
            k1, k2 = jax.random.split(key)
            v1, _ = augment_batch(k1, tgt_images, None, cfg=STRONG)
            v2, _ = augment_batch(k2, tgt_images, None, cfg=STRONG)
            x0 = normalize_images(tgt_images)

            def loss_fn(params):
                p1, stats = step_lib._apply_train(module, params,
                                                  state.batch_stats, v1)
                p2, stats = step_lib._apply_train(module, params, stats, v2)
                variables = {"params": params, "batch_stats": stats}
                (_, d_logits), mut = module.apply(
                    variables, x0, train=True, domain_adaptation=True,
                    mutable=["batch_stats"])
                consistency = jnp.mean(
                    (p1.astype(jnp.float32) - p2.astype(jnp.float32)) ** 2)
                # push sigmoid(domain) toward 0.5 (max confusion).  The
                # reference computes |domain_pred - 0.5| on RAW logits
                # (trainer_phases.py:248; its feature discriminator has
                # no sigmoid, uda.py:8-28) -- a silent bug that anchors
                # logits at +0.5; we squash first (divergence documented
                # in PARITY.md).  The 0.1 weight is the reference's
                # (trainer_phases.py:251).
                confusion = -jnp.mean(
                    jnp.abs(jax.nn.sigmoid(d_logits) - 0.5))
                total = consistency + confusion_weight * confusion
                return total, (consistency, confusion, mut["batch_stats"])

            (total, (consistency, confusion, stats)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(state.params))
            state = state.apply_gradients(grads, batch_stats=stats)
            return state, {"loss": total, "consistency": consistency,
                           "confusion": confusion}

        self._steps["p3"] = step
        return step

    # ------------------------------------------------------------------
    def _save_best(self, phase: int, metrics: Dict[str, float]):
        save_checkpoint({"model_state_dict": self.model.state_dict(),
                         "metrics": metrics, "phase": phase},
                        self.checkpoint_dir / f"phase{phase}_best.pth")

    def _log_metrics(self, metrics: Dict[str, float], step: int, prefix: str):
        for k, v in metrics.items():
            if np.ndim(v) == 0:
                self.logger.log_scalar(f"{prefix}/{k}", float(v), step)

    # ------------------------------------------------------------------
    # phase 1: supervised (reference :49-102)
    # ------------------------------------------------------------------
    def phase1_train(self, train_loader, val_loader, epochs: int = 50,
                     learning_rate: float = 1e-4, patience: int = 7):
        step = self._phase1_step()
        # val loss on the SAME smp-dice criterion the phase trains with
        # (reference trainer_phases.py:56 passes the UDALoss criterion
        # into _validate_phase1; ADVICE round 4)
        eval_step = step_lib.make_eval_step(self.model.module,
                                            self.num_classes, seg_loss="dice")
        state = self._engage_mesh(train_loader, self._state(learning_rate))
        best_iou, counter = -1.0, 0

        for epoch in range(1, epochs + 1):
            for images, masks in _raw_batches(train_loader):
                images, masks = self._place(images, masks)
                state, m = step(state, self._next_key(), images, masks)
            val = self._validate_phase1(val_loader, state, eval_step)
            self._log_metrics(val, epoch, "phase1/val")
            if val["iou"] > best_iou:
                best_iou, counter = val["iou"], 0
                state.write_back(self.model)
                self._save_best(1, val)
            else:
                counter += 1
                if counter >= patience:
                    break
        state.write_back(self.model)
        return best_iou

    def _validate_phase1(self, val_loader, state, eval_step) -> Dict[str, float]:
        from uda_aerial_semantic_segmentation_research_tpu.training.train import (
            _local_eval_variables,
        )

        params, stats = _local_eval_variables(state.params, state.batch_stats)
        ious, accs, losses = [], [], []
        for images, masks in _raw_batches(val_loader):
            m = eval_step(params, stats, images, masks)
            ious.append(float(m["iou"]))
            accs.append(float(m["accuracy"]))
            losses.append(float(m["loss"]))
        return {"iou": float(np.mean(ious)) if ious else 0.0,
                "accuracy": float(np.mean(accs)) if accs else 0.0,
                "loss": float(np.mean(losses)) if losses else 0.0}

    # ------------------------------------------------------------------
    # phase 2: GRL adversarial (reference :104-208)
    # ------------------------------------------------------------------
    def phase2_train(self, source_loader, target_loader, val_loader,
                     epochs: int = 30, learning_rate: float = 5e-5,
                     patience: int = 7, alpha: float = 1.0,
                     target_val_loader=None):
        """``target_val_loader``: unlabeled target batches for the
        reference-faithful phase-2 validation (``_validate_phase2``
        scores ``dice + 0.001*domain`` over source AND target val
        batches and its domain_acc feeds the selection score); when
        None, target TRAIN batches stand in (the repo's fixtures carry
        no target val split)."""
        step = self._phase2_step()
        eval_step = step_lib.make_grl_eval_step(
            self.model.module, self.num_classes,
            lambda_domain=self.lambda_domain)
        state = self._engage_mesh(source_loader, self._state(learning_rate))
        best_score, counter = -1.0, 0
        target_iter = _cycle_raw(target_loader)

        for epoch in range(1, epochs + 1):
            train_domain_accs = []
            for src_images, src_masks in _raw_batches(source_loader):
                tgt_images, _ = next(target_iter)
                tgt_images = match_batch_size(tgt_images, src_images.shape[0])
                src_images, src_masks, tgt_images = self._place(
                    src_images, src_masks, tgt_images)
                state, m = step(state, self._next_key(), src_images, src_masks,
                                tgt_images, jnp.float32(alpha))
                train_domain_accs.append(float(m["domain_acc"]))
            if train_domain_accs:
                self._log_metrics(
                    {"domain_acc": float(np.mean(train_domain_accs))},
                    epoch, "phase2/train")

            val = self._validate_phase2(
                val_loader,
                target_val_loader if target_val_loader is not None
                else target_loader,
                state, eval_step)
            # combined model-selection score over VAL metrics
            # (reference :196-199: val_iou * val_domain_acc)
            score = val["iou"] * val["domain_acc"]
            val["score"] = score
            self._log_metrics(val, epoch, "phase2/val")
            if score > best_score:
                best_score, counter = score, 0
                state.write_back(self.model)
                self._save_best(2, val)
            else:
                counter += 1
                if counter >= patience:
                    break
        state.write_back(self.model)
        return best_score

    def _validate_phase2(self, val_loader, target_val_loader, state,
                         eval_step) -> Dict[str, float]:
        """Reference _validate_phase2 (trainer_phases.py:305-369): per
        source-val batch, a fresh cycling target-val iterator; val loss
        is the full ``dice + lambda*domain`` and domain_acc is measured
        on the VAL batches of both domains.

        Multi-process: the target side of these metrics is scored on
        process-LOCAL batches (a sharded and/or shuffled target loader
        draws different images per host), so the raw means can diverge
        across processes — and the selection score / patience counter
        with them, which would desynchronize the SPMD epoch loops.
        Process 0's metrics are therefore broadcast to every process,
        keeping control flow in lockstep (the full-val-on-every-process
        design covers only the source-val terms).
        """
        from uda_aerial_semantic_segmentation_research_tpu.parallel import (
            distributed as dist,
        )
        from uda_aerial_semantic_segmentation_research_tpu.training.train import (
            _local_eval_variables,
        )

        params, stats = _local_eval_variables(state.params, state.batch_stats)
        target_iter = _cycle_raw(target_val_loader)
        keys = ("iou", "accuracy", "loss", "domain_acc")
        acc: Dict[str, list] = {k: [] for k in keys}
        for images, masks in _raw_batches(val_loader):
            tgt_images, _ = next(target_iter)
            tgt_images = match_batch_size(tgt_images, images.shape[0])
            m = eval_step(params, stats, images, masks, tgt_images)
            for k in keys:
                acc[k].append(float(m[k]))
        vals = np.asarray([float(np.mean(acc[k])) if acc[k] else 0.0
                           for k in keys], np.float64)
        vals = np.asarray(dist.broadcast_from_primary(vals))
        return dict(zip(keys, (float(v) for v in vals)))

    # ------------------------------------------------------------------
    # phase 3: consistency fine-tuning (reference :210-277)
    # ------------------------------------------------------------------
    def phase3_train(self, target_loader, val_loader=None, epochs: int = 20,
                     learning_rate: float = 1e-5):
        step = self._phase3_step()
        state = self._engage_mesh(target_loader, self._state(learning_rate))
        last_loss = 0.0
        for epoch in range(1, epochs + 1):
            losses = []
            for tgt_images, _ in _raw_batches(target_loader):
                state, m = step(state, self._next_key(),
                                self._place(tgt_images))
                losses.append(float(m["loss"]))
            last_loss = float(np.mean(losses)) if losses else 0.0
            self._log_metrics({"loss": last_loss}, epoch, "phase3/train")
            self._validate_phase3(val_loader, state)
        state.write_back(self.model)
        self._save_best(3, {"loss": last_loss})
        return last_loss

    def _validate_phase3(self, val_loader, state):
        """Reference stub preserved (trainer_phases.py:371-374 is a pass)."""
        return None
