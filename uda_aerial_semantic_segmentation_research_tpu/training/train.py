"""Supervised segmentation training (phase 1) + shared trainer machinery.

Counterpart of reference src/models/train.py:

- ``load_class_dict``       (:29-40)   class_dict_seg.csv loader
- ``launch_tensorboard``    (:42-77)   TB server helper
- ``EarlyStopping``         (:79-195)  weighted multi-metric early stop
- ``SegmentationTrainer``   (:197-503) train/validate loops + rich logging
- ``train_model``           (:505-706) standalone training CLI

TPU-native shape: the trainer is a thin epoch driver around ONE jitted
train step (augment + forward + loss + grads + Adam update fused) and
ONE jitted eval step; state lives in an immutable ``TrainState`` pytree
donated every step.  Under a multi-chip mesh the same steps run data-
parallel (see training/steps.py).
"""

from __future__ import annotations

import os
import subprocess
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

from uda_aerial_semantic_segmentation_research_tpu.config import Config
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import DiceLoss
from uda_aerial_semantic_segmentation_research_tpu.ops.metrics import (
    accuracy_from_hist,
    confusion_matrix,
    iou_from_hist,
)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState,
    adam,
)
from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
    save_checkpoint,
)
from uda_aerial_semantic_segmentation_research_tpu.visualization import utils as viz_utils
from uda_aerial_semantic_segmentation_research_tpu.visualization.tensorboard_logger import (
    TensorboardLogger,
)

# cap on pixels fed to sklearn ROC/PR curves per figure (the reference
# feeds every pixel of the batch, reference src/models/train.py:275-328;
# subsampling preserves the curves and keeps host time bounded)
_CURVE_PIXEL_CAP = 20_000


def load_class_dict():
    """Load the class-color dictionary CSV (reference src/models/train.py:29-40)."""
    import pandas as pd

    csv_path = os.path.join(Config.DATA_DIR, "class_dict_seg.csv")
    try:
        df = pd.read_csv(csv_path, skipinitialspace=True)
        print("\nLoaded class mapping:")
        print(df)
        return df
    except Exception as e:  # mirror reference: warn and return None
        print(f"Error loading class dictionary: {e}")
        return None


def launch_tensorboard(logdir, port: int = 6006):
    """Start a TensorBoard server (reference src/models/train.py:42-77).

    Does not open a browser (headless TPU hosts); returns the process or
    None if the binary is unavailable.
    """
    os.makedirs(logdir, exist_ok=True)
    try:
        proc = subprocess.Popen(
            ["tensorboard", "--logdir", str(logdir), "--port", str(port)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return proc
    except (OSError, FileNotFoundError) as e:
        print(f"Warning: Could not start TensorBoard: {e}")
        print(f"You can manually start TensorBoard with: tensorboard --logdir {logdir}")
        return None


class EarlyStopping:
    """Weighted multi-metric early stopping (reference src/models/train.py:79-195).

    Semantics preserved exactly: combined score = sum(weights[m] * value),
    'min'/'max' mode with min_delta, no stopping before ``min_epochs``,
    metric history + improvement rates, and the
    ``early_stopping/score`` / ``early_stopping/counter`` logging
    contract the system tests assert on (reference src/test_system.py:237-242).
    """

    def __init__(self, patience: int = 7, min_delta: float = 0.0,
                 mode: str = "min", min_epochs: int = 10,
                 metrics_to_track: Optional[List[str]] = None,
                 weights: Optional[Dict[str, float]] = None,
                 verbose: bool = False):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.min_epochs = min_epochs
        self.metrics_to_track = metrics_to_track or ["loss"]
        self.weights = weights or {"loss": 1.0}
        self.verbose = verbose

        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.best_metrics: Dict[str, float] = {}
        self.val_loss_min = float("inf")
        self.metric_history = {m: [] for m in self.metrics_to_track}

    def _calculate_score(self, metrics: Dict[str, float]) -> float:
        return sum(self.weights[m] * float(v) for m, v in metrics.items()
                   if m in self.weights)

    def _is_better(self, current: float, best: float) -> bool:
        if self.mode == "min":
            return current < best - self.min_delta
        return current > best + self.min_delta

    def __call__(self, epoch: int, metrics: Dict[str, float],
                 logger: Optional[TensorboardLogger] = None) -> bool:
        for m, v in metrics.items():
            if m in self.metric_history:
                self.metric_history[m].append(float(v))

        current_score = self._calculate_score(metrics)
        if logger:
            logger.log_scalar("early_stopping/score", current_score, epoch)
            logger.log_scalar("early_stopping/counter", self.counter, epoch)

        if epoch < self.min_epochs:
            return False

        if self.best_score is None:
            self.best_score = current_score
            self.best_metrics = dict(metrics)
        elif self._is_better(current_score, self.best_score):
            self.best_score = current_score
            self.best_metrics = dict(metrics)
            self.counter = 0
        else:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
                if self.verbose:
                    print(f"Early stopping triggered after {epoch} epochs")
                return True
        return False

    def get_best_metrics(self) -> Dict[str, float]:
        return self.best_metrics

    def get_improvement_rate(self) -> Dict[str, float]:
        rates = {}
        for m, hist in self.metric_history.items():
            if len(hist) > 1:
                rates[m] = (hist[-1] - hist[0]) / len(hist)
        return rates


def _local_eval_variables(params, batch_stats):
    """Make (params, stats) usable in PER-PROCESS validation jits.

    Multi-host design: validation loaders are NOT process-sharded —
    every process evaluates the FULL val set so control-flow decisions
    (early stopping, best-checkpoint selection, gate checks) agree on
    all hosts without any collective.  But global replicated arrays
    cannot mix with process-local batch arrays inside one jit, so pull
    a host copy once per validation pass (replicated arrays are
    host-readable on every process).  Single-process: pass-through.
    """
    from uda_aerial_semantic_segmentation_research_tpu.parallel.distributed import (
        process_count,
    )

    if process_count() == 1:
        return params, batch_stats
    return (jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, batch_stats))


def _raw_batches(dataloader, place=None, depth: int = 2):
    """Yield raw (uint8 images NHWC, int masks NHW) batches.

    Uses the loader's raw path (device-side augmentation) when available;
    otherwise assumes the iterable already yields (images, masks).

    With ``place`` (the trainer's ``_place``), batches are transferred
    ``depth`` ahead of consumption: ``jax.device_put``/sharded puts are
    async, so the H2D copy of batch N+1 rides under the device compute
    of batch N instead of serializing with it (the host link is the e2e
    bottleneck on thin hosts -- BASELINE.md).
    """
    it = dataloader.iter_raw() if hasattr(dataloader, "iter_raw") else iter(dataloader)

    def norm(batch):
        if isinstance(batch, (tuple, list)) and len(batch) == 2:
            return batch[0], batch[1]
        return batch, None

    if place is None:
        for batch in it:
            yield norm(batch)
        return

    from uda_aerial_semantic_segmentation_research_tpu.data.loader import (
        prefetch_to_device,
    )

    yield from prefetch_to_device((norm(b) for b in it), size=depth,
                                  put=lambda item: place(*item))


class SegmentationTrainer:
    """Phase-1 supervised trainer (reference src/models/train.py:197-503)."""

    def __init__(self, model, device=None, log_dir: Optional[str] = None):
        """``model`` is a ModelBundle (module + variables); ``device`` is
        accepted for reference-API parity (placement is mesh-driven)."""
        self.model = model
        self.device = device or Config.get_device()
        self.num_classes = getattr(model.module, "classes", Config.NUM_CLASSES)
        self.logger = TensorboardLogger(log_dir=log_dir or Config.LOGS_DIR)
        self.current_epoch = 0
        self._mesh = None  # set by _setup_mesh when multi-chip engages
        self._train_step = None
        self._eval_step = None
        self._predict_step = step_lib.make_predict_step(model.module)
        self._rng = jax.random.key(Config.SEED)

    # ------------------------------------------------------------------
    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _epoch_key(self, epoch: int):
        """ONE key per epoch; the jitted steps fold in state.step for
        per-batch randomness (an eager split per batch is a separate
        device dispatch -- hundreds of ms on remote runtimes)."""
        return jax.random.fold_in(jax.random.key(Config.SEED), epoch)

    # ------------------------------------------------------------------
    # multi-chip data parallelism (no reference analogue -- the reference
    # is single-device; SURVEY.md section 2.2)
    # ------------------------------------------------------------------
    def _setup_mesh(self, dataloader, state):
        """Engage the data mesh when >1 device and the batch divides it.

        State is replicated once; every training batch is then sharded
        P('data') and the SAME jitted step runs SPMD (gradient psum +
        cross-replica BatchNorm inserted by the partitioner).
        """
        from uda_aerial_semantic_segmentation_research_tpu.parallel import (
            distributed as dist,
        )
        from uda_aerial_semantic_segmentation_research_tpu.parallel.mesh import (
            default_mesh,
        )

        ndev = jax.device_count()
        # multi-host: the loader feeds PER-PROCESS batches, so the batch
        # must divide this process's local devices (global batch =
        # bs * process_count divides the global mesh by construction)
        local_ndev = jax.local_device_count()
        bs = getattr(dataloader, "batch_size", None)
        if ndev > 1 and bs and bs % local_ndev == 0:
            self._mesh = default_mesh()
            print(f"Data-parallel mesh engaged: {ndev} devices over "
                  f"{dist.process_count()} process(es), "
                  f"{bs // local_ndev} samples/device")
            return dist.replicate_global(state, self._mesh)
        self._mesh = None
        return state

    def _place(self, *arrays):
        """Ship a batch to the device(s): async ``device_put`` on a single
        device, ``P('data')`` sharding over the mesh.  A trailing batch
        that doesn't divide the mesh passes through as host arrays when
        single-process (jit replicates them); multi-process it is
        trimmed/padded to divisibility instead — host arrays mixed with
        non-addressable global state would crash (ADVICE round 4), and
        even dataset shards make the alignment identical on every
        process."""
        if self._mesh is None:
            return tuple(jax.device_put(a) if a is not None else None
                         for a in arrays)
        from uda_aerial_semantic_segmentation_research_tpu.parallel import (
            distributed as dist,
        )

        n = dist.local_mesh_device_count(self._mesh)
        if any(a is not None and a.shape[0] % n for a in arrays):
            if dist.process_count() == 1:
                return arrays
            arrays = dist.align_local_batch(n, arrays)
        return tuple(dist.global_batch(a, self._mesh) if a is not None
                     else None for a in arrays)

    def _build_steps(self):
        if self._train_step is None:
            self._train_step = step_lib.make_supervised_train_step(
                self.model.module, self.num_classes)
            self._eval_step = step_lib.make_eval_step(
                self.model.module, self.num_classes)

    # ------------------------------------------------------------------
    # metrics (reference :225-243)
    # ------------------------------------------------------------------
    def calculate_metrics(self, outputs, masks) -> Dict[str, float]:
        """Batch metrics from NHWC logits + int masks (host-visible floats)."""
        import jax.numpy as jnp

        preds = jnp.argmax(jnp.asarray(outputs), axis=-1)
        hist = confusion_matrix(preds, jnp.asarray(masks), self.num_classes)
        per_class, mean_iou = iou_from_hist(hist)
        acc = accuracy_from_hist(hist)
        metrics = {"iou": float(mean_iou), "accuracy": float(acc)}
        per_class = np.asarray(jax.device_get(per_class))
        for c in range(self.num_classes):
            metrics[f"iou_class_{c}"] = float(per_class[c])
        return metrics

    # ------------------------------------------------------------------
    # figure logging (reference :245-328)
    # ------------------------------------------------------------------
    def _log_confusion_matrix(self, hist, step: int, prefix: str = "train"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        cm = np.asarray(jax.device_get(hist))
        plt.figure(figsize=(10, 8))
        sns.heatmap(cm, annot=False, fmt="d", cmap="Blues",
                    xticklabels=range(self.num_classes),
                    yticklabels=range(self.num_classes))
        plt.title(f"{prefix.capitalize()} Confusion Matrix")
        plt.xlabel("Predicted")
        plt.ylabel("True")
        self.logger.log_figure(f"{prefix}/confusion_matrix", plt.gcf(), step)
        plt.close()

    def _curve_inputs(self, outputs, masks):
        probs = np.asarray(jax.device_get(jax.nn.softmax(
            np.asarray(outputs, dtype=np.float32), axis=-1)))
        true = np.asarray(jax.device_get(masks)).reshape(-1)
        probs = probs.reshape(-1, probs.shape[-1])
        if len(true) > _CURVE_PIXEL_CAP:
            idx = np.random.default_rng(0).choice(len(true), _CURVE_PIXEL_CAP,
                                                  replace=False)
            probs, true = probs[idx], true[idx]
        return probs, true

    def _log_roc_curves(self, outputs, masks, step: int, prefix: str = "train"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import sklearn.metrics as skmetrics

        probs, true = self._curve_inputs(outputs, masks)
        plt.figure(figsize=(10, 8))
        for c in range(self.num_classes):
            y = (true == c)
            if y.sum() == 0 or y.sum() == len(y):
                continue
            fpr, tpr, _ = skmetrics.roc_curve(y, probs[:, c])
            auc = skmetrics.auc(fpr, tpr)
            plt.plot(fpr, tpr, label=f"Class {c} (AUC = {auc:.2f})")
        plt.plot([0, 1], [0, 1], "k--")
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.title(f"{prefix.capitalize()} ROC Curves")
        plt.legend(fontsize=6)
        self.logger.log_figure(f"{prefix}/roc_curves", plt.gcf(), step)
        plt.close()

    def _log_pr_curves(self, outputs, masks, step: int, prefix: str = "train"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import sklearn.metrics as skmetrics

        probs, true = self._curve_inputs(outputs, masks)
        plt.figure(figsize=(10, 8))
        for c in range(self.num_classes):
            y = (true == c)
            if y.sum() == 0:
                continue
            precision, recall, _ = skmetrics.precision_recall_curve(y, probs[:, c])
            ap = skmetrics.average_precision_score(y, probs[:, c])
            plt.plot(recall, precision, label=f"Class {c} (AP = {ap:.2f})")
        plt.xlabel("Recall")
        plt.ylabel("Precision")
        plt.title(f"{prefix.capitalize()} Precision-Recall Curves")
        plt.legend(fontsize=6)
        self.logger.log_figure(f"{prefix}/pr_curves", plt.gcf(), step)
        plt.close()

    def _log_predictions(self, image, mask, output, step: int, prefix="train"):
        """Sample image / GT / prediction / overlay (reference :440-457)."""
        pred_mask = np.asarray(jax.device_get(np.asarray(output).argmax(axis=-1)))
        img = np.asarray(jax.device_get(image))
        self.logger.log_image(f"{prefix}/image", img, step)
        self.logger.log_image(f"{prefix}/ground_truth",
                              viz_utils.colorize_mask(np.asarray(mask),
                                                      self.num_classes), step)
        self.logger.log_image(f"{prefix}/prediction",
                              viz_utils.colorize_mask(pred_mask,
                                                      self.num_classes), step)
        overlay = viz_utils.create_overlay(img, pred_mask)
        self.logger.log_image(f"{prefix}/overlay", overlay, step)

    # ------------------------------------------------------------------
    # epoch loops (reference :330-457)
    # ------------------------------------------------------------------
    def train_epoch(self, dataloader, state: TrainState, epoch: int):
        """One training epoch; returns (state, mean loss)."""
        from tqdm import tqdm

        from uda_aerial_semantic_segmentation_research_tpu.utils.profiling import (
            StepTimer,
        )

        total_loss, n_batches = 0.0, 0
        n_total = len(dataloader) if hasattr(dataloader, "__len__") else None
        epoch_key = self._epoch_key(epoch)
        timer = StepTimer(warmup=1)
        pending = None  # (global_step, batch_idx, metrics, images, masks)
        pbar = tqdm(_raw_batches(dataloader, place=self._place),
                    total=n_total, desc=f"Epoch {epoch}")
        for batch_idx, (images, masks) in enumerate(pbar):
            timer.items_per_step = images.shape[0]
            global_step = (epoch - 1) * (n_total or 1) + batch_idx
            d_images, d_masks = images, masks
            with timer.step(sync=None):
                state, metrics = self._train_step(state, epoch_key,
                                                  d_images, d_masks)
                # log LAST step's metrics: fetching them now overlaps the
                # host round trip with this step's device execution (one
                # step of lag hides ~40-50 ms/step of dispatch latency on
                # remote runtimes)
                if pending is not None:
                    total_loss += self._log_train_batch(state, pbar, *pending)
                    n_batches += 1
            pending = (global_step, batch_idx, metrics, images, masks)

        if pending is not None:
            total_loss += self._log_train_batch(state, pbar, *pending)
            n_batches += 1

        perf = timer.summary()
        if perf.get("steps"):
            self.logger.log_scalar("perf/steps_per_sec",
                                   perf["steps_per_sec"], epoch)
            self.logger.log_scalar("perf/tiles_per_sec",
                                   perf["items_per_sec"], epoch)
            self.logger.log_scalar("perf/step_ms_p50",
                                   perf["step_ms_p50"], epoch)
        return state, total_loss / max(n_batches, 1)

    def _log_train_batch(self, state, pbar, global_step, batch_idx, metrics,
                         images, masks) -> float:
        """Fetch + log one (already computed) step's metrics; returns loss."""
        loss = float(metrics["loss"])
        self.logger.log_scalar("train/loss", loss, global_step)
        self.logger.log_scalar("train/iou", float(metrics["iou"]), global_step)
        self.logger.log_scalar("train/accuracy", float(metrics["accuracy"]),
                               global_step)
        self.logger.log_scalar("train/learning_rate", self._lr, global_step)

        from uda_aerial_semantic_segmentation_research_tpu.parallel.distributed import (
            process_count,
        )

        # multi-host: train batches are process-sharded global arrays
        # whose single-image slices are not host-materializable on every
        # process -- skip the train-time FIGURE logging (scalars above
        # still flow; validation figures remain, its batches stay
        # host-resident)
        if batch_idx % Config.LOG_INTERVAL == 0 and process_count() == 1:
            logits = self._predict_step(state.params, state.batch_stats,
                                        images[:1])
            self._log_predictions(images[0], masks[0], logits[0],
                                  global_step, prefix="train")
            self._log_confusion_matrix(metrics["hist"], global_step, "train")
            self._log_roc_curves(logits, masks[:1], global_step, "train")
            self._log_pr_curves(logits, masks[:1], global_step, "train")
            per_class = np.asarray(jax.device_get(metrics["per_class_iou"]))
            for c in range(self.num_classes):
                self.logger.log_scalar(f"train/iou_class_{c}",
                                       float(per_class[c]), global_step)

        pbar.set_postfix({"loss": f"{loss:.4f}",
                          "iou": f'{float(metrics["iou"]):.4f}',
                          "acc": f'{float(metrics["accuracy"]):.4f}'})
        return loss

    def validate(self, dataloader, state: Optional[TrainState] = None):
        """Full-dataset validation; histogram accumulates ON DEVICE so the
        IoU is exact over the epoch (the reference averages per-batch IoUs,
        reference :427-431 -- we keep 'iou' as that mean for parity and add
        'iou_epoch' as the exact histogram-based value)."""
        params = state.params if state is not None else self.model.params
        stats = state.batch_stats if state is not None else self.model.batch_stats
        params, stats = _local_eval_variables(params, stats)
        self._build_steps()

        total_loss, per_batch_iou, per_batch_acc, n = 0.0, [], [], 0
        hist_sum = None
        for batch_idx, (images, masks) in enumerate(_raw_batches(dataloader)):
            m = self._eval_step(params, stats, images, masks)
            total_loss += float(m["loss"])
            per_batch_iou.append(float(m["iou"]))
            per_batch_acc.append(float(m["accuracy"]))
            hist_sum = m["hist"] if hist_sum is None else hist_sum + m["hist"]
            n += 1

            if batch_idx % Config.LOG_INTERVAL == 0:
                logits = self._predict_step(params, stats, images[:1])
                self._log_predictions(images[0], masks[0], logits[0],
                                      self.current_epoch, prefix="val")
                self._log_confusion_matrix(m["hist"], self.current_epoch, "val")
                self._log_roc_curves(logits, masks[:1], self.current_epoch, "val")
                self._log_pr_curves(logits, masks[:1], self.current_epoch, "val")

        _, epoch_iou = iou_from_hist(hist_sum) if hist_sum is not None else (None, 0.0)
        avg = {
            "loss": total_loss / max(n, 1),
            "iou": float(np.mean(per_batch_iou)) if per_batch_iou else 0.0,
            "accuracy": float(np.mean(per_batch_acc)) if per_batch_acc else 0.0,
            "iou_epoch": float(epoch_iou),
        }
        for k, v in avg.items():
            self.logger.log_scalar(f"val/{k}", v, self.current_epoch)
        return avg

    # ------------------------------------------------------------------
    def train(self, train_dataloader, valid_dataloader, epochs: int,
              learning_rate: float, patience: int = 7):
        """Full training run (reference :459-503)."""
        self._build_steps()
        self._lr = float(learning_rate)
        tx = adam(learning_rate)
        state = TrainState.from_bundle(self.model, tx)
        state = self._setup_mesh(train_dataloader, state)

        early_stopping = EarlyStopping(
            patience=patience, mode="max", min_epochs=10,
            metrics_to_track=["loss", "iou", "accuracy"],
            weights={"loss": -1.0, "iou": 1.0, "accuracy": 0.5},
            verbose=True)

        self.current_epoch = 0
        profile_dir = os.environ.get("UDA_TPU_PROFILE")
        for epoch in range(1, epochs + 1):
            self.current_epoch = epoch
            if profile_dir and epoch == 2:
                # trace the first post-compile epoch (epoch 1 includes
                # compilation; SURVEY.md section 5.1)
                from uda_aerial_semantic_segmentation_research_tpu.utils.profiling import (
                    trace,
                )

                with trace(profile_dir):
                    state, train_loss = self.train_epoch(
                        train_dataloader, state, epoch)
            else:
                state, train_loss = self.train_epoch(
                    train_dataloader, state, epoch)
            valid_metrics = self.validate(valid_dataloader, state)

            print(f"Train Loss: {train_loss:.4f}")
            print(f'Valid Loss: {valid_metrics["loss"]:.4f}')
            print(f"Valid Metrics: {valid_metrics}")

            if early_stopping(epoch, valid_metrics, self.logger):
                print(f"Early stopping triggered. Best metrics: "
                      f"{early_stopping.get_best_metrics()}")
                break

            if valid_metrics == early_stopping.get_best_metrics():
                state.write_back(self.model)
                model_path = Path(Config.CHECKPOINTS_DIR) / "best_model.pth"
                save_checkpoint({
                    "epoch": epoch,
                    "model_state_dict": self.model.state_dict(),
                    "optimizer_state_dict": state.opt_state,
                    "metrics": valid_metrics,
                    "improvement_rates": early_stopping.get_improvement_rate(),
                }, model_path)
                print("Saved new best model!")

        state.write_back(self.model)
        self.logger.close()
        return early_stopping.get_best_metrics()


def train_model(epochs: Optional[int] = None, learning_rate: Optional[float] = None,
                batch_size: Optional[int] = None, start_tensorboard: bool = False):
    """Standalone training entry point (reference src/models/train.py:505-706).

    Loads the class dictionary, builds the sample-dataset loaders with
    weighted sampling, creates the configured model, and runs
    dice-supervised training with best-loss checkpointing.
    """
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
        random_split,
    )
    from uda_aerial_semantic_segmentation_research_tpu.data.loader import DataLoader
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet  # noqa: F401
    from uda_aerial_semantic_segmentation_research_tpu.parallel import (
        distributed as dist,
    )

    dist.initialize()  # env-gated multi-host entry; no-op single-process
    epochs = epochs or Config.NUM_EPOCHS
    learning_rate = learning_rate or Config.LEARNING_RATE
    batch_size = batch_size or Config.BATCH_SIZE

    class_df = load_class_dict()
    if start_tensorboard:
        launch_tensorboard(Config.LOGS_DIR)

    device = Config.get_device()
    print(f"Backend: {device}; devices: {jax.device_count()}")

    dataset = DroneDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        masks_dir=os.path.join(Config.SAMPLE_DATA_DIR, "label_images_semantic"),
        balance_classes=True)
    train_size = int(Config.TRAIN_VAL_SPLIT * len(dataset))
    train_ds, val_ds = random_split(
        dataset, [train_size, len(dataset) - train_size], seed=Config.SEED)
    sampler = dataset.get_sampler(indices=train_ds.indices)
    train_loader = DataLoader(train_ds, batch_size=batch_size, sampler=sampler,
                              drop_last=False, num_workers=Config.NUM_WORKERS)
    val_loader = DataLoader(val_ds, batch_size=batch_size)

    from uda_aerial_semantic_segmentation_research_tpu.models import create_model

    # architecture selected by name, like the reference's
    # getattr(smp, model_name)(...) (reference train.py:570-576)
    bundle = create_model(model_name=Config.MODEL_NAME,
                          encoder_name=Config.ENCODER_NAME,
                          encoder_weights=Config.ENCODER_WEIGHTS,
                          in_channels=Config.IN_CHANNELS,
                          classes=Config.NUM_CLASSES)
    print(f"Model: {Config.MODEL_NAME} ({bundle.param_count():,} params)")

    trainer = SegmentationTrainer(bundle, device)
    best = trainer.train(train_loader, val_loader, epochs=epochs,
                         learning_rate=learning_rate, patience=Config.PATIENCE)

    # best-loss checkpoint under CHECKPOINT_DIR (reference :672-681 uses the
    # alternative Config spelling)
    final_path = Path(Config.CHECKPOINT_DIR) / "final_model.pth"
    save_checkpoint({"model_state_dict": bundle.state_dict(),
                     "metrics": best, "class_dict": None if class_df is None
                     else class_df.to_dict()}, final_path)
    print(f"Saved final model to {final_path}")
    return bundle, best


# kept for reference-parity scoring of the dice path (train.py:585-592)
dice_loss = DiceLoss()

if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(
        description="Supervised segmentation training (reference train_model CLI)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--learning-rate", type=float, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--tensorboard", action="store_true",
                        help="launch a TensorBoard server on the log dir")
    args = parser.parse_args()
    Config.apply_env_overrides()
    train_model(epochs=args.epochs, learning_rate=args.learning_rate,
                batch_size=args.batch_size, start_tensorboard=args.tensorboard)
