"""Global configuration.

The reference imports a ``Config`` static class from ``src/models/config.py``
(missing from its snapshot; surface reconstructed from the 23 attribute call
sites -- see reference src/test_system.py:14, src/models/train.py:13,
src/models/predict.py:8 and SURVEY.md section 2.1).  We keep the exact
attribute names so the test-suite surface matches, and add TPU-specific
fields (dtype, mesh axis) that have no reference analogue.
"""

from __future__ import annotations

import os
from pathlib import Path


class Config:
    """Static hyperparameter / path configuration (reference Config surface)."""

    # --- model -----------------------------------------------------------
    NUM_CLASSES: int = 23                 # Semantic Drone Dataset classes
    ENCODER_NAME: str = "resnet34"        # reference default encoder
    ENCODER_WEIGHTS: str | None = "imagenet"
    IN_CHANNELS: int = 3
    MODEL_NAME: str = "Unet"
    IMAGE_SIZE: int = 256                 # training tile size (reference target_dataset.py:10)

    # --- data ------------------------------------------------------------
    DATA_DIR: str = "data"
    SAMPLE_DATA_DIR: str = os.path.join("data", "sample", "semantic_drone")
    TARGET_DATA_DIR: str = os.path.join("data", "target", "holyrood")
    SAMPLE_HOLYROOD_DIR: str = os.path.join("data", "sample", "holyrood")
    TRAIN_VAL_SPLIT: float = 0.8
    BATCH_SIZE: int = 8
    NUM_WORKERS: int = 2                  # host prefetch threads
    NORMALIZE_MEAN: tuple = (0.485, 0.456, 0.406)   # ImageNet stats
    NORMALIZE_STD: tuple = (0.229, 0.224, 0.225)

    # --- training --------------------------------------------------------
    LEARNING_RATE: float = 1e-4
    NUM_EPOCHS: int = 50
    PATIENCE: int = 7
    LOG_INTERVAL: int = 10
    SEED: int = 0

    # --- paths -----------------------------------------------------------
    LOGS_DIR: str = "logs"
    CHECKPOINTS_DIR: str = "checkpoints"
    # The reference uses both spellings (train.py:674 vs test_system.py:255).
    CHECKPOINT_DIR: str = "checkpoints"
    RESULTS_DIR: str = "results"

    # --- TPU-native knobs (no reference analogue) --------------------------
    COMPUTE_DTYPE: str = "bfloat16"       # activations/matmuls on MXU
    PARAM_DTYPE: str = "float32"          # master weights & optimizer state
    MESH_AXIS: str = "data"               # data-parallel mesh axis name
    DEVICE: str = "auto"                  # 'auto' | 'tpu' | 'cpu'

    @classmethod
    def apply_env_overrides(cls) -> None:
        """Scale-down knobs for CPU/CI runs via environment variables.

        ``UDA_TPU_IMAGE_SIZE`` / ``UDA_TPU_ENCODER`` / ``UDA_TPU_BATCH_SIZE``
        / ``UDA_TPU_NUM_CLASSES`` override the defaults (the reference
        scales its memory-heavy suites down with hardcoded kwargs,
        reference src/test_system.py:617-657; env vars keep one CLI).
        """
        if os.environ.get("UDA_TPU_IMAGE_SIZE"):
            cls.IMAGE_SIZE = int(os.environ["UDA_TPU_IMAGE_SIZE"])
        if os.environ.get("UDA_TPU_ENCODER"):
            cls.ENCODER_NAME = os.environ["UDA_TPU_ENCODER"]
        if os.environ.get("UDA_TPU_BATCH_SIZE"):
            cls.BATCH_SIZE = int(os.environ["UDA_TPU_BATCH_SIZE"])
        if os.environ.get("UDA_TPU_NUM_CLASSES"):
            cls.NUM_CLASSES = int(os.environ["UDA_TPU_NUM_CLASSES"])

    @classmethod
    def get_device(cls) -> str:
        """Return the JAX backend in use ('tpu' / 'cpu' / ...).

        Reference analogue: Config.get_device() returning a torch.device
        (called at reference src/models/train.py:515,519).
        """
        if cls.DEVICE != "auto":
            return cls.DEVICE
        import jax

        return jax.default_backend()

    @classmethod
    def setup_directories(cls) -> None:
        """Create the workspace directory layout.

        Reference analogue: Config.setup_directories()
        (called at reference src/test_system.py:712); dir set mirrors
        reference setup.sh:15-20.
        """
        for d in (
            cls.LOGS_DIR,
            cls.CHECKPOINTS_DIR,
            cls.DATA_DIR,
            os.path.join(cls.DATA_DIR, "source"),
            os.path.join(cls.DATA_DIR, "target"),
            os.path.join(cls.RESULTS_DIR, "plots"),
            os.path.join(cls.RESULTS_DIR, "metrics"),
        ):
            Path(d).mkdir(parents=True, exist_ok=True)

    @classmethod
    def compute_dtype(cls):
        import jax.numpy as jnp

        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cls.COMPUTE_DTYPE]
