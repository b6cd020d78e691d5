"""Checkpoint I/O + TensorBoard event-writer round-trip tests.

The event files must parse back with tensorboard's event_accumulator --
the same artifact-level assertion the reference test harness makes
(reference src/test_system.py:223-242).
"""

import collections
import time

import numpy as np

# module-level so pickle can resolve it (optax states are module-level
# NamedTuples in real checkpoints)
Opt = collections.namedtuple("Opt", ["mu", "nu"])

from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    obj = {
        "epoch": 3,
        "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "b": {"c": np.ones(4)}},
        "opt": Opt(mu=np.zeros(2), nu=[np.ones(1), 2.5]),
        "metrics": {"iou": 0.5},
    }
    path = tmp_path / "ckpt.pth"
    save_checkpoint(obj, path)
    back = load_checkpoint(path)
    assert back["epoch"] == 3
    np.testing.assert_array_equal(back["params"]["a"], obj["params"]["a"])
    np.testing.assert_array_equal(back["opt"].mu, obj["opt"].mu)
    assert back["metrics"]["iou"] == 0.5


def test_checkpoint_bfloat16_converted(tmp_path):
    import jax.numpy as jnp

    obj = {"w": jnp.ones((2, 2), jnp.bfloat16)}
    path = tmp_path / "bf16.pth"
    save_checkpoint(obj, path)
    back = load_checkpoint(path)
    assert back["w"].dtype == np.float32


def test_tb_logger_roundtrip(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from tensorboard.backend.event_processing import event_accumulator

    from uda_aerial_semantic_segmentation_research_tpu.visualization.tensorboard_logger import (
        TensorboardLogger,
    )

    logger = TensorboardLogger(log_dir=str(tmp_path))
    logger.log_scalar("test/loss", 0.5, 1)
    logger.log_scalar("test/loss", 0.25, 2)
    logger.log_scalars("test/metrics", {"accuracy": 0.85, "precision": 0.78}, 1)
    logger.log_image("test/image_f32", np.random.rand(16, 16, 3).astype(np.float32), 1)
    logger.log_image("test/image_chw", np.random.rand(3, 16, 16).astype(np.float32), 1)
    logger.log_image("test/label_map", np.random.randint(0, 5, (16, 16)), 1)
    fig, ax = plt.subplots()
    ax.plot([1, 2], [3, 4])
    logger.log_figure("test/figure", fig, 1)
    logger.log_histogram("test/hist", np.random.randn(500), 1)
    logger.log_text("test/text", "hello")
    logger.close()
    time.sleep(0.2)

    event_files = list(logger.log_dir.glob("events.out.tfevents.*"))
    assert event_files, "no event file written"
    ea = event_accumulator.EventAccumulator(str(event_files[0]))
    ea.Reload()
    tags = ea.Tags()
    assert "test/loss" in tags["scalars"]
    assert "test/metrics/accuracy" in tags["scalars"]
    assert "test/image_f32" in tags["images"]
    assert "test/figure" in tags["images"]
    assert "test/hist" in tags["histograms"]

    vals = [e.value for e in ea.Scalars("test/loss")]
    assert vals == [0.5, 0.25]


def test_overlay_utils():
    from uda_aerial_semantic_segmentation_research_tpu.visualization.utils import (
        colorize_mask,
        create_overlay,
    )

    mask = np.random.randint(0, 10, (8, 8))
    colored = colorize_mask(mask, 10)
    assert colored.shape == (8, 8, 3)
    img = np.random.rand(8, 8, 3).astype(np.float32)
    out = create_overlay(img, mask, alpha=0.5)
    assert out.shape == (8, 8, 3)
    assert out.min() >= 0 and out.max() <= 1
    # CHW input accepted
    out2 = create_overlay(np.transpose(img, (2, 0, 1)), mask)
    assert out2.shape == (8, 8, 3)


def test_orbax_async_pytree_checkpoint(tmp_path):
    """Async Orbax checkpointing of device pytrees (SURVEY.md section 5.4)."""
    import jax.numpy as jnp

    from uda_aerial_semantic_segmentation_research_tpu.utils.checkpoint import (
        AsyncPytreeCheckpointer,
    )

    c = AsyncPytreeCheckpointer()
    tree = {"params": {"w": jnp.ones((4, 4)), "b": jnp.zeros(3)},
            "step": jnp.int32(7)}
    path = tmp_path / "orbax_ckpt"
    c.save(path, tree)
    c.wait()
    back = c.restore(path, target=tree)
    assert np.allclose(np.asarray(back["params"]["w"]), 1.0)
    assert int(back["step"]) == 7
    c.close()
