"""Pytest configuration: CPU backend with a virtual 8-device mesh.

Multi-chip sharding tests run on CPU via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4).  All
fixtures use tiny shapes: this host has one CPU core and XLA compile
time dominates, so compiled step functions are shared session-wide.
"""

import os

# must run before any backend initialization
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# In the axon environment, sitecustomize.py re-registers the remote TPU
# and sets jax_platforms="axon,cpu" at interpreter start, silently
# overriding JAX_PLATFORMS=cpu; tests must run on the local CPU mesh.
jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compilation cache here -- in this
# environment CPU compiles can be served by a remote compile service
# whose AOT results target different host features (observed
# "+prefer-no-scatter not supported on the host machine" -> SIGILL risk).

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SIZE = 32          # tile size for all model tests
CLASSES = 7        # scaled-down class count
BATCH = 2


@pytest.fixture(scope="session")
def workspace(tmp_path_factory):
    """Session workspace dir with synthetic fixtures; cwd is moved there."""
    ws = tmp_path_factory.mktemp("workspace")
    old = os.getcwd()
    os.chdir(ws)

    from uda_aerial_semantic_segmentation_research_tpu.config import Config

    Config.IMAGE_SIZE = SIZE
    Config.ENCODER_NAME = "resnet18"
    Config.BATCH_SIZE = BATCH
    Config.NUM_WORKERS = 0
    Config.setup_directories()

    from uda_aerial_semantic_segmentation_research_tpu.data.setup_test_data import (
        setup_test_data,
    )

    setup_test_data(num_source=6, num_holyrood=4, image_size=SIZE, force=True)
    yield ws
    os.chdir(old)


@pytest.fixture(scope="session")
def seg_bundle():
    """Shared tiny U-Net bundle (resnet18 @ 32px, 7 classes, fp32)."""
    import jax.numpy as jnp

    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet

    return create_unet(encoder_name="resnet18", classes=CLASSES,
                       image_size=SIZE, encoder_weights=None,
                       dtype=jnp.float32)


@pytest.fixture(scope="session")
def disc_bundle():
    import jax.numpy as jnp

    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_discriminator,
    )

    return create_discriminator(image_size=SIZE, dtype=jnp.float32)


@pytest.fixture(scope="session")
def batch():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.uint8)
    masks = rng.integers(0, CLASSES, (BATCH, SIZE, SIZE)).astype(np.int32)
    return images, masks
