"""Capture a jax.profiler trace of the full train step at bench shape."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam

TILE, B, CLASSES = 512, 128, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE)
step = step_lib.make_supervised_train_step(bundle.module, CLASSES)
state = TrainState.from_bundle(bundle, adam(1e-4))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)

for i in range(3):
    state, metrics = step(state, jax.random.fold_in(key, i), images, masks)
print("warm loss", float(metrics["loss"]), flush=True)

jax.profiler.start_trace("/tmp/trace_full")
for i in range(3):
    state, metrics = step(state, jax.random.fold_in(key, 10 + i), images, masks)
float(metrics["loss"])
jax.profiler.stop_trace()
print("trace done", flush=True)
