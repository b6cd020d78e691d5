"""Capture a jax.profiler trace of the phase-2 adversarial step at bench
shape (B=128 @ 512px, resnet34).  Parse with tools/perf/parse6.py."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import (
    create_unet, create_discriminator)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState, AdversarialState, adam)

TILE, B, CLASSES = 512, 128, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE)
disc = create_discriminator(input_channels=3, image_size=TILE)
adv = step_lib.make_adversarial_train_step(bundle.module, disc.module, CLASSES)
state = AdversarialState(seg=TrainState.from_bundle(bundle, adam(1e-4)),
                         disc=TrainState.from_bundle(disc, adam(1e-4)))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)

for i in range(3):
    state, metrics = adv(state, jax.random.fold_in(key, i), images, masks,
                         images[::-1])
print("warm", {k: float(v) for k, v in list(metrics.items())[:3]}, flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, metrics = adv(state, jax.random.fold_in(key, 50 + i), images,
                         masks, images[::-1])
jax.block_until_ready(metrics)
print(f"{(time.perf_counter()-t0)/N*1e3:.1f} ms/step", flush=True)

jax.profiler.start_trace("/tmp/trace_adv")
for i in range(3):
    state, metrics = adv(state, jax.random.fold_in(key, 100 + i), images,
                         masks, images[::-1])
jax.block_until_ready(metrics)
jax.profiler.stop_trace()
print("trace done", flush=True)
