"""Phase-2 fused vs sequential (3-program) step timing.
Usage: exp_adv_seq.py <fused|seq> <B>"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import (
    create_unet, create_discriminator)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState, AdversarialState, adam)

name, B = sys.argv[1], int(sys.argv[2])
TILE, CLASSES = 512, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE)
disc = create_discriminator(input_channels=3, image_size=TILE)
make = (step_lib.make_adversarial_sequential_step if name == "seq"
        else step_lib.make_adversarial_train_step)
adv = make(bundle.module, disc.module, CLASSES)


def make_state():
    return AdversarialState(seg=TrainState.from_bundle(bundle, adam(1e-4)),
                            disc=TrainState.from_bundle(disc, adam(1e-4)))


state = make_state()
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)
t0 = time.perf_counter()
for i in range(3):
    state, m = adv(state, jax.random.fold_in(key, i), images, masks,
                   images[::-1])
print(f"adv={name} B={B}: compile+warmup {time.perf_counter()-t0:.0f}s "
      f"loss={float(m['loss']):.4f} d={float(m['d_loss']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = adv(state, jax.random.fold_in(key, 100 + i), images, masks,
                   images[::-1])
jax.block_until_ready(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"adv={name} B={B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} tiles/s",
      flush=True)
