"""Phase-2 step timing. Usage: adv_exp.py <seq|concat> <B> [remat]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import (
    create_unet, create_discriminator)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState, AdversarialState, adam)

name, B = sys.argv[1], int(sys.argv[2])
remat = len(sys.argv) > 3 and sys.argv[3] == "remat"
TILE, CLASSES = 512, 23
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE, remat=remat)
disc = create_discriminator(input_channels=3, image_size=TILE)
adv = step_lib.make_adversarial_train_step(bundle.module, disc.module, CLASSES,
                                           concat_disc=(name == "concat"))
state = AdversarialState(seg=TrainState.from_bundle(bundle, adam(1e-4)),
                         disc=TrainState.from_bundle(disc, adam(1e-4)))
t0 = time.perf_counter()
for i in range(3):
    state, m = adv(state, jax.random.fold_in(key, i), images, masks,
                   images[::-1])
print(f"adv/{name}{'/remat' if remat else ''} B={B}: compile+warmup "
      f"{time.perf_counter()-t0:.0f}s loss={float(m['loss']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = adv(state, jax.random.fold_in(key, 100 + i), images, masks,
                   images[::-1])
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"adv/{name}{'/remat' if remat else ''} B={B}: {dt*1e3:.1f} ms/step  "
      f"{B/dt:.1f} tiles/s", flush=True)
