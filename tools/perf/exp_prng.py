"""Supervised-step A/B of the PRNG implementation behind jax.random.

threefry2x32 (JAX default) generates bits with VPU ALU ops; the "rbg"
impl keeps threefry-quality key derivation (split/fold_in) but draws
bulk bits through the TPU's hardware RngBitGenerator HLO.  The augment
pipeline draws ~40M+ random numbers per step (noise subset, Bernoulli
gates, warp/photometric params), so the generator is a measurable VPU
cost.  Usage: exp_prng.py <impl: threefry2x32|rbg|unsafe_rbg> <B>
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam

impl, B = sys.argv[1], int(sys.argv[2])
TILE, CLASSES = 512, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE)
step = step_lib.make_supervised_train_step(bundle.module, CLASSES)
state = TrainState.from_bundle(bundle, adam(1e-4))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0, impl=impl)
t0 = time.perf_counter()
for i in range(3):
    state, m = step(state, jax.random.fold_in(key, i), images, masks)
print(f"prng={impl} B={B}: compile+warmup {time.perf_counter()-t0:.0f}s "
      f"loss={float(m['loss']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = step(state, jax.random.fold_in(key, 100 + i), images, masks)
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"prng={impl} B={B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} tiles/s",
      flush=True)
