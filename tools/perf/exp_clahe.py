"""Full supervised step with the CLAHE scan un-chunked (one _clahe_impl
call over the whole compacted subset).  Usage: exp_clahe.py <chunk> <B>"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
import uda_aerial_semantic_segmentation_research_tpu.ops.augment as aug

chunk, B = int(sys.argv[1]), int(sys.argv[2])
_orig = aug._clahe_rgb
aug._clahe_rgb = lambda x, clip, tiles=8: _orig(x, clip, tiles, chunk=chunk)

from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam

TILE, CLASSES = 512, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE)
step = step_lib.make_supervised_train_step(bundle.module, CLASSES)
state = TrainState.from_bundle(bundle, adam(1e-4))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)
t0 = time.perf_counter()
for i in range(3):
    state, m = step(state, jax.random.fold_in(key, i), images, masks)
print(f"clahe_chunk={chunk} B={B}: compile+warmup {time.perf_counter()-t0:.0f}s "
      f"loss={float(m['loss']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = step(state, jax.random.fold_in(key, 100 + i), images, masks)
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"clahe_chunk={chunk} B={B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} tiles/s",
      flush=True)
