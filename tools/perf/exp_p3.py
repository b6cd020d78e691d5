"""Phase-3 sequential-step timing with selectable remat granularity.
Usage: exp_p3.py <remat: full|encoder|decoder|none> <B>"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import (
    create_unet, create_discriminator)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import FineTuningLoss

name, B = sys.argv[1], int(sys.argv[2])
remat = {"full": True, "encoder": "encoder", "decoder": "decoder",
         "none": False, "convs": "convs", "encoder_convs": "encoder_convs",
         "decoder_convs": "decoder_convs"}.get(name, name)
TILE, CLASSES = 512, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE, remat=remat,
                     logits_dtype=jnp.bfloat16)
disc = create_discriminator(input_channels=3, image_size=TILE)
unsup = step_lib.make_unsupervised_sequential_step(
    bundle.module, disc.module, CLASSES, FineTuningLoss(),
    carry_dtype=jnp.bfloat16)
tx = adam(1e-4, clip_norm=1.0)
params = {"seg": bundle.params, "disc": disc.params}
stats = {"seg": bundle.batch_stats, "disc": disc.batch_stats}
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=stats, opt_state=tx.init(params), tx=tx)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
key = jax.random.key(0)
t0 = time.perf_counter()
for i in range(3):
    state, m = unsup(state, jax.random.fold_in(key, i), images,
                     jnp.float32(1.0))
print(f"p3 remat={name} B={B}: compile+warmup {time.perf_counter()-t0:.0f}s "
      f"total={float(m['total']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = unsup(state, jax.random.fold_in(key, 100 + i), images,
                     jnp.float32(1.0))
float(m["total"])
dt = (time.perf_counter() - t0) / N
print(f"p3 remat={name} B={B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} tiles/s",
      flush=True)
