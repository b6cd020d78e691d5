"""Round-3 session: step-cost decomposition variants. Usage: exp_c.py <variant> <B>

Variants isolate the supervised-step cost buckets at bench shape:
  nometrics  - full WEAK augment, loss only (no argmax/hist/IoU)
  nowarp     - WEAK with p_shift_scale_rotate=0, p_distort=0
  noclahe    - WEAK with p_clahe=0
  nophoto    - WEAK geometric only (dihedral+warp; no color/blur/noise/clahe)
  i8hist     - full step with UDA_TPU_INT8_HIST=1 (set env before launch)
  base       - control (production default step)
"""
import sys, time, dataclasses
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam
from uda_aerial_semantic_segmentation_research_tpu.ops.augment import WEAK
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import softmax_cross_entropy
from functools import partial

name, B = sys.argv[1], int(sys.argv[2])
TILE, CLASSES = 512, 23

AUGS = {
    "base": WEAK,
    "nometrics": WEAK,
    "nowarp": dataclasses.replace(WEAK, p_ssr=0.0, p_distort=0.0),
    "noclahe": dataclasses.replace(WEAK, clahe_clip=0.0),
    "nophoto": dataclasses.replace(WEAK, p_noise=0.0, p_blur=0.0,
                                   p_color=0.0, p_hsv=0.0),
    "i8hist": WEAK,
}
aug = AUGS[name]
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE)

if name == "nometrics":
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import augment_batch

    module = bundle.module

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, key, images, masks):
        key = jax.random.fold_in(key, state.step)
        x, m = augment_batch(key, images, masks, cfg=aug)

        def loss_fn(params):
            logits, new_stats = step_lib._apply_train(
                module, params, state.batch_stats, x)
            return softmax_cross_entropy(logits, m), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, batch_stats=new_stats)
        return state, {"loss": loss}
else:
    step = step_lib.make_supervised_train_step(bundle.module, CLASSES, aug_cfg=aug)

state = TrainState.from_bundle(bundle, adam(1e-4))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)
t0 = time.perf_counter()
for i in range(3):
    state, m = step(state, jax.random.fold_in(key, i), images, masks)
print(f"{name} B={B}: compile+warmup {time.perf_counter()-t0:.0f}s "
      f"loss={float(m['loss']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = step(state, jax.random.fold_in(key, 100 + i), images, masks)
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"{name} B={B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} tiles/s", flush=True)
