"""Step timing at configurable batch. Usage: exp_b.py <variant> <B>"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam
from uda_aerial_semantic_segmentation_research_tpu.ops.augment import NONE, WEAK

name, B = sys.argv[1], int(sys.argv[2])
TILE, CLASSES = 512, 23
VARIANTS = {
    "base": dict(unet={}, fused_ce=False),
    "dec": dict(unet=dict(fused_decoder=True), fused_ce=False),
    "fce": dict(unet=dict(logits_dtype=jnp.bfloat16), fused_ce=True),
    "blog": dict(unet=dict(logits_dtype=jnp.bfloat16), fused_ce=False),
    "noaug": dict(unet={}, fused_ce=False, aug=NONE),
    "remat": dict(unet=dict(remat=True), fused_ce=False),
    "pdih_exact": None,  # filled below
    "pdih_fast": None,
    "remat_blog": dict(unet=dict(remat=True, logits_dtype=jnp.bfloat16), fused_ce=False),
    "remat_dec": dict(unet=dict(remat=True, fused_decoder=True), fused_ce=False),
    "packed": dict(unet=dict(packed_decoder=True), fused_ce=False),
    "fdec2": dict(unet=dict(fused_decoder=True), fused_ce=False),
    "packed_fdec": dict(unet=dict(packed_decoder=True, fused_decoder=True), fused_ce=False),
    "packed_fdec_blog": dict(unet=dict(packed_decoder=True, fused_decoder=True,
                                       logits_dtype=jnp.bfloat16), fused_ce=False),
    "fdec34": dict(unet=dict(fused_decoder=(3, 4)), fused_ce=False),
    "fdec4": dict(unet=dict(fused_decoder=(4,)), fused_ce=False),
    "dil": dict(unet=dict(fused_decoder="dilated"), fused_ce=False),
    "packed_fdec34": dict(unet=dict(packed_decoder=True, fused_decoder=(3, 4)),
                          fused_ce=False),
    "remat_packed": dict(unet=dict(remat=True, packed_decoder=True), fused_ce=False),
    "packed_blog": dict(unet=dict(packed_decoder=True, logits_dtype=jnp.bfloat16),
                        fused_ce=False),
    "remat_packed_blog": dict(unet=dict(remat=True, packed_decoder=True,
                                        logits_dtype=jnp.bfloat16), fused_ce=False),
    "remat_d": dict(unet=dict(remat="decoder"), fused_ce=False),
    "remat_e": dict(unet=dict(remat="encoder"), fused_ce=False),
    "nodil": dict(unet=dict(fused_decoder=False), fused_ce=False),
}
import dataclasses
VARIANTS["pdih_exact"] = dict(unet={}, fused_ce=False,
                              aug=dataclasses.replace(WEAK, pallas_dihedral="exact"))
VARIANTS["pdih_fast"] = dict(unet={}, fused_ce=False,
                             aug=dataclasses.replace(WEAK, pallas_dihedral="fast"))
v = VARIANTS[name]
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
key = jax.random.key(0)
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE, **v["unet"])
step = step_lib.make_supervised_train_step(bundle.module, CLASSES,
                                           aug_cfg=v.get("aug", WEAK),
                                           fused_ce=v["fused_ce"])
state = TrainState.from_bundle(bundle, adam(1e-4))
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
