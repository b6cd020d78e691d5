"""Dump the optimized HLO of the production supervised step to /tmp/step_hlo.txt."""
import sys
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
images = jnp.zeros((B, TILE, TILE, 3), jnp.uint8)
masks = jnp.zeros((B, TILE, TILE), jnp.int32)
key = jax.random.key(0)
lowered = step.lower(state, key, images, masks)
compiled = lowered.compile()
txt = compiled.as_text()
open("/tmp/step_hlo.txt", "w").write(txt)
print("bytes:", len(txt), flush=True)
