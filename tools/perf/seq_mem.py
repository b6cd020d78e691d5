"""Per-program TPU memory analysis of the sequential phase-3 step.

Usage: seq_mem.py <variant> <B>   (variant tokens: bf16, remat, blog)
AOT-compiles each sub-program for the TPU and prints its temp/peak
bytes -- finds WHICH program blows the 15.75G budget.
"""
import re, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import (
    create_unet, create_discriminator)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import FineTuningLoss

name, B = sys.argv[1], int(sys.argv[2])
TILE, CLASSES = 512, 23
kw = {}
if "blog" in name:
    kw["logits_dtype"] = jnp.bfloat16
remat = False
if "stage" in name:
    remat = re.search(r"stage\d+", name).group(0)
elif "remat_e" in name:
    remat = "encoder"
elif "remat_d" in name:
    remat = "decoder"
elif "remat" in name:
    remat = True
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE,
                     remat=remat, **kw)
disc = create_discriminator(input_channels=3, image_size=TILE)
step = step_lib.make_unsupervised_sequential_step(
    bundle.module, disc.module, CLASSES, FineTuningLoss(),
    carry_dtype=(jnp.bfloat16 if "bf16" in name else None))

tx = adam(1e-4, clip_norm=1.0)
params = {"seg": bundle.params, "disc": disc.params}
stats = {"seg": bundle.batch_stats, "disc": disc.batch_stats}
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=stats, opt_state=tx.init(params), tx=tx)

key = jax.random.key(0)
img = jax.ShapeDtypeStruct((B, TILE, TILE, 3), jnp.uint8)
epoch = jax.ShapeDtypeStruct((), jnp.float32)

P = step.programs


def analyze(name, fn, *args):
    try:
        c = fn.lower(*args).compile()
        ma = c.memory_analysis()
        t = getattr(ma, "temp_size_in_bytes", None)
        print(f"{name}: temp={t/2**30:.2f}G "
              f"args={ma.argument_size_in_bytes/2**30:.2f}G "
              f"out={ma.output_size_in_bytes/2**30:.2f}G "
              f"alias={ma.alias_size_in_bytes/2**30:.2f}G", flush=True)
        return c
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)
        return None


sds = lambda x: jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), x)

kd = sds(key)
stepi = sds(state.step)
pseg = sds(params["seg"])
pdisc = sds(params["disc"])
sseg = sds(stats["seg"])
sdisc = sds(stats["disc"])

cprep = analyze("prep", P["prep"], kd, stepi, img)
out_aval = jax.eval_shape(lambda k, s, t: P["prep"](k, s, t), kd, stepi, img)
v1a, v2a = [jax.ShapeDtypeStruct(o.shape, o.dtype) for o in out_aval]

fv_out = jax.eval_shape(lambda p, s, v: P["fwd_view1"](p, s, v),
                        pseg, sseg, v1a)
z1a = jax.ShapeDtypeStruct(fv_out[0].shape, fv_out[0].dtype)
st1a = sds(fv_out[1])
analyze("fwd_view1", P["fwd_view1"], pseg, sseg, v1a)
gv2_out = jax.eval_shape(lambda p, s, e, v, z: P["grad_view2"](p, s, e, v, z),
                         pseg, st1a, epoch, v2a, z1a)
z2a = jax.ShapeDtypeStruct(gv2_out[2].shape, gv2_out[2].dtype)
analyze("grad_view2", P["grad_view2"], pseg, st1a, epoch, v2a, z1a)
analyze("grad_view1", P["grad_view1"], pseg, sseg, epoch, v1a, z2a)
analyze("grad_disc", P["grad_disc"], pdisc, sdisc, sds(img), epoch)
print("done", flush=True)
