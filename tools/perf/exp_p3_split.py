"""Per-program wall times of the phase-3 sequential step at bench shape.
Dispatches each program separately with block_until_ready to attribute
the 969 ms step across prep / fwd_view1 / grad_view2 / grad_view1 /
grad_disc / combine.  Usage: exp_p3_split.py [B]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import (
    create_unet, create_discriminator)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import FineTuningLoss

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TILE, CLASSES = 512, 23
bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                     classes=CLASSES, image_size=TILE, remat="encoder",
                     logits_dtype=jnp.bfloat16)
disc = create_discriminator(input_channels=3, image_size=TILE)
ftl = FineTuningLoss()
unsup = step_lib.make_unsupervised_sequential_step(
    bundle.module, disc.module, CLASSES, ftl, carry_dtype=jnp.bfloat16)
P = unsup.programs
tx = adam(1e-4, clip_norm=1.0)
params = {"seg": bundle.params, "disc": disc.params}
stats = {"seg": bundle.batch_stats, "disc": disc.batch_stats}
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=stats, opt_state=tx.init(params), tx=tx)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
key = jax.random.key(0)
epoch = jnp.float32(1.0)

# warm the full step (compiles everything)
for i in range(2):
    state, m = unsup(state, jax.random.fold_in(key, i), images, epoch)
jax.block_until_ready(m["total"])
print("warm total", float(m["total"]), flush=True)


def timeit(name, fn, *args, n=5, donatefix=None):
    outs = None
    ts = []
    for i in range(n):
        # re-make donated inputs each call
        a = donatefix() if donatefix else args
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        outs = fn(*a)
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} {min(ts)*1e3:8.1f} ms", flush=True)
    return outs


k = jax.random.fold_in(key, 99)
v1, v2 = timeit("prep", P["prep"], k, state.step, images)
# prep donates nothing; grad programs donate views -> rebuild per call
z1, stats1 = timeit("fwd_view1", P["fwd_view1"], state.params["seg"],
                    state.batch_stats["seg"], v1)


def mk_gv2():
    vv = jnp.array(v2)
    zz = jnp.array(z1)
    return (state.params["seg"], stats1, epoch, vv, zz)


g2, cons_v, z2, stats2 = timeit("grad_view2", P["grad_view2"],
                                donatefix=mk_gv2)


def mk_gv1():
    return (state.params["seg"], state.batch_stats["seg"], epoch,
            jnp.array(v1), jnp.array(z2))


g1 = timeit("grad_view1", P["grad_view1"], donatefix=mk_gv1)


def mk_gd():
    return (state.params["disc"], state.batch_stats["disc"], images,
            epoch)


gd, dom_v, disc_stats, dlogits = timeit("grad_disc", P["grad_disc"],
                                        donatefix=mk_gd)



def mk_combine():
    st = jax.tree.map(jnp.array, state)
    return (st, jax.tree.map(jnp.array, g1), jax.tree.map(jnp.array, g2),
            jax.tree.map(jnp.array, gd), cons_v, dom_v, stats2, disc_stats,
            dlogits, epoch)


timeit("combine", P["combine"], donatefix=mk_combine)
