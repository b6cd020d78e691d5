"""GRL (alt phase-2) step timing A/B. Usage: exp_grl.py <variant> <B>

Variants isolate the r4 levers on `steps.make_grl_train_step`
(B=128 @ 512px, resnet34 — the bench operating point):

- base:      r4 defaults (dice seg loss, target decoder SKIPPED)
- stats:     target_decoder_stats=True  (reference stat semantics; the
             extra high-res decoder forward on the target traversal)
- ce:        seg_loss='ce' + skip      (the r3 default loss, isolates
             the dice-vs-CE cost from the decoder skip)
- ce_stats:  seg_loss='ce' + stats     (the exact r3 benched step —
             continuity control vs BASELINE r3s9's 570.0 ms)
- seq:       3-program sequential decomposition of base (additive-loss
             split; peak HBM = one traversal's fwd+bwd)
- seq_ce:    sequential + seg_loss='ce'
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from uda_aerial_semantic_segmentation_research_tpu.models import create_uda_model
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import TrainState, adam

name, B = sys.argv[1], int(sys.argv[2])
TILE, CLASSES = 512, 23
VARIANTS = {
    "base": dict(seg_loss="dice", target_decoder_stats=False),
    "stats": dict(seg_loss="dice", target_decoder_stats=True),
    "ce": dict(seg_loss="ce", target_decoder_stats=False),
    "ce_stats": dict(seg_loss="ce", target_decoder_stats=True),
    "seq": dict(seg_loss="dice", target_decoder_stats=False, seq=True),
    "seq_ce": dict(seg_loss="ce", target_decoder_stats=False, seq=True),
}
v = dict(VARIANTS[name])
SEQ = v.pop("seq", False)
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
tgt = src[::-1]
key = jax.random.key(0)
uda = create_uda_model(encoder_name="resnet34", classes=CLASSES,
                       image_size=TILE)
factory = (step_lib.make_grl_sequential_step if SEQ
           else step_lib.make_grl_train_step)
step = factory(uda.module, CLASSES, lambda_domain=0.001, **v)
state = TrainState.from_bundle(uda, adam(1e-4))
alpha = jnp.float32(1.0)
t0 = time.perf_counter()
for i in range(3):
    state, m = step(state, jax.random.fold_in(key, i), src, masks, tgt, alpha)
print(f"{name} B={B}: compile+warmup {time.perf_counter()-t0:.0f}s "
      f"loss={float(m['loss']):.4f}", flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = step(state, jax.random.fold_in(key, 100 + i), src, masks, tgt,
                    alpha)
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"{name} B={B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} tiles/s", flush=True)
