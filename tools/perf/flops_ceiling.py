"""Per-mode FLOP/byte rooflines from the compiler's own cost model.

For each step family (supervised / adversarial / GRL / unsupervised /
inference) this AOT-compiles the production step at bench shape and
reads `compiled.cost_analysis()` — the same source BASELINE.md's
supervised roofline used — then prints, per mode:

    GFLOP/tile, GB/tile, the compute ceiling (197 TFLOP/s bf16 on v5e),
    the bandwidth ceiling (819 GB/s HBM on v5e), and the binding one.

The binding ceiling is each mode's PARITY throughput ceiling: the
point where its MFU equals 100% of whichever resource saturates first.
BASELINE.md quotes these next to the measured tiles/s so every phase
carries the same ceiling argument phase 3 got in r3s8.

Usage: flops_ceiling.py [mode ...]   (default: all five)
Run ONE at a time with other TPU work (1-core host, axon tunnel).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from uda_aerial_semantic_segmentation_research_tpu.models import (  # noqa: E402
    create_discriminator,
    create_uda_model,
    create_unet,
)
from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (  # noqa: E402
    FineTuningLoss,
)
from uda_aerial_semantic_segmentation_research_tpu.training import (  # noqa: E402
    steps as step_lib,
)
from uda_aerial_semantic_segmentation_research_tpu.training.state import (  # noqa: E402
    AdversarialState,
    TrainState,
    adam,
)

TILE, CLASSES = 512, 23
PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BYTES = 819e9   # v5e HBM

rng = np.random.default_rng(0)


def _data(B):
    images = jnp.asarray(rng.integers(0, 255, (B, TILE, TILE, 3)).astype(np.uint8))
    masks = jnp.asarray(rng.integers(0, CLASSES, (B, TILE, TILE)).astype(np.int32))
    return images, masks, jax.random.key(0)


def lower_mode(mode):
    """Return (B, lowered) for the production step of `mode`."""
    if mode == "sup":
        B = 128
        bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                             classes=CLASSES, image_size=TILE)
        step = step_lib.make_supervised_train_step(bundle.module, CLASSES)
        state = TrainState.from_bundle(bundle, adam(1e-4))
        images, masks, key = _data(B)
        return B, step.lower(state, key, images, masks)
    if mode == "adv":
        B = 128
        bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                             classes=CLASSES, image_size=TILE)
        disc = create_discriminator(input_channels=3, image_size=TILE)
        adv = step_lib.make_adversarial_train_step(bundle.module, disc.module,
                                                   CLASSES)
        state = AdversarialState(seg=TrainState.from_bundle(bundle, adam(1e-4)),
                                 disc=TrainState.from_bundle(disc, adam(1e-4)))
        images, masks, key = _data(B)
        return B, adv.lower(state, key, images, masks, images[::-1])
    if mode == "grl":
        B = 128
        uda = create_uda_model(encoder_name="resnet34", classes=CLASSES,
                               image_size=TILE)
        grl = step_lib.make_grl_train_step(uda.module, CLASSES)
        state = TrainState.from_bundle(uda, adam(1e-4))
        images, masks, key = _data(B)
        return B, grl.lower(state, key, images, masks, images[::-1],
                            jnp.float32(1.0))
    if mode == "unsup":
        # FLOP counting uses the single-program (non-sequential) step:
        # identical math to the production sequential decomposition,
        # one cost_analysis.  Compile (not execute), so HBM is moot.
        B = 128
        bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                             classes=CLASSES, image_size=TILE,
                             remat="encoder", logits_dtype=jnp.bfloat16)
        disc = create_discriminator(input_channels=3, image_size=TILE)
        unsup = step_lib.make_unsupervised_train_step(
            bundle.module, disc.module, CLASSES, FineTuningLoss())
        tx = adam(1e-4, clip_norm=1.0)
        params = {"seg": bundle.params, "disc": disc.params}
        stats = {"seg": bundle.batch_stats, "disc": disc.batch_stats}
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=stats, opt_state=tx.init(params), tx=tx)
        images, _, key = _data(B)
        return B, unsup.lower(state, key, images, jnp.float32(1.0))
    if mode == "infer":
        B = 256
        bundle = create_unet(encoder_name="resnet34", encoder_weights=None,
                             classes=CLASSES, image_size=TILE)
        predict = step_lib.make_predict_step(bundle.module)

        @jax.jit
        def infer(params, stats, images):
            return jnp.argmax(predict(params, stats, images), -1)

        images, _, _ = _data(B)
        return B, infer.lower(bundle.params, bundle.batch_stats, images)
    raise SystemExit(f"unknown mode {mode}")


def main():
    modes = sys.argv[1:] or ["sup", "adv", "grl", "unsup", "infer"]
    for mode in modes:
        B, lowered = lower_mode(mode)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        gflop_tile = flops / B / 1e9
        gb_tile = byts / B / 1e9
        ceil_c = PEAK_FLOPS / (flops / B) if flops else float("inf")
        ceil_b = PEAK_BYTES / (byts / B) if byts else float("inf")
        bind = "compute" if ceil_c <= ceil_b else "bandwidth"
        print(f"{mode}: B={B}  {gflop_tile:.1f} GFLOP/tile  {gb_tile:.2f} GB/tile"
              f"  ceiling compute={ceil_c:.0f} t/s  bw={ceil_b:.0f} t/s"
              f"  binding={bind} {min(ceil_c, ceil_b):.0f} t/s", flush=True)


if __name__ == "__main__":
    main()
