"""Headline benchmark: supervised training throughput in 512px tiles/sec/chip.

BASELINE.json north-star: >= 2,000 x 512px aerial tiles/sec/chip on TPU
v5e for the flagship model (ResNet34-encoder U-Net, 23 classes, bf16).
The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
is measured against that 2,000 tiles/s build target.

Measures the REAL training step (on-device augmentation + forward +
CE loss + backward + Adam update, same factory the trainers use) on
synthetic device-resident data: pure step throughput, no host input
bound (the input pipeline overlaps via prefetch in real training).

Prints ONE JSON line:
  {"metric": "train_tiles_per_sec_per_chip", "value": N,
   "unit": "tiles/s", "vs_baseline": N/2000, ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Tuned libtpu compiler defaults (LIBTPU_INIT_ARGS) must be in the
# environment before the first backend touch -- which here is the
# device-init watchdog, NOT the package imports inside run_bench.
from uda_aerial_semantic_segmentation_research_tpu.tpu_flags import (
    apply_tuned_tpu_flags,
)

apply_tuned_tpu_flags()


def _bf16_peak_flops(device_kind: str):
    """(peak bf16 FLOP/s per chip, matched label) from the device kind.

    Published per-chip bf16 peaks; first substring match wins (the
    "lite" variants must match before their full-size siblings).
    Unknown kinds fall back to the v5e figure, labeled as such.
    """
    kind = device_kind.lower()
    table = [
        ("v6 lite", 918e12), ("v6e", 918e12),
        ("v5 lite", 197e12), ("v5litepod", 197e12), ("v5e", 197e12),
        ("v5p", 459e12), ("v5", 459e12),
        ("v4", 275e12), ("v3", 123e12), ("v2", 46e12),
    ]
    for sub, peak in table:
        if sub in kind:
            return peak, sub
    return 197e12, "v5e?(fallback)"


def run_bench(tile: int = 512, batch_candidates=(128, 64, 32, 16, 8),
              steps: int = 20, warmup: int = 3, encoder: str = "resnet34",
              classes: int = 23, smoke: bool = False, mode: str = "train"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        steps as step_lib,
    )
    from uda_aerial_semantic_segmentation_research_tpu.training.state import (
        TrainState,
        adam,
    )

    if smoke:
        tile, batch_candidates, steps, warmup = 64, (4,), 5, 2
        encoder, classes = "resnet18", 7
    elif mode == "infer" and batch_candidates == (128, 64, 32, 16, 8):
        # forward-only fits (and is fastest at) twice the training batch
        batch_candidates = (256, 128, 64, 32, 16, 8)
    elif mode == "unsup" and batch_candidates == (128, 64, 32, 16, 8):
        # the sequential decomposition + remat + bf16 logits/carry fits
        # (and is fastest at) the full supervised batch
        batch_candidates = (128, 64, 32, 16, 8)

    n_chips = jax.device_count()
    # phase 3 rematerializes the ENCODER per-block (three grad-bearing
    # forwards at 512px exceed HBM otherwise; decoder activations are
    # saved -- r3 A/B: encoder-only 978.5 ms vs full-remat 1022.4 at
    # B=128, decoder-only compile-OOM) and stores logits in bf16 --
    # value-identical when the head computes in bf16, and the f32
    # KL-target buffers were the largest allocations in the B=64 OOM dump
    unsup_kw = ({"remat": "encoder", "logits_dtype": jnp.bfloat16}
                if mode == "unsup" and not smoke else {})
    # (smoke's 64px traces stay on the naive decoder automatically: the
    # UnetDecoder trace-time gate keeps the dilated schedule off <128px
    # programs -- see models/unet.py)
    bundle = create_unet(encoder_name=encoder, encoder_weights=None,
                         classes=classes, image_size=tile, **unsup_kw)
    if mode == "infer":
        # serving path: normalize + forward + argmax, jitted, no grads
        predict = step_lib.make_predict_step(bundle.module)

        def infer_step(state, key, images, masks):
            preds = jnp.argmax(
                predict(state.params, state.batch_stats, images), -1)
            return state, {"loss": jnp.mean(preds.astype(jnp.float32))}

        step = infer_step
    elif mode == "adv":
        # phase-2 fused D-then-G update on mixed source/target batches
        from uda_aerial_semantic_segmentation_research_tpu.models import (
            create_discriminator,
        )
        from uda_aerial_semantic_segmentation_research_tpu.training.state import (
            AdversarialState,
        )

        disc = create_discriminator(input_channels=3, image_size=tile)
        adv = step_lib.make_adversarial_train_step(bundle.module, disc.module,
                                                   classes)

        def make_adv_state():
            return AdversarialState(seg=TrainState.from_bundle(bundle, adam(1e-4)),
                                    disc=TrainState.from_bundle(disc, adam(1e-4)))

        def adv_step(state, key, images, masks):
            # target batch = shuffled source images (shapes are what matters)
            return adv(state, key, images, masks, images[::-1])

        step = adv_step
    elif mode == "grl":
        # single-pass GRL adversarial update (the reference's alternative
        # generation, trainer_phases.phase2_train): feature-level
        # discriminator behind a gradient-reversal layer -- one
        # traversal, one backward, one optimizer
        from uda_aerial_semantic_segmentation_research_tpu.models import (
            create_uda_model,
        )

        # same encoder as --mode adv for an apples-to-apples comparison
        # (the reference's trainer_phases defaults to resnet50 -- pass
        # --encoder resnet50 for that flavor)
        uda = create_uda_model(encoder_name=encoder, classes=classes,
                               image_size=tile)
        # sequential decomposition = production default (r4: 484.8 ms vs
        # the fused step's 541.5 at B=128 @ 512px -- splitting the two
        # grad-bearing traversals into their own programs removes the
        # fused program's silent HLO remat; gradient-equivalence pinned
        # by tests/test_training.py::test_grl_sequential_matches_fused)
        grl = step_lib.make_grl_sequential_step(uda.module, classes)
        bundle = uda  # state built from the UDA bundle below

        def grl_step(state, key, images, masks):
            return grl(state, key, images, masks, images[::-1],
                       jnp.float32(1.0))

        step = grl_step
    elif mode == "unsup":
        # phase-3 dual-view consistency update on unlabeled target tiles
        from uda_aerial_semantic_segmentation_research_tpu.models import (
            create_discriminator,
        )
        from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
            FineTuningLoss,
        )

        disc = create_discriminator(input_channels=3, image_size=tile)
        if smoke:
            unsup = step_lib.make_unsupervised_train_step(
                bundle.module, disc.module, classes, FineTuningLoss())
        else:
            # the trainer's TPU production path (unsupervised_trainer.py
            # auto mode): memory-decomposed sequential update, bf16
            # cross-pass logits carry -- gradient-equivalent to the
            # joint step (tests/test_training.py) at 1/3 the peak HBM
            unsup = step_lib.make_unsupervised_sequential_step(
                bundle.module, disc.module, classes, FineTuningLoss(),
                carry_dtype=jnp.bfloat16)

        def make_unsup_state():
            import jax as _jax

            tx = adam(1e-4, clip_norm=1.0)
            params = _jax.tree.map(jnp.array, {"seg": bundle.params,
                                               "disc": disc.params})
            stats = _jax.tree.map(jnp.array, {"seg": bundle.batch_stats,
                                              "disc": disc.batch_stats})
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              batch_stats=stats, opt_state=tx.init(params),
                              tx=tx)

        def unsup_step(state, key, images, masks):
            state, m = unsup(state, key, images, jnp.float32(1.0))
            return state, {**m, "loss": m["total"]}

        step = unsup_step
    else:
        step = step_lib.make_supervised_train_step(bundle.module, classes)

    rng = np.random.default_rng(0)
    result = None
    flops_per_step = None
    for batch in batch_candidates:
        try:
            if mode == "adv":
                state = make_adv_state()
            elif mode == "unsup":
                state = make_unsup_state()
            else:
                state = TrainState.from_bundle(bundle, adam(1e-4))
            images = jnp.asarray(
                rng.integers(0, 255, (batch, tile, tile, 3)).astype(np.uint8))
            masks = jnp.asarray(
                rng.integers(0, classes, (batch, tile, tile)).astype(np.int32))
            key = jax.random.key(0)

            for i in range(warmup):
                state, metrics = step(state, jax.random.fold_in(key, i),
                                      images, masks)
                if mode == "unsup":
                    # the sequential chain's cross-program buffers are
                    # k-fold live for k enqueued steps; bound in-flight
                    # depth like the trainer's pipelined fetch does
                    float(metrics["loss"])
            # fetch a scalar: block_until_ready returns early on remote
            # runtimes; a host fetch of the chained loss is the honest sync
            float(metrics["loss"])

            # compiler FLOP count for the MFU figure (AOT, no execution)
            try:
                ca = step.lower(state, key, images, masks).compile(
                ).cost_analysis()
                flops_per_step = float((ca or {}).get("flops", 0.0)) or None
            except Exception:
                flops_per_step = None

            t0 = time.perf_counter()
            prev = None
            for i in range(steps):
                state, metrics = step(state, jax.random.fold_in(key, 100 + i),
                                      images, masks)
                if mode == "unsup" and prev is not None:
                    float(prev["loss"])  # lag-1 fetch (trainer's pipeline)
                prev = metrics
            last_loss = float(metrics["loss"])
            dt = time.perf_counter() - t0

            tiles_per_sec = steps * batch / dt
            result = {"batch": batch, "tiles_per_sec": tiles_per_sec,
                      "step_ms": dt / steps * 1e3, "loss": last_loss}
            break
        except Exception as e:  # OOM at this batch size -> try smaller
            msg = str(e)
            if ("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
                    # remote compile helpers surface compile-time OOM as a
                    # 500 from the compile endpoint
                    or "remote_compile" in msg):
                print(f"# batch {batch} failed ({msg[:80]}), trying smaller",
                      file=sys.stderr)
                continue
            raise
    if result is None:
        raise RuntimeError("all batch sizes OOMed")

    per_chip = result["tiles_per_sec"] / max(n_chips, 1)
    # scale smoke tiles to 512px-equivalents for a comparable number
    scale = (tile / 512) ** 2
    per_chip_512 = per_chip * scale
    out = {
        "metric": f"{mode}_tiles_per_sec_per_chip",
        "value": round(per_chip_512, 2),
        "unit": "512px tiles/s",
        "vs_baseline": round(per_chip_512 / 2000.0, 4),
        "tile": tile,
        "batch": result["batch"],
        "step_ms": round(result["step_ms"], 2),
        "n_chips": n_chips,
        "backend": jax.default_backend(),
        "encoder": encoder,
        "smoke": smoke,
    }
    # MFU against the chip generation's bf16 peak, resolved from
    # device_kind (v5e fallback), using the compiler's own FLOP count.
    # The physical single-chip ceiling for this step on v5e is ~1,000
    # tiles/s at 100% MFU (see BASELINE.md roofline); the 2,000
    # north-star in vs_baseline is aspirational beyond it.
    if flops_per_step and jax.default_backend() == "tpu":
        peak_per_chip, kind = _bf16_peak_flops(jax.devices()[0].device_kind)
        peak = peak_per_chip * n_chips
        mfu = (flops_per_step / (result["step_ms"] / 1e3)) / peak
        out["mfu"] = round(mfu, 4)
        out["mfu_peak_tflops"] = round(peak_per_chip / 1e12)
        out["mfu_chip"] = kind
        out["tflops_per_step"] = round(flops_per_step / 1e12, 2)
    print(json.dumps(out))
    return out


def run_bench_e2e(tile: int = 512, batch: int = 64, n_tiles: int = 256,
                  epochs: int = 3, encoder: str = "resnet34",
                  classes: int = 23, smoke: bool = False):
    """End-to-end epoch throughput: JPEG/PNG decode (native C++ loader)
    -> prefetch threads -> H2D -> jitted train step.

    Unlike the headline device-step bench, this includes the host input
    pipeline, answering "can the host feed the chip?" (VERDICT r1 #9).
    Prints a second JSON line with metric train_tiles_per_sec_e2e plus
    the pure-device step_ms measured in the same run, so host-bound vs
    device-bound is read directly from the gap.
    """
    import os
    import tempfile

    import cv2
    import numpy as np

    from uda_aerial_semantic_segmentation_research_tpu.data.setup_test_data import (
        _synthetic_tile,
    )

    if smoke:
        tile, batch, n_tiles, epochs = 64, 4, 16, 2
        encoder, classes = "resnet18", 7

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="uda_e2e_bench_")
    img_dir, mask_dir = f"{tmp}/images", f"{tmp}/masks"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    for i in range(n_tiles):
        img, mask = _synthetic_tile(rng, tile, classes)
        cv2.imwrite(f"{img_dir}/{i:04d}.jpg",
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(f"{mask_dir}/{i:04d}.png", mask)

    try:
        return _run_bench_e2e_body(img_dir, mask_dir, tile, batch,
                                   epochs, encoder, classes, smoke)
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


def _run_bench_e2e_body(img_dir, mask_dir, tile, batch, epochs,
                        encoder, classes, smoke):
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
    )
    from uda_aerial_semantic_segmentation_research_tpu.data.loader import (
        DataLoader,
        prefetch_to_device,
    )
    from uda_aerial_semantic_segmentation_research_tpu.data import native
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        steps as step_lib,
    )
    from uda_aerial_semantic_segmentation_research_tpu.training.state import (
        TrainState,
        adam,
    )

    ds = DroneDataset(img_dir, mask_dir, balance_classes=False,
                      image_size=tile, verbose=False)
    cached = ds.enable_raw_cache()
    loader = DataLoader(ds, batch_size=batch, shuffle=True, drop_last=True,
                        num_workers=2)
    bundle = create_unet(encoder_name=encoder, encoder_weights=None,
                         classes=classes, image_size=tile)
    step = step_lib.make_supervised_train_step(bundle.module, classes)
    state = TrainState.from_bundle(bundle, adam(1e-4))
    key = jax.random.key(0)

    # warmup epoch: compile + populate the decoded-tile cache; timed
    # separately as the COLD (decode-bound) number
    t0 = _time.perf_counter()
    n_cold = 0
    for images, masks in prefetch_to_device(loader.iter_raw()):
        state, metrics = step(state, key, images, masks)
        n_cold += images.shape[0]
    float(metrics["loss"])
    cold_dt = _time.perf_counter() - t0

    # device-only step time for the host-vs-device gap
    di = jnp.asarray(images)
    dm = jnp.asarray(masks.astype(np.int32))
    for _ in range(2):
        state, metrics = step(state, key, di, dm)
    float(metrics["loss"])
    t0 = _time.perf_counter()
    for _ in range(5):
        state, metrics = step(state, key, di, dm)
    float(metrics["loss"])
    dev_ms = (_time.perf_counter() - t0) / 5 * 1e3

    n_seen = 0
    t0 = _time.perf_counter()
    for _ in range(epochs):
        for images, masks in prefetch_to_device(loader.iter_raw()):
            state, metrics = step(state, key, images, masks)
            n_seen += images.shape[0]
    float(metrics["loss"])
    dt = _time.perf_counter() - t0

    scale = (tile / 512) ** 2
    tiles_per_sec = n_seen / dt * scale
    out = {
        "metric": "train_tiles_per_sec_e2e",
        "value": round(tiles_per_sec, 2),
        "unit": "512px tiles/s",
        "vs_baseline": round(tiles_per_sec / 2000.0, 4),
        "tile": tile,
        "batch": batch,
        "device_step_ms": round(dev_ms, 2),
        "e2e_step_ms": round(dt / max(n_seen // batch, 1) * 1e3, 2),
        "raw_cache": cached,
        # first-epoch throughput incl. compile+decode: the decode-bound
        # floor when the dataset exceeds the RAM cache budget
        "cold_tiles_per_sec": round(n_cold / cold_dt * scale, 2),
        "native_loader": native.available(),
        "backend": jax.default_backend(),
        "smoke": smoke,
    }
    print(json.dumps(out))
    return out


def _arm_device_init_watchdog(metric: str, seconds: float = 240.0):
    """Fail loud, fast, and parseable if the TPU runtime never answers.

    On this box the remote axon runtime has been observed to WEDGE such
    that ``jax.devices()`` blocks forever (BASELINE.md r3 ledger); a
    hung bench leaves no artifact at all.  The watchdog prints an
    honest zero-value JSON line naming the failure, then hard-exits.
    Disarmed as soon as device init returns; compile time (~70-150 s at
    bench shape) is NOT under the timer.
    """
    import os
    import threading

    def _fire():
        print(json.dumps({
            "metric": metric, "value": 0.0,
            "unit": "tiles/s", "vs_baseline": 0.0,
            "error": f"TPU runtime unavailable: jax.devices() did not "
                     f"return within {seconds:.0f}s",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, _fire)
    t.daemon = True
    t.start()
    import jax
    jax.devices()
    t.cancel()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny shapes, quick run")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--mode", choices=("train", "infer", "adv", "grl", "unsup", "e2e"),
                   default="train")
    a = p.parse_args()
    _arm_device_init_watchdog(
        "train_tiles_per_sec_e2e" if a.mode == "e2e"
        else f"{a.mode}_tiles_per_sec_per_chip")
    if a.mode == "e2e":
        run_bench_e2e(tile=a.tile, smoke=a.smoke)
    else:
        run_bench(tile=a.tile, steps=a.steps, smoke=a.smoke, mode=a.mode)
