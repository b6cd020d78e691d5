"""Bench-scale three-phase pipeline run: 512px, B=128, real chip.

Produces the artifact class the parity definition names (per-phase
loss/mIoU trajectories + PhaseManager metadata, VERDICT r3 item 5):
generates a 512px synthetic dataset big enough for full B=128 batches,
runs ``training.pipeline`` end to end with PhaseManager gates evaluated,
then parses the TensorBoard event files back into a per-epoch table.

Synthetic data, stated as such — the zero-egress environment has no
real tiles; the run demonstrates the full pipeline executing at the
bench operating point with gate bookkeeping, not accuracy parity.

Usage: python tools/perf/benchscale_pipeline.py [workdir]
Everything (data/checkpoints/logs) lands under ``workdir``
(default results/benchscale_r4), so the repo's default fixtures stay
untouched.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

NUM_SOURCE = 336          # train 268 -> 2 full B=128 steps/epoch, val 68
NUM_TARGET = 192          # -> 1 full B=128 target step/epoch
EPOCHS = (6, 4, 4)


def main() -> None:
    workdir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "results" / "benchscale_r4")
    workdir.mkdir(parents=True, exist_ok=True)

    env = dict(os.environ)
    env.update({
        "UDA_TPU_IMAGE_SIZE": "512",
        "UDA_TPU_BATCH_SIZE": "128",
        # APPEND the repo (keep the axon sitecustomize path: replacing
        # PYTHONPATH wholesale deregisters the TPU plugin)
        "PYTHONPATH": str(REPO) + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""),
    })

    gen = (
        "from uda_aerial_semantic_segmentation_research_tpu.data."
        "setup_test_data import setup_test_data; "
        f"setup_test_data(num_source={NUM_SOURCE}, "
        f"num_holyrood={NUM_TARGET}, image_size=512)"
    )
    print(f"[benchscale] generating {NUM_SOURCE}+{NUM_TARGET} synthetic "
          f"512px tiles under {workdir} ...", flush=True)
    subprocess.run([sys.executable, "-c", gen], cwd=workdir, env=env,
                   check=True)

    cmd = [
        sys.executable, "-m",
        "uda_aerial_semantic_segmentation_research_tpu.training.pipeline",
        "--phase1-epochs", str(EPOCHS[0]),
        "--phase2-epochs", str(EPOCHS[1]),
        "--phase3-epochs", str(EPOCHS[2]),
        "--force-transitions",
    ]
    print(f"[benchscale] running pipeline: {' '.join(cmd[2:])}", flush=True)
    subprocess.run(cmd, cwd=workdir, env=env, check=True)

    report(workdir)


def report(workdir: Path) -> None:
    """Parse TB event files + phase metadata into the PARITY.md table."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    rows = {}
    for run in sorted((workdir / "logs").glob("*")):
        acc = EventAccumulator(str(run))
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            for ev in acc.Scalars(tag):
                rows.setdefault(tag, []).append((ev.step, ev.value))

    interesting = [t for t in sorted(rows) if any(
        k in t for k in ("val/loss", "val/iou", "val/accuracy", "epoch",
                         "total", "consistency", "domain", "d_loss",
                         "adv_loss", "early_stopping"))]
    print("\n[benchscale] scalar trajectories (tag: step=value ...):")
    for tag in interesting:
        pts = rows[tag]
        tail = pts if len(pts) <= 12 else pts[:2] + [("...", "...")] + pts[-8:]
        line = " ".join(f"{s}={v:.4f}" if v != "..." else "..."
                        for s, v in tail)
        print(f"  {tag}: {line}")

    for meta in sorted(workdir.glob("checkpoints/*/training_metadata.json")):
        print(f"\n[benchscale] {meta}:")
        print(json.dumps(json.loads(meta.read_text()), indent=2)[:3000])


if __name__ == "__main__":
    main()
