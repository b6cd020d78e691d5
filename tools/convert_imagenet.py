#!/usr/bin/env python
"""One-command ImageNet encoder checkpoint conversion.

The reference trains every model from smp's ``encoder_weights='imagenet'``
download (reference src/test_system.py:90-95, src/models/trainer_phases.py:33-36).
This environment has no egress, so weights arrive as a file; this tool
turns any torchvision/timm-style ResNet ``state_dict`` into the ``.npz``
that ``models/pretrained.load_imagenet_encoder`` consumes.

Runbook (one command once a weights file is available):

    python tools/convert_imagenet.py resnet34 /path/to/resnet34-weights.pth
    # -> $UDA_TPU_PRETRAINED/resnet34_imagenet.npz  (default ./pretrained)

Then every ``create_unet(..., encoder_weights='imagenet')`` call (the
default smp signature) picks it up automatically.  Accepted inputs:

- a raw ``state_dict`` saved with ``torch.save`` (torchvision hub file),
- a checkpoint dict containing ``state_dict`` / ``model`` keys,
- an already-flat ``.npz`` (re-keyed and validated).

Conversion is validated structurally here and numerically by
tests/test_pretrained_parity.py (random-weight torch trunk vs the Flax
encoder, full feature-pyramid diff).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uda_aerial_semantic_segmentation_research_tpu.models.pretrained import (  # noqa: E402
    PRETRAINED_ENV,
    convert_torch_resnet,
)


def _load_state_dict(path: str):
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(blob, dict) and key in blob:
            blob = blob[key]
            break
    # strip common prefixes (DataParallel 'module.', smp 'encoder.')
    out = {}
    for k, v in blob.items():
        for pref in ("module.", "encoder."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("encoder", help="resnet18 | resnet34 | resnet50 | "
                                    "resnet101 | resnet152")
    ap.add_argument("weights", help="torch .pth/.pt state_dict or .npz")
    ap.add_argument("--out-dir", default=os.environ.get(PRETRAINED_ENV,
                                                        "pretrained"))
    args = ap.parse_args(argv)

    sd = _load_state_dict(args.weights)
    flat = convert_torch_resnet(sd, args.encoder)
    n_params = sum(1 for k in flat if not k.startswith("batch_stats::"))
    n_stats = len(flat) - n_params
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.encoder}_imagenet.npz")
    np.savez(out, **{k: np.asarray(v, dtype=np.float32)
                     for k, v in flat.items()})
    print(f"wrote {out}: {n_params} param arrays + {n_stats} BN stats "
          f"({sum(v.size for v in flat.values()):,} values)")
    print(f"use: export {PRETRAINED_ENV}={args.out_dir}; "
          f"create_unet(..., encoder_weights='imagenet') now loads it")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
