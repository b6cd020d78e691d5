"""ImageNet-pretrained encoder weight loading.

The reference relies on smp's ``encoder_weights='imagenet'`` download.
This environment has no egress, so pretrained weights come from a local
converted checkpoint instead:

- ``convert_torch_resnet(state_dict, encoder_name)`` maps a
  torchvision/timm ResNet ``state_dict`` (numpy-convertible tensors) onto
  our encoder param pytree (OIHW -> HWIO kernel transpose, BN param
  renames).  Run offline once, save with ``np.savez``.
- ``load_imagenet_encoder(bundle, encoder_name)`` looks for
  ``$UDA_TPU_PRETRAINED/<encoder_name>_imagenet.npz`` and merges it into a
  model bundle's encoder subtree; returns False (warning, random init
  kept) when absent -- mIoU parity with the pretrained reference requires
  providing the file (SURVEY.md section 7, hard parts).
"""

from __future__ import annotations

import os
import warnings
from typing import Dict

import numpy as np

PRETRAINED_ENV = "UDA_TPU_PRETRAINED"
# direct-file override: points at ONE converted .npz (takes precedence
# over the $UDA_TPU_PRETRAINED/<encoder>_imagenet.npz directory layout)
PRETRAINED_FILE_ENV = "UDA_TPU_IMAGENET_NPZ"


def _bn(prefix_t: str, prefix_j: str, sd, out: Dict[str, np.ndarray]):
    out[f"{prefix_j}/scale"] = np.asarray(sd[f"{prefix_t}.weight"])
    out[f"{prefix_j}/bias"] = np.asarray(sd[f"{prefix_t}.bias"])
    out[f"batch_stats::{prefix_j}/mean"] = np.asarray(sd[f"{prefix_t}.running_mean"])
    out[f"batch_stats::{prefix_j}/var"] = np.asarray(sd[f"{prefix_t}.running_var"])


def _conv(name_t: str, name_j: str, sd, out: Dict[str, np.ndarray]):
    w = np.asarray(sd[name_t])          # OIHW
    out[f"{name_j}/kernel"] = np.transpose(w, (2, 3, 1, 0))   # HWIO


def convert_torch_resnet(sd: Dict, encoder_name: str) -> Dict[str, np.ndarray]:
    """torchvision resnet{18,34,50} state_dict -> flat jax param mapping.

    Keys use our encoder naming (resnet.py): ``stem_conv``, ``stem_norm``,
    ``stage{s}_block{b}`` with conv layers ``Conv_0..`` / norms
    ``BatchNorm_0..`` in definition order, and ``downsample_{conv,norm}``.
    BN running stats are prefixed ``batch_stats::``.
    """
    from uda_aerial_semantic_segmentation_research_tpu.models.resnet import ENCODERS

    spec = ENCODERS[encoder_name]
    bottleneck = spec["block_cls"].__name__ == "Bottleneck"
    out: Dict[str, np.ndarray] = {}
    _conv("conv1.weight", "stem_conv", sd, out)
    _bn("bn1", "stem_norm", sd, out)
    n_convs = 3 if bottleneck else 2
    for s, n_blocks in enumerate(spec["stage_sizes"]):
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            j = f"stage{s + 1}_block{b}"
            for c in range(n_convs):
                _conv(f"{t}.conv{c + 1}.weight", f"{j}/Conv_{c}", sd, out)
                _bn(f"{t}.bn{c + 1}", f"{j}/BatchNorm_{c}", sd, out)
            if f"{t}.downsample.0.weight" in sd:
                _conv(f"{t}.downsample.0.weight", f"{j}/downsample_conv", sd, out)
                _bn(f"{t}.downsample.1", f"{j}/downsample_norm", sd, out)
    return out


def load_imagenet_encoder(bundle, encoder_name: str) -> bool:
    """Merge a converted ImageNet checkpoint into ``bundle``'s encoder subtree."""
    path = os.environ.get(PRETRAINED_FILE_ENV)
    if not path:
        root = os.environ.get(PRETRAINED_ENV, "pretrained")
        path = os.path.join(root, f"{encoder_name}_imagenet.npz")
    if not os.path.exists(path):
        warnings.warn(
            f"encoder_weights='imagenet' requested but no converted checkpoint "
            f"at {path} (set ${PRETRAINED_FILE_ENV} to a converted file or "
            f"${PRETRAINED_ENV} to its directory); encoder stays randomly "
            f"initialized", stacklevel=2)
        return False

    blob = dict(np.load(path))
    state = bundle.state_dict()
    enc_prefix = None
    for k in state:
        if "/stem_conv/" in k and k.startswith("params/"):
            enc_prefix = k.split("stem_conv")[0]
            break
    if enc_prefix is None:
        raise ValueError("could not locate encoder subtree in bundle")

    bs_prefix = enc_prefix.replace("params/", "batch_stats/", 1)
    merged = dict(state)
    hits = 0
    for k, v in blob.items():
        if k.startswith("batch_stats::"):
            kk = bs_prefix + k[len("batch_stats::"):]
        else:
            kk = enc_prefix + k
        if kk in merged:
            merged[kk] = v
            hits += 1
    bundle.load_state_dict(merged)
    return hits > 0
