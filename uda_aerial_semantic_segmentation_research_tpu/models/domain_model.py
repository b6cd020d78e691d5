"""DomainAdaptationModel: segmentation bundle + optional discriminator bundle.

Counterpart of the reference wrapper (reference src/models/domain_model.py:4-84):
``forward(x, domain_adaptation=True)`` -> (seg_pred, domain_pred); plus the
train/eval/to/parameters pass-throughs.  Here it pairs two ``ModelBundle``s
(trainers jit over their modules + explicit params; this object is the
user-facing stateful surface).
"""

from __future__ import annotations

from typing import Optional

import jax

from uda_aerial_semantic_segmentation_research_tpu.models.bundle import ModelBundle


class DomainAdaptationModel:
    def __init__(self, segmentation_model: ModelBundle,
                 discriminator: Optional[ModelBundle] = None):
        self.segmentation_model = segmentation_model
        self.discriminator = discriminator

    def __call__(self, x, domain_adaptation: bool = False, train: bool = False,
                 return_logits: bool = False):
        seg_pred = self.segmentation_model(x, train=train)
        if domain_adaptation and self.discriminator is not None:
            domain_pred = self.discriminator(x, train=train,
                                             return_logits=return_logits)
            return seg_pred, domain_pred
        return seg_pred

    forward = __call__

    def get_features(self, x):
        """Bottleneck encoder features (reference src/models/domain_model.py:42-56)."""
        module = self.segmentation_model.module
        if hasattr(module, "encode"):
            feats = self.segmentation_model.module.apply(
                self.segmentation_model.variables, x, train=False,
                method=module.encode)
            return feats[-1]
        return None

    # --- torch-API shims ------------------------------------------------
    def train(self, mode: bool = True):
        return self

    def eval(self):
        return self

    def to(self, device):
        return self

    def parameters(self):
        params = list(jax.tree.leaves(self.segmentation_model.params))
        if self.discriminator is not None:
            params.extend(jax.tree.leaves(self.discriminator.params))
        return params

    # --- checkpoint surface ----------------------------------------------
    def state_dict(self):
        out = {f"segmentation_model/{k}": v
               for k, v in self.segmentation_model.state_dict().items()}
        if self.discriminator is not None:
            out.update({f"discriminator/{k}": v
                        for k, v in self.discriminator.state_dict().items()})
        return out

    def load_state_dict(self, state, strict: bool = True):
        seg = {k[len("segmentation_model/"):]: v for k, v in state.items()
               if k.startswith("segmentation_model/")}
        self.segmentation_model.load_state_dict(seg, strict=strict)
        if self.discriminator is not None:
            disc = {k[len("discriminator/"):]: v for k, v in state.items()
                    if k.startswith("discriminator/")}
            if disc:
                self.discriminator.load_state_dict(disc, strict=strict)
        return self
