"""Immutable training state pytrees.

The reference mutates ``nn.Module`` + ``torch.optim`` objects in place;
here all training state is an immutable pytree threaded through jitted
pure steps (donated each step, so XLA updates buffers in place on
device).  ``TrainState = {step, params, batch_stats, opt_state}``;
adversarial training carries two of them (segmentation "generator" +
discriminator), mirroring the reference's two optimizers
(reference src/models/adversarial_trainer.py:55-59,191).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """One model's optimization state."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    @classmethod
    def from_bundle(cls, bundle, tx: optax.GradientTransformation) -> "TrainState":
        """Build a state from a ModelBundle's current variables.

        Leaves are COPIED: jitted steps donate the state's buffers, and
        donating arrays aliased by the live bundle would delete the
        bundle's weights out from under it.
        """
        params = jax.tree.map(jnp.array, bundle.params)
        batch_stats = jax.tree.map(jnp.array, bundle.batch_stats)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def write_back(self, bundle) -> None:
        """Sync this state's weights into a stateful ModelBundle."""
        bundle.update(params=self.params, batch_stats=self.batch_stats)


class AdversarialState(struct.PyTreeNode):
    """Generator (segmentation) + discriminator states for phase 2."""

    seg: TrainState
    disc: TrainState


def adam(learning_rate: float, clip_norm: float | None = None
         ) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent transformation (same defaults), with an
    optional global-norm gradient clip (the reference clips at 1.0 in
    phase 3, reference src/models/unsupervised_trainer.py:144)."""
    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)
