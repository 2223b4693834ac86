"""Train state + optimizer/schedule construction.

Replaces the reference's ModelDetector/ModelDescriptor engine state (Adam handles,
LR bookkeeping, preallocated device placeholders — models/keypoint_detector.py:15-102)
with an immutable pytree: params, batch_stats, opt_state, step. Unlike the reference
(which never saves optimizer state or epoch — SURVEY.md §5.4), checkpoints carry the
full state for exact resume.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats, opt_state=new_opt_state)

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_adam(lr: float) -> optax.GradientTransformation:
    """Adam(lr, betas=(0.9, 0.999), weight_decay=0) with a mutable learning rate
    (keypoint_detector.py:42-45)."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR override (the reference mutates param_groups,
    keypoint_detector.py:356-366)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


def lr_at_epoch(base_lr: float, epoch: int, decay_step: int,
                decay_ratio: float, clip: float = 1e-5) -> float:
    """Stepwise LR schedule: x ratio every decay_step epochs, floored at clip.

    Matches the reference train loops' ``if epoch % step == 0 and epoch > 0:
    update_learning_rate(ratio)`` pattern (e.g. kitti/train_detector.py:73,
    modelnet/train_detector.py:116-118) combined with the 1e-5 floor
    (keypoint_detector.py:357-362).
    """
    lr = base_lr * (decay_ratio ** (epoch // max(decay_step, 1)))
    return max(lr, clip)
