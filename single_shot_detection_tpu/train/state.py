"""Functional train state.

Replaces the reference's mutable training plumbing (Trainer.state dict +
optimizer/scheduler objects + apex AMP, SURVEY.md §2.7): one immutable pytree
carried through a jitted step.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    """{params, batch_stats, opt_state, step, lr_scale} — the complete
    checkpointable training state (parity: ckpt contents, helpers.py:44-84)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    lr_scale: jnp.ndarray  # ReduceLROnPlateau multiplier (host-updated)


def create_train_state(variables, tx) -> TrainState:
    params = variables['params']
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params),
                      lr_scale=jnp.ones((), jnp.float32))
