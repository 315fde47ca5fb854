"""Functional train state.

Replaces the reference's mutable training plumbing (Trainer.state dict +
optimizer/scheduler objects + apex AMP, SURVEY.md §2.7): one immutable pytree
carried through a jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    """{params, batch_stats, opt_state, step, lr_scale[, ema_params]} — the
    complete checkpointable training state (parity: ckpt contents,
    helpers.py:44-84)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    lr_scale: jnp.ndarray  # ReduceLROnPlateau multiplier (host-updated)
    # exponential moving average of params (train.ema, beyond-parity);
    # {} when disabled — old checkpoints restore cleanly (checkpoint.py)
    ema_params: Any = dataclasses.field(default_factory=dict)


def create_train_state(variables, tx, ema: bool = False) -> TrainState:
    params = variables['params']
    # the EMA shadow must be a COPY: params and ema_params live in one
    # donated pytree, and aliased buffers fail donation ("donate the same
    # buffer twice")
    ema_params = (jax.tree_util.tree_map(jnp.array, params) if ema else {})
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params),
                      lr_scale=jnp.ones((), jnp.float32),
                      ema_params=ema_params)
