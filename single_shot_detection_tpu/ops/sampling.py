"""Anchor sampling for classification loss.

Functional-parity target: reference ``detection/sampler.py``.  Both samplers
return a boolean ``[B, A]`` mask — already fully vectorized in the reference,
mapping 1:1 to jnp (the double-argsort rank trick, sampler.py:22-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from single_shot_detection_tpu.ops.matching import IGNORE_CLASS, NEGATIVE_CLASS


def naive_sampler(scores: jnp.ndarray, target_classes: jnp.ndarray) -> jnp.ndarray:
    """Positives-only mask (parity: sampler.py:9-10)."""
    del scores
    return (target_classes != NEGATIVE_CLASS) & (target_classes != IGNORE_CLASS)


def hard_negative_mining(scores: jnp.ndarray,
                         target_classes: jnp.ndarray,
                         negative_per_positive_ratio: float,
                         min_negative_per_image: int) -> jnp.ndarray:
    """Positives + hardest negatives by background -log-softmax rank.

    Parity: sampler.py:12-25.

    Args:
      scores: ``[B, A, C]`` raw class logits.
      target_classes: ``[B, A]`` int class targets (0 = negative, -1 = ignore).
    Returns:
      ``[B, A]`` bool sampled mask.
    """
    loss = -jax.nn.log_softmax(scores, axis=-1)[..., NEGATIVE_CLASS]  # [B, A]

    negative_mask = target_classes == NEGATIVE_CLASS
    positive_mask = (target_classes != NEGATIVE_CLASS) & (target_classes != IGNORE_CLASS)
    num_negatives = jnp.sum(negative_mask, axis=1, keepdims=True)
    num_positives = jnp.sum(positive_mask, axis=1, keepdims=True)

    wanted = jnp.clip(num_positives * negative_per_positive_ratio, min=min_negative_per_image)
    num_keep = jnp.minimum(wanted, num_negatives)

    loss = jnp.where(negative_mask, loss, -jnp.inf)
    order = jnp.argsort(-loss, axis=1)          # descending
    rank = jnp.argsort(order, axis=1)
    hard_negative_mask = rank < num_keep

    return positive_mask | hard_negative_mask


SAMPLERS = {
    'naive_sampler': naive_sampler,
    'hard_negative_mining': hard_negative_mining,
}


def build_sampler(name: str, **kwargs):
    """Config-driven sampler factory (parity: init.py:90-92)."""
    import functools
    import inspect
    fn = SAMPLERS[name]
    if not kwargs:
        return fn
    allowed = {k: v for k, v in kwargs.items() if k in inspect.signature(fn).parameters}
    return functools.partial(fn, **allowed)
