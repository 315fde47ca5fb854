"""Fixed-shape non-maximum suppression.

Functional-parity target: reference ``bf/utils/box_utils.py:145-194`` (hard NMS
via ``torchvision.ops.nms`` C++/CUDA, plus a python soft-NMS loop).

TPU-first design: exact greedy NMS as a fixed-shape masked op — sort by score,
one IoU matrix, and a sequential suppression sweep (``fori_loop``) whose body
is pure vector math.  Batched over (image x class) via ``vmap``, everything
stays on-chip with static shapes.  A Pallas kernel covers the hot path (see
``nms_pallas.py``); this module is the reference/jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from single_shot_detection_tpu.ops import boxes as box_ops


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, overlap_threshold: float) -> jnp.ndarray:
    """Exact greedy hard-NMS keep mask.

    Matches ``torchvision.ops.nms`` semantics: process boxes in descending
    score order, suppress any remaining box with IoU **strictly greater** than
    ``overlap_threshold`` against a kept box.

    Args:
      boxes: ``[N, 4]`` corner-format boxes.
      scores: ``[N]``; invalid candidates should carry ``-inf``.
    Returns:
      ``[N]`` bool keep mask (in the original order).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]

    ious = jnp.nan_to_num(box_ops.iou(sorted_boxes, sorted_boxes))
    later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]
    suppress_rows = (ious > overlap_threshold) & later  # [N, N]

    def body(i, suppressed):
        alive = ~suppressed[i]
        return suppressed | (suppress_rows[i] & alive)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_sorted = ~suppressed & (scores[order] > -jnp.inf)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def soft_nms(boxes: jnp.ndarray,
             scores: jnp.ndarray,
             score_threshold: float,
             sigma: float = 0.5) -> jnp.ndarray:
    """Gaussian soft-NMS pick mask (parity: box_utils.py:145-163 ``_soft_nms``).

    Iteratively picks the current best box and decays the scores of boxes
    above ``score_threshold`` by ``exp(-iou^2 / sigma)``; stops when nothing
    exceeds the threshold.  Returns the pick mask; callers keep the *original*
    scores of picked boxes (matching the reference).
    """
    n = boxes.shape[0]
    ious = jnp.nan_to_num(box_ops.iou(boxes, boxes))

    def body(_, state):
        working, picked = state
        active = jnp.any(working > score_threshold)
        idx = jnp.argmax(working)
        picked = picked | (jnp.zeros((n,), bool).at[idx].set(True) & active)
        decay = jnp.exp(-(ious[idx] ** 2) / sigma)
        new_working = jnp.where(working > score_threshold, working * decay, working)
        new_working = new_working.at[idx].set(0.0)
        working = jnp.where(active, new_working, working)
        return working, picked

    _, picked = jax.lax.fori_loop(0, n, body, (scores, jnp.zeros((n,), bool)))
    return picked


@functools.partial(jax.jit, static_argnames=('overlap_threshold', 'max_output'))
def nms(boxes: jnp.ndarray,
        scores: jnp.ndarray,
        overlap_threshold: float,
        max_output: int):
    """Convenience single-set NMS returning fixed-size top-``max_output`` picks.

    Returns ``(boxes [max_output, 4], scores [max_output], valid [max_output])``
    sorted by score descending; invalid slots carry -inf score.
    """
    keep = nms_mask(boxes, scores, overlap_threshold)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(kept_scores, max_output)
    return boxes[idx], top_scores, top_scores > -jnp.inf
