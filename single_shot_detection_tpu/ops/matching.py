"""Anchor <-> ground-truth matching and target assignment.

Functional-parity targets: reference ``detection/matcher.py`` and
``detection/target_assigner.py``.

TPU-first design: the reference loops per image on CPU with boolean indexing
(target_assigner.py:42-58).  Here ground truth is a padded ``[B, G, 6]`` array
with a validity mask, matching is a fixed-shape vectorized op, and the batch
dimension is ``vmap``-ed — the whole assignment runs on-chip inside the jitted
train step.

Ground-truth row format (framework-wide contract, detection_dataset.py:11-17):
``[xmin, ymin, xmax, ymax, class, score]`` with ``NEGATIVE_CLASS = 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from single_shot_detection_tpu.ops import boxes as box_ops

NOT_MATCHED = -2
IGNORE = -1

NEGATIVE_CLASS = 0
IGNORE_CLASS = -1

# target row layout (parity: target_assigner.py:7-13)
LOC_INDEX_START = 0
LOC_INDEX_END = 4
CLASS_INDEX = 4
SCORE_INDEX = 5
TARGET_SIZE = 6


def match_bipartite(weights: jnp.ndarray, gt_mask: jnp.ndarray):
    """Greedy global-argmax bipartite matching (parity: matcher.py:7-31).

    Each round picks the globally best (gt, anchor) pair, then zeroes that
    row and column.  Returns ``anchor_idx [G]`` (the anchor matched to each
    GT; padded rows get arbitrary values — mask with ``gt_mask``).
    """
    num_gt, num_anchors = weights.shape
    w0 = jnp.where(gt_mask[:, None], jnp.nan_to_num(weights), 0.0)

    def body(_, carry):
        w, anchor_idx = carry
        flat = jnp.argmax(w)
        row, col = flat // num_anchors, flat % num_anchors
        anchor_idx = anchor_idx.at[row].set(col.astype(jnp.int32))
        w = w * (jnp.arange(num_anchors)[None, :] != col)
        w = w * (jnp.arange(num_gt)[:, None] != row)
        return w, anchor_idx

    _, anchor_idx = jax.lax.fori_loop(
        0, num_gt, body, (w0, jnp.zeros((num_gt,), jnp.int32)))
    return anchor_idx


def match_per_prediction(weights: jnp.ndarray,
                         gt_mask: jnp.ndarray,
                         matched_threshold: float,
                         unmatched_threshold: float = None,
                         force_match_for_each_target: bool = True) -> jnp.ndarray:
    """Per-anchor argmax matching with dual thresholds (parity: matcher.py:33-56).

    Args:
      weights: ``[G, A]`` IoU matrix (rows for padded GT may be garbage/NaN).
      gt_mask: ``[G]`` bool validity of each GT row.
      matched_threshold / unmatched_threshold: anchors with best overlap below
        ``unmatched`` -> NOT_MATCHED (-2); in ``[unmatched, matched)`` ->
        IGNORE (-1).
      force_match_for_each_target: every valid GT claims its best anchor; on
        conflicts the **highest GT index wins** (torch scatter last-write-wins
        semantics, matcher.py:54-55).

    Returns:
      ``[A]`` int32 of GT indices, or NOT_MATCHED / IGNORE sentinels.
    """
    if unmatched_threshold is None:
        unmatched_threshold = matched_threshold
    assert matched_threshold >= unmatched_threshold

    num_gt, num_anchors = weights.shape
    # Sanitize: padded rows must never win the per-anchor argmax.
    w = jnp.where(gt_mask[:, None], jnp.nan_to_num(weights), -1.0)

    overlap = jnp.max(w, axis=0)
    box_idx = jnp.argmax(w, axis=0).astype(jnp.int32)

    below_matched = overlap < matched_threshold
    below_unmatched = overlap < unmatched_threshold
    box_idx = jnp.where(below_matched & ~below_unmatched, IGNORE, box_idx)
    box_idx = jnp.where(below_unmatched, NOT_MATCHED, box_idx)

    if force_match_for_each_target:
        anchor_idx = jnp.argmax(w, axis=1)  # [G] best anchor per GT
        # Emulate torch's sequential scatter: for each anchor, the largest
        # valid g whose best anchor is it wins.
        hits = (anchor_idx[:, None] == jnp.arange(num_anchors)[None, :]) & gt_mask[:, None]
        g_ids = jnp.where(hits, jnp.arange(num_gt, dtype=jnp.int32)[:, None], -1)
        g_sel = jnp.max(g_ids, axis=0)
        box_idx = jnp.where(g_sel >= 0, g_sel, box_idx)

    return box_idx


@functools.partial(jax.jit, static_argnames=('matched_threshold', 'unmatched_threshold'))
def _assign_single(gt, gt_mask, corner_anchors, matched_threshold, unmatched_threshold):
    weights = box_ops.iou(gt[:, LOC_INDEX_START:LOC_INDEX_END], corner_anchors)  # [G, A]
    box_idx = match_per_prediction(weights, gt_mask, matched_threshold, unmatched_threshold)

    matched = box_idx >= 0
    ignored = box_idx == IGNORE
    safe_idx = jnp.maximum(box_idx, 0)
    # one-hot matmul instead of a gather (gathers are slow on TPU; G is tiny)
    onehot = (safe_idx[:, None] == jnp.arange(gt.shape[0])[None, :])
    picked = jnp.dot(onehot.astype(gt.dtype), gt,
                     preferred_element_type=gt.dtype)  # [A, 6]

    loc = jnp.where(matched[:, None], picked[:, LOC_INDEX_START:LOC_INDEX_END], 0.0)
    cls = jnp.where(matched, picked[:, CLASS_INDEX],
                    jnp.where(ignored, float(IGNORE_CLASS), float(NEGATIVE_CLASS)))
    score = jnp.where(matched, picked[:, SCORE_INDEX],
                      jnp.where(ignored, float(IGNORE_CLASS), 1.0))
    return jnp.concatenate([loc, cls[:, None], score[:, None]], axis=-1)


class TargetAssigner:
    """Batched on-device target assignment (parity: target_assigner.py:17-63).

    ``assign(gt, gt_mask, anchors)`` with padded GT ``[B, G, 6]`` (corner boxes,
    class, score), mask ``[B, G]``, centroid anchors ``[A, 4]`` returns a
    ``[B, A, 6]`` target: raw corner loc, class (0 = negative, -1 = ignore),
    score (1 for negatives, -1 for ignores — matching the reference fills).
    """

    def __init__(self, matched_threshold: float, unmatched_threshold: float = None):
        self.matched_threshold = float(matched_threshold)
        self.unmatched_threshold = (float(unmatched_threshold)
                                    if unmatched_threshold is not None
                                    else self.matched_threshold)

    def __call__(self, gt: jnp.ndarray, gt_mask: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
        corner_anchors = box_ops.to_corners(anchors)
        fn = functools.partial(_assign_single,
                               matched_threshold=self.matched_threshold,
                               unmatched_threshold=self.unmatched_threshold)
        return jax.vmap(fn, in_axes=(0, 0, None))(gt, gt_mask, corner_anchors)
