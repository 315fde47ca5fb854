"""Batched detection postprocessing: score conversion, box decoding,
per-class NMS, global top-k.

Functional-parity target: reference ``detection/postprocessor.py`` — which runs
a python loop of ``batch x classes`` CPU NMS calls (postprocessor.py:57-76).
Here the whole pipeline is one jitted fixed-shape program: scores/boxes for all
classes are suppressed in parallel (``vmap`` over image x class) and reduced
with ``top_k``, producing a padded ``[B, max_total, 6]`` detection tensor plus
a validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from single_shot_detection_tpu.ops import boxes as box_ops
from single_shot_detection_tpu.ops import nms as nms_ops


class Postprocessor:
    """Config-driven postprocessor (parity: postprocessor.py:9-78).

    ``__call__(scores, locs, anchors)`` with raw head outputs
      scores ``[B, A, C_raw]``, locs ``[B, A, 4]``, anchors ``[A, 4]`` centroid
    returns ``detections [B, max_total, 6]`` rows ``[x0, y0, x1, y1, class,
    score]`` (class ids are 1-based like the reference) and ``valid [B,
    max_total]``.
    """

    def __init__(self,
                 box_coder,
                 score_threshold: float,
                 nms: dict,
                 score_converter: str = 'SOFTMAX',
                 max_total: int = 200,
                 pre_nms_top_k: int = None,
                 use_pallas: bool = None):
        if score_converter not in ('SOFTMAX', 'SIGMOID'):
            raise ValueError(f'Wrong value for score_converter: {score_converter}')
        self.box_coder = box_coder
        self.score_threshold = float(score_threshold)
        self.overlap_threshold = float(nms['overlap_threshold'])
        self.max_per_class = int(nms.get('max_per_class', 100))
        self.soft = bool(nms.get('soft', False))
        self.sigma = float(nms.get('sigma', 0.5))
        self.score_converter = score_converter
        self.max_total = int(max_total) if max_total is not None else None
        # Optional candidate pre-selection: keep only the top-N anchors per
        # image (by best class score) before the per-class top-k/NMS.  Cuts
        # the C per-class sorts from A anchors to N — the dominant cost for
        # anchor-heavy configs (RetinaNet: ~49k anchors x 80 classes).  OFF
        # by default: the reference ranks each class over ALL anchors
        # (box_utils.py:166-171); with N >= the anchors carrying real scores
        # (standard practice: 1000) results are identical in practice.
        # Dict form ``{'k': 1000, 'approx': True, 'recall_target': 0.95}``
        # selects candidates with ``jax.lax.approx_max_k`` — the TPU-native
        # partial-reduction top-k (arXiv:2206.14286), much cheaper than the
        # exact sort over many anchors.
        self.pre_nms_approx = False
        self.pre_nms_recall = 0.95
        if isinstance(pre_nms_top_k, dict):
            self.pre_nms_approx = bool(pre_nms_top_k.get('approx', False))
            self.pre_nms_recall = float(pre_nms_top_k.get('recall_target',
                                                          0.95))
            pre_nms_top_k = pre_nms_top_k.get('k')
        self.pre_nms_top_k = int(pre_nms_top_k) if pre_nms_top_k else None
        if use_pallas is None:
            from single_shot_detection_tpu.ops import nms_pallas
            use_pallas = nms_pallas.available() and not self.soft
        self.use_pallas = bool(use_pallas)

    SERVING_TOP_K = 1000          # standard candidate budget
    SERVING_ANCHOR_THRESHOLD = 10000  # above this, per-class NMS is sort-bound

    @staticmethod
    def serving_preset(postprocess_cfg: dict, num_anchors: int) -> dict:
        """SERVING.md's measured preset for the serving paths
        (predict/test/export): ``pre_nms_top_k=1000`` on anchor-heavy
        configs (1.5-3x measured: retina 170->522, vgg512 235->391 img/s)
        unless the config pins the key itself — pinning it (even to None)
        wins.  Eval paths should NOT use this: rank-over-all-anchors is
        the reference's eval semantics (postprocessor.py:9-23)."""
        pp = dict(postprocess_cfg or {})
        if ('pre_nms_top_k' not in pp
                and int(num_anchors) > Postprocessor.SERVING_ANCHOR_THRESHOLD):
            pp['pre_nms_top_k'] = Postprocessor.SERVING_TOP_K
        return pp

    def __call__(self, scores: jnp.ndarray, locs: jnp.ndarray, anchors: jnp.ndarray):
        return _postprocess(scores, locs, anchors,
                            xy_scale=self.box_coder.xy_scale,
                            wh_scale=self.box_coder.wh_scale,
                            score_threshold=self.score_threshold,
                            overlap_threshold=self.overlap_threshold,
                            max_per_class=self.max_per_class,
                            score_converter=self.score_converter,
                            max_total=self.max_total,
                            soft=self.soft,
                            sigma=self.sigma,
                            pre_nms_top_k=self.pre_nms_top_k,
                            pre_nms_approx=self.pre_nms_approx,
                            pre_nms_recall=self.pre_nms_recall,
                            use_pallas=self.use_pallas)


@functools.partial(jax.jit, static_argnames=(
    'xy_scale', 'wh_scale', 'score_threshold', 'overlap_threshold',
    'max_per_class', 'score_converter', 'max_total', 'soft', 'sigma',
    'pre_nms_top_k', 'pre_nms_approx', 'pre_nms_recall', 'use_pallas'))
def _postprocess(scores, locs, anchors, *, xy_scale, wh_scale, score_threshold,
                 overlap_threshold, max_per_class, score_converter, max_total,
                 soft, sigma, pre_nms_top_k=None, pre_nms_approx=False,
                 pre_nms_recall=0.95, use_pallas=False):
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    coder = BoxCoder(xy_scale=xy_scale, wh_scale=wh_scale)

    batch, num_anchors = scores.shape[0], anchors.shape[0]
    scores = scores.reshape(batch, num_anchors, -1).astype(jnp.float32)
    locs = locs.reshape(batch, num_anchors, 4).astype(jnp.float32)

    if score_converter == 'SOFTMAX':
        probs = jax.nn.softmax(scores, axis=-1)[..., 1:]  # drop background col
    else:
        probs = jax.nn.sigmoid(scores)
    num_classes = probs.shape[-1]

    boxes = box_ops.to_corners(coder.decode(locs, anchors))  # [B, A, 4]

    # Optional candidate pre-selection (see Postprocessor.pre_nms_top_k):
    # ONE top-k over anchors by best-class score replaces C-fold ranking
    # work downstream.
    if pre_nms_top_k is not None and pre_nms_top_k < num_anchors:
        best = jnp.max(probs, axis=-1)                       # [B, A]
        if pre_nms_approx:
            # TPU-native partial-reduction top-k (arXiv:2206.14286): avoids
            # the full sort over A anchors; aggregate_to_topk keeps the
            # returned N exact within the approximate candidate set.
            _, cand = jax.lax.approx_max_k(
                best, pre_nms_top_k, recall_target=pre_nms_recall)
        else:
            _, cand = jax.lax.top_k(best, pre_nms_top_k)     # [B, N]
        probs = jnp.take_along_axis(probs, cand[..., None], axis=1)
        boxes = jnp.take_along_axis(boxes, cand[..., None], axis=1)
        num_anchors = pre_nms_top_k

    # Per (image, class): score-threshold -> top max_per_class -> NMS.
    k = min(max_per_class, num_anchors)
    cls_scores = jnp.swapaxes(probs, 1, 2)  # [B, C, A]
    gated = jnp.where(cls_scores > score_threshold, cls_scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(gated, k)            # [B, C, K]
    top_boxes = jnp.take_along_axis(boxes[:, None, :, :],
                                    top_idx[..., None], axis=2)  # [B, C, K, 4]

    if soft:
        def suppress(b, s):
            picked = nms_ops.soft_nms(b, jnp.where(s > -jnp.inf, s, 0.0),
                                      score_threshold, sigma)
            return picked & (s > -jnp.inf)

        keep = jax.vmap(jax.vmap(suppress))(top_boxes, top_scores)
    elif use_pallas:
        from single_shot_detection_tpu.ops import nms_pallas
        flat_boxes_sorted = top_boxes.reshape(-1, k, 4)
        flat_sorted_scores = top_scores.reshape(-1, k)
        keep = nms_pallas.nms_keep_batched(
            flat_boxes_sorted, flat_sorted_scores, overlap_threshold)
        keep = keep.reshape(top_scores.shape)
    else:
        def suppress(b, s):
            return nms_ops.nms_mask(b, s, overlap_threshold)

        keep = jax.vmap(jax.vmap(suppress))(top_boxes, top_scores)  # [B, C, K]
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)

    # Flatten classes, attach 1-based class ids, take global top max_total.
    class_ids = jnp.broadcast_to(
        (jnp.arange(num_classes, dtype=jnp.float32) + 1.0)[None, :, None],
        kept_scores.shape)
    flat_scores = kept_scores.reshape(batch, -1)
    flat_boxes = top_boxes.reshape(batch, -1, 4)
    flat_classes = class_ids.reshape(batch, -1)

    total = flat_scores.shape[1] if max_total is None else min(max_total, flat_scores.shape[1])
    final_scores, idx = jax.lax.top_k(flat_scores, total)
    final_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
    final_classes = jnp.take_along_axis(flat_classes, idx, axis=1)

    valid = final_scores > -jnp.inf
    out_scores = jnp.where(valid, final_scores, 0.0)
    detections = jnp.concatenate(
        [final_boxes, final_classes[..., None], out_scores[..., None]], axis=-1)
    return detections, valid
