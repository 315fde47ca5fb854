"""Loss zoo + MultiboxLoss.

Functional-parity targets: reference ``bf/modules/losses.py`` (zoo) and
``detection/losses/multibox_loss.py``.

TPU-first design: the reference gathers variable-length subsets with boolean
indexing (``scores[sampled_mask]``).  Here every loss takes a ``mask`` and
computes a masked reduction over fixed shapes — semantically identical under
``reduction='sum'`` (and matching the reference's data-dependent normalizers
under masked means).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from single_shot_detection_tpu.ops import boxes as box_ops
from single_shot_detection_tpu.ops.matching import (CLASS_INDEX, IGNORE_CLASS,
                                                    LOC_INDEX_END,
                                                    LOC_INDEX_START,
                                                    NEGATIVE_CLASS,
                                                    SCORE_INDEX)
from single_shot_detection_tpu.utils.misc import filter_kwargs


def _masked_reduce(values: jnp.ndarray, mask: jnp.ndarray, reduction: str) -> jnp.ndarray:
    """Reduce per-row loss ``values`` over rows where ``mask`` is True."""
    values = jnp.where(mask, values, 0.0)
    if reduction == 'sum':
        return jnp.sum(values)
    if reduction == 'mean':
        return jnp.sum(values) / jnp.maximum(jnp.sum(mask), 1)
    return values


class _Loss:
    """Base: reduction + label-smoothing helper (parity: losses.py:9-32)."""

    SOFT_TARGET = False
    MULTICLASS = False
    IOU_LOSS = False

    def __init__(self, reduction: str = 'mean', epsilon: float = 0.0, **_):
        if reduction not in ('mean', 'sum', 'none'):
            raise ValueError(f'Wrong value for reduction: {reduction}')
        assert 0.0 <= epsilon < 1
        self.reduction = reduction
        self.epsilon = epsilon

    def _soften(self, target: jnp.ndarray) -> jnp.ndarray:
        """Label smoothing over soft targets (parity: losses.py:28-32)."""
        pos = (target > 0).astype(target.dtype)
        num_classes = target.shape[-1]
        spread = (self.epsilon * jnp.sum(target, -1, keepdims=True)
                  / (num_classes - jnp.sum(pos, -1, keepdims=True)))
        target = target + (1.0 - pos) * spread
        target = target - pos * self.epsilon * target
        return target


class CrossEntropyLoss(_Loss):
    """Hard-label CE with ignore_index (parity: torch ``F.cross_entropy``)."""

    def __init__(self, ignore_index: int = -100, **kwargs):
        super().__init__(**kwargs)
        self.ignore_index = ignore_index

    def __call__(self, logits, target, mask=None):
        # logits [..., C], target int [...]
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.maximum(target, 0)
        # one-hot reduction instead of take_along_axis (gather) — TPU-friendly
        onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=logp.dtype)
        ce = -jnp.sum(logp * onehot, axis=-1)
        return _masked_reduce(ce, valid, self.reduction)


class SmoothL1Loss(_Loss):
    """Huber / smooth-L1 summed over the last axis per row (parity: torch)."""

    def __init__(self, beta: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.beta = beta

    def __call__(self, pred, target, mask=None):
        diff = jnp.abs(pred - target)
        per_elem = jnp.where(diff < self.beta,
                             0.5 * diff * diff / self.beta,
                             diff - 0.5 * self.beta)
        per_row = jnp.sum(per_elem, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class L1Loss(_Loss):
    """Plain L1 summed over the last axis per row (parity: torch ``F.l1_loss``
    — NOT Huber; the reference re-exports torch's L1Loss directly,
    losses.py:4)."""

    def __call__(self, pred, target, mask=None):
        per_row = jnp.sum(jnp.abs(pred - target), axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class MSELoss(_Loss):
    """Squared error summed over the last axis per row (parity: torch
    ``F.mse_loss`` — the reference re-exports all torch losses,
    losses.py:4)."""

    def __call__(self, pred, target, mask=None):
        per_row = jnp.sum((pred - target) ** 2, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class HuberLoss(_Loss):
    """Huber loss, torch's ``delta`` parameterization (parity: torch
    ``F.huber_loss`` via the reference's blanket re-export, losses.py:4).
    Unlike :class:`SmoothL1Loss` the quadratic zone is NOT divided by the
    threshold: ``0.5*d^2`` for ``|d| < delta`` else ``delta*(|d| - delta/2)``
    — identical only at ``delta == beta == 1``."""

    def __init__(self, delta: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.delta = delta

    def __call__(self, pred, target, mask=None):
        diff = jnp.abs(pred - target)
        per_elem = jnp.where(diff < self.delta,
                             0.5 * diff * diff,
                             self.delta * (diff - 0.5 * self.delta))
        per_row = jnp.sum(per_elem, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class NLLLoss(_Loss):
    """Negative log likelihood over the last axis (parity: torch
    ``F.nll_loss`` via the reference's re-export).  Like torch, applies NO
    softmax — the input is expected to already hold log-probabilities; on
    raw logits this is simply ``-logits[target]``."""

    def __init__(self, ignore_index: int = -100, **kwargs):
        super().__init__(**kwargs)
        self.ignore_index = ignore_index

    def __call__(self, logp, target, mask=None):
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        safe = jnp.maximum(target, 0)
        onehot = jax.nn.one_hot(safe, logp.shape[-1], dtype=logp.dtype)
        nll = -jnp.sum(logp * onehot, axis=-1)
        return _masked_reduce(nll, valid, self.reduction)


class BCEWithLogitsLoss(_Loss):
    """Elementwise sigmoid BCE on logits (parity: torch
    ``F.binary_cross_entropy_with_logits`` via the reference's re-export).
    In the multibox context the target is the {0, score} multi-hot plane
    (MULTICLASS), like :class:`SigmoidFocalLoss` with gamma=0 and no alpha
    weighting.  ``pos_weight`` multiplies the positive term per torch."""

    MULTICLASS = True

    def __init__(self, pos_weight=None, **kwargs):
        super().__init__(**kwargs)
        self.pos_weight = pos_weight

    def __call__(self, logits, target, mask=None):
        if self.pos_weight is not None:
            # torch definition: -[w_p*t*log(sig(x)) + (1-t)*log(1-sig(x))]
            per_elem = -(jnp.asarray(self.pos_weight) * target
                         * jax.nn.log_sigmoid(logits)
                         + (1.0 - target) * jax.nn.log_sigmoid(-logits))
        else:
            # classic stable form: max(x,0) - x*t + log1p(exp(-|x|))
            per_elem = (jnp.maximum(logits, 0) - logits * target
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        per_row = jnp.sum(per_elem, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class BCELoss(_Loss):
    """Binary cross entropy on PROBABILITIES (parity: torch ``F.binary_
    cross_entropy`` via the reference's blanket re-export, losses.py:4).
    Like torch, each log term is clamped at -100 so exact 0/1 inputs
    yield finite losses."""

    def __call__(self, probs, target, mask=None):
        log_p = jnp.maximum(jnp.log(probs), -100.0)
        log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
        per_elem = -(target * log_p + (1.0 - target) * log_1p)
        per_row = jnp.sum(per_elem, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class KLDivLoss(_Loss):
    """Pointwise KL divergence, input = log-probabilities (parity: torch
    ``F.kl_div`` with ``log_target=False``): ``t * (log t - x)`` with the
    ``0 * log 0 = 0`` convention."""

    def __call__(self, log_pred, target, mask=None):
        safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-38)),
                               0.0)
        per_elem = jnp.where(target > 0, target * (safe_log_t - log_pred),
                             0.0)
        per_row = jnp.sum(per_elem, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class PoissonNLLLoss(_Loss):
    """Poisson negative log likelihood (parity: torch ``F.poisson_nll_loss``
    defaults ``log_input=True, full=False``): ``exp(x) - t * x``."""

    def __init__(self, log_input: bool = True, full: bool = False, **kwargs):
        super().__init__(**kwargs)
        if not log_input or full:
            raise NotImplementedError(
                'PoissonNLLLoss: only the torch defaults '
                '(log_input=True, full=False) are implemented')

    def __call__(self, log_pred, target, mask=None):
        per_row = jnp.sum(jnp.exp(log_pred) - target * log_pred, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class SoftMarginLoss(_Loss):
    """Two-class logistic margin loss (parity: torch ``F.soft_margin_loss``):
    ``log(1 + exp(-y * x))`` with labels in {-1, +1}; computed as
    ``softplus(-y * x)`` for stability."""

    def __call__(self, pred, target, mask=None):
        per_row = jnp.sum(jax.nn.softplus(-target * pred), axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class SigmoidFocalLoss(_Loss):
    """Multi-hot sigmoid focal loss (parity: losses.py:34-54)."""

    MULTICLASS = True

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25, **kwargs):
        super().__init__(**kwargs)
        self.gamma = gamma
        self.alpha = alpha

    def __call__(self, logits, target, mask=None):
        # logits/target [..., C] — target is a {0, score} multi-hot plane.
        alpha_weight = target * self.alpha + (1.0 - target) * (1.0 - self.alpha)
        pb = jax.nn.sigmoid(logits)
        pt = pb * target + (1.0 - pb) * (1.0 - target)
        ce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        per_row = jnp.sum(alpha_weight * (1.0 - pt) ** self.gamma * ce, axis=-1)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


class SoftmaxFocalLoss(_Loss):
    """Hard-label softmax focal loss (parity: losses.py:56-78)."""

    def __init__(self, gamma: float = 0.0, alpha=None, ignore_index: int = -100, **kwargs):
        super().__init__(**kwargs)
        self.gamma = gamma
        self.alpha = alpha
        self.ignore_index = ignore_index

    def __call__(self, logits, target, mask=None):
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.maximum(target, 0)
        onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=logp.dtype)
        logpb = jnp.sum(logp * onehot, axis=-1)
        pb = jnp.exp(logpb)
        loss = -((1.0 - pb) ** self.gamma) * logpb
        if self.alpha is not None:
            alpha = jnp.where(target == 0, 1.0 - self.alpha, self.alpha)
            loss = loss * alpha
        return _masked_reduce(loss, valid, self.reduction)


class CrossEntropyWithSoftTargetsLoss(_Loss):
    """Soft-target CE with data-dependent scale (parity: losses.py:80-93)."""

    SOFT_TARGET = True

    def __call__(self, logits, target, mask=None):
        if self.epsilon:
            target = self._soften(target)
        logp = jax.nn.log_softmax(logits, axis=-1)
        row_sum = jnp.sum(target, axis=-1)
        if mask is None:
            mask = jnp.ones(row_sum.shape, dtype=bool)
        # scale = 1 / mean(target.sum(-1)) over the sampled rows (losses.py:90)
        mean_mass = jnp.sum(jnp.where(mask, row_sum, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
        scale = 1.0 / jnp.maximum(mean_mass, 1e-12)
        per_row = -scale * jnp.sum(logp * target, axis=-1)
        return _masked_reduce(per_row, mask, self.reduction)


class BinaryCrossEntropyWithSoftTargetsLoss(_Loss):
    """Soft-target BCE with positive-row scale (parity: losses.py:95-106)."""

    SOFT_TARGET = True
    MULTICLASS = True

    def __call__(self, logits, target, mask=None):
        if self.epsilon:
            target = self._soften(target)
        if mask is None:
            mask = jnp.ones(target.shape[:-1], dtype=bool)
        row_mean = jnp.mean(target, axis=-1)
        row_mean = jnp.where(mask, row_mean, 0.0)
        positive_rows = jnp.sum(row_mean > 0)
        scale = jnp.maximum(positive_rows, 1) / jnp.maximum(jnp.sum(row_mean), 1e-12)
        bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        per_row = jnp.sum(bce, axis=-1)
        return scale * _masked_reduce(per_row, mask, self.reduction)


class GeneralizedIoULoss(_Loss):
    """1 - GIoU on corner boxes (parity: losses.py:109-114)."""

    IOU_LOSS = True

    def __call__(self, boxes, target, mask=None):
        per_row = 1.0 - box_ops.generalized_iou(boxes, target, cartesian=False)
        if mask is None:
            mask = jnp.ones(per_row.shape, dtype=bool)
        return _masked_reduce(per_row, mask, self.reduction)


LOSSES = {
    'CrossEntropyLoss': CrossEntropyLoss,
    'SmoothL1Loss': SmoothL1Loss,
    'L1Loss': L1Loss,
    'MSELoss': MSELoss,
    'HuberLoss': HuberLoss,
    'NLLLoss': NLLLoss,
    'BCEWithLogitsLoss': BCEWithLogitsLoss,
    'BCELoss': BCELoss,
    'KLDivLoss': KLDivLoss,
    'PoissonNLLLoss': PoissonNLLLoss,
    'SoftMarginLoss': SoftMarginLoss,
    'SigmoidFocalLoss': SigmoidFocalLoss,
    'SoftmaxFocalLoss': SoftmaxFocalLoss,
    'CrossEntropyWithSoftTargetsLoss': CrossEntropyWithSoftTargetsLoss,
    'BinaryCrossEntropyWithSoftTargetsLoss': BinaryCrossEntropyWithSoftTargetsLoss,
    'GeneralizedIoULoss': GeneralizedIoULoss,
}


def build_loss(name: str, **kwargs):
    """Config-driven loss factory with kwarg filtering (parity:
    multibox_loss.py:23-30).  The reference re-exports torch's entire loss
    namespace (losses.py:4); any torch loss name NOT in our zoo fails here
    with the supported list rather than a bare KeyError."""
    if name not in LOSSES:
        raise KeyError(
            f'Unknown loss {name!r}. Supported names: '
            f'{", ".join(sorted(LOSSES))}. (The torch reference re-exports '
            f'every torch.nn loss; this TPU build implements the detection-'
            f'relevant subset — ask for others by name.)')
    return filter_kwargs(LOSSES[name])(**kwargs)


class MultiboxLoss:
    """Classification + localization multibox loss (parity: multibox_loss.py:10-94).

    ``__call__(scores, locs, anchors, target)`` with
      scores  ``[B, A, C]`` raw logits,
      locs    ``[B, A, 4]`` raw regression outputs,
      anchors ``[A, 4]`` centroid priors,
      target  ``[B, A, 6]`` assigned targets (raw corner loc, class, score)
    returns ``(loss, class_loss, loc_loss)`` — each already divided by the
    clamped positive count, matching multibox_loss.py:88-92.
    """

    def __init__(self,
                 sampler,
                 box_coder,
                 classification_loss: dict,
                 localization_loss: dict,
                 classification_weight: float = 1.0,
                 localization_weight: float = 1.0):
        self.sampler = sampler
        self.box_coder = box_coder

        self.classification_loss = build_loss(
            classification_loss['name'], reduction='sum', ignore_index=IGNORE_CLASS,
            **{k: v for k, v in classification_loss.items() if k != 'name'})
        self.soft_target = self.classification_loss.SOFT_TARGET
        self.multiclass = self.classification_loss.MULTICLASS

        self.localization_loss = build_loss(
            localization_loss['name'], reduction='sum',
            **{k: v for k, v in localization_loss.items() if k != 'name'})
        self.iou_loss = self.localization_loss.IOU_LOSS

        self.classification_weight = classification_weight
        self.localization_weight = localization_weight

    def __call__(self, scores, locs, anchors, target, image_mask=None):
        """``image_mask [B]`` (optional) drops whole images from the loss —
        used for the zero-padded rows of a partial eval batch, which would
        otherwise each contribute ``min_negative_per_image`` hard negatives."""
        target_locs = target[..., LOC_INDEX_START:LOC_INDEX_END]
        target_classes = target[..., CLASS_INDEX].astype(jnp.int32)
        target_scores = target[..., SCORE_INDEX]

        positive_mask = ((target_classes != NEGATIVE_CLASS)
                         & (target_classes != IGNORE_CLASS))
        sampled_mask = self.sampler(scores, target_classes)
        if image_mask is not None:
            positive_mask = positive_mask & image_mask[:, None]
            sampled_mask = sampled_mask & image_mask[:, None]

        num_classes = scores.shape[-1]
        if self.multiclass:
            # one-hot at (class - 1) carrying the GT score (multibox_loss.py:64-67)
            onehot = jax.nn.one_hot(target_classes - 1, num_classes, dtype=scores.dtype)
            class_target = onehot * jnp.where(positive_mask, target_scores, 0.0)[..., None]
            class_loss = self.classification_loss(scores, class_target, sampled_mask)
        elif self.soft_target:
            keep = target_classes != IGNORE_CLASS
            onehot = jax.nn.one_hot(target_classes, num_classes, dtype=scores.dtype)
            class_target = onehot * jnp.where(keep, target_scores, 0.0)[..., None]
            class_loss = self.classification_loss(scores, class_target, sampled_mask)
        else:
            class_loss = self.classification_loss(scores, target_classes, sampled_mask)

        if self.iou_loss:
            decoded = self.box_coder.decode(locs, anchors)
            pred_boxes = box_ops.to_corners(decoded)
            loc_loss = self.localization_loss(pred_boxes, target_locs, positive_mask)
        else:
            encoded_target = self.box_coder.encode(box_ops.to_centroids(target_locs), anchors)
            loc_loss = self.localization_loss(locs, encoded_target, positive_mask)

        divider = jnp.maximum(jnp.sum(positive_mask), 1).astype(scores.dtype)
        loc_loss = loc_loss * self.localization_weight / divider
        class_loss = class_loss * self.classification_weight / divider
        return class_loss + loc_loss, class_loss, loc_loss
