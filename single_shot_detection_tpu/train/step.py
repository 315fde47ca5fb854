"""The jitted train / eval steps — the framework's hot loop.

Replaces the reference's per-batch choreography (SURVEY.md §3.1): forward,
CPU target assignment, loss, backward, DDP allreduce, optimizer step and
mixup (callbacks.py:10-42,149-158 + init.py:101-135) collapse into ONE
compiled XLA program per phase:

  train_step(state, batch, rng) -> (state, metrics)
  eval_step(state, batch)       -> (metrics, detections, valid)

Everything — mixup, anchor matching, hard-negative mining, loss, gradients,
optimizer update, batch-norm stat sync — runs on-chip with static shapes.
Under a data-sharded mesh, XLA inserts the gradient all-reduce automatically
(the loss is a scalar over the global batch), so there is no pmean
choreography to maintain.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from single_shot_detection_tpu.ops.matching import SCORE_INDEX


def apply_mixup(rng, images, boxes, box_mask, alpha: float, p: float):
    """On-device batch mixup (parity: batch_container.py:25-45 ``mixup_``).

    One beta-sampled ``lam`` per batch; each image mixes with a random
    partner with probability ``p``; GT lists concatenate with lam-scaled
    score columns (padded slots stay masked).
    """
    batch = images.shape[0]
    k_lam, k_perm, k_roll = jax.random.split(rng, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    index = jax.random.permutation(k_perm, batch)
    roll = jax.random.uniform(k_roll, (batch,)) < p

    partner = images[index]
    mixed = lam * images + (1.0 - lam) * partner
    images = jnp.where(roll[:, None, None, None], mixed, images)

    own = boxes.at[..., SCORE_INDEX].multiply(
        jnp.where(roll, lam, 1.0)[:, None])
    other = boxes[index].at[..., SCORE_INDEX].multiply(1.0 - lam)
    out_boxes = jnp.concatenate([own, other], axis=1)
    out_mask = jnp.concatenate(
        [box_mask, box_mask[index] & roll[:, None]], axis=1)
    return images, out_boxes, out_mask


def make_train_step(module,
                    criterion,
                    assigner,
                    anchors,
                    tx: optax.GradientTransformation,
                    mixup: Optional[dict] = None,
                    pipeline=None,
                    donate: bool = True,
                    with_grads: bool = False,
                    frozen_bn: bool = False,
                    ema: Optional[float] = None,
                    apply_fn: Optional[Callable] = None,
                    qat: bool = False,
                    state_sharding=None) -> Callable:
    """Build the jitted train step (parity: init.py:101-135 ``step_fn`` +
    callbacks optimizer/loss/mixup).

    When ``pipeline`` (data.transforms.Pipeline) is given, the on-device
    augmentation fuses INTO the step: the batch carries raw staged uint8
    images + 7-col boxes and the whole epoch iteration is one XLA program
    dispatch per step.

    ``frozen_bn`` (beyond-parity extension): normalize with the stored
    running statistics instead of batch statistics and never update them —
    the standard detection fine-tune recipe when starting from imported
    pretrained/reference weights (``utils/torch_import``).  BN scale/bias
    still receive gradients.  Side benefits on TPU: the batch-stat
    reductions (the largest op family in the flagship step trace,
    docs/PERF.md) disappear from the program, and multi-host runs need no
    cross-host stat sync.  Meaningless from random init (running stats are
    the 0/1 identity).

    ``ema`` (beyond-parity extension): exponential-moving-average decay for
    a shadow copy of the params (``state.ema_params``), updated in-step
    (fused elementwise — negligible on TPU) with the standard warmup ramp
    ``min(ema, (1 + t) / (10 + t))`` so short runs aren't dominated by the
    random init.  Eval/serving read the EMA weights (engine ``train.ema``).

    ``apply_fn`` overrides ``module.apply`` for the forward pass (same
    signature/mutable contract) — e.g. the QAT fake-quant forward
    (export/quantize.qat_apply, engine ``train.qat``).

    ``state_sharding`` (beyond-parity, ``train.zero_sharding``): a pytree
    of shardings matching the state (parallel.zero_state_sharding); the
    output state is pinned to it so GSPMD keeps the ZeRO layout stable
    across donated steps instead of re-deciding it (a drifting layout
    breaks buffer donation AND triggers a recompile on the next call).
    """
    train_step = _train_step_body(module, criterion, assigner, anchors, tx,
                                  mixup, pipeline, with_grads, frozen_bn,
                                  ema, apply_fn, qat)
    train_step = _pin_state(train_step, state_sharding)
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_fused_train_step(module, criterion, assigner, anchors, tx,
                          k: int,
                          mixup: Optional[dict] = None,
                          pipeline=None,
                          donate: bool = True,
                          frozen_bn: bool = False,
                          ema: Optional[float] = None,
                          apply_fn: Optional[Callable] = None,
                          qat: bool = False,
                          state_sharding=None) -> Callable:
    """``k`` train steps per XLA dispatch via ``lax.scan``.

    Dispatch/readback round trips dominate small-model steps on remote
    TPU transports; scanning over ``k`` pre-staged micro-batches amortizes
    them k-fold.  ``batches`` leaves carry a leading [k, B, ...] axis;
    returns summed metrics plus the per-chunk mean loss for display.
    """
    body = _train_step_body(module, criterion, assigner, anchors, tx,
                            mixup, pipeline, with_grads=False,
                            frozen_bn=frozen_bn, ema=ema, apply_fn=apply_fn,
                            qat=qat)
    # pin the scan carry, not just the final state: the ZeRO layout must
    # hold on every iteration or GSPMD reshards inside the loop
    body = _pin_state(body, state_sharding)

    def fused(state, batches, rng):
        keys = jax.random.split(rng, k)

        def scan_body(state, xs):
            batch, key = xs
            return body(state, batch, key)

        state, stacked = jax.lax.scan(scan_body, state, (batches, keys))
        sums = jax.tree_util.tree_map(lambda m: jnp.sum(m, axis=0), stacked)
        return state, sums

    return jax.jit(fused, donate_argnums=(0,) if donate else ())


def _pin_state(step_fn, state_sharding):
    """Constrain the state a step returns to ``state_sharding`` (identity
    when None).  Works for both (state, metrics) and (state, (metrics,
    grads)) return shapes — only the first element is pinned."""
    if state_sharding is None:
        return step_fn

    def pinned(state, *args):
        out_state, aux = step_fn(state, *args)
        out_state = jax.lax.with_sharding_constraint(out_state,
                                                     state_sharding)
        return out_state, aux

    return pinned


def _train_step_body(module, criterion, assigner, anchors, tx,
                     mixup, pipeline, with_grads, frozen_bn=False,
                     ema=None, apply_fn=None, qat=False):
    anchors = jnp.asarray(anchors)
    apply_fn = apply_fn if apply_fn is not None else module.apply

    def train_step(state, batch, rng):
        images = batch['image']
        boxes = batch['boxes']
        box_mask = batch['box_mask']

        if pipeline is not None:
            aug_rng, rng = jax.random.split(rng)
            images, boxes, box_mask = pipeline._run_batch(
                aug_rng, images, boxes, box_mask)
            boxes = boxes[..., :6]

        if mixup is not None:
            images, boxes, box_mask = apply_mixup(
                rng, images, boxes, box_mask, mixup['alpha'], mixup['p'])

        target = assigner(boxes, box_mask, anchors)

        def loss_fn(params):
            if frozen_bn and qat:
                # frozen BN + QAT: BN reads running stats and writes
                # nothing at train=False even under mutable, while the QAT
                # act_amax EMA (export/quantize.py) still needs to update
                (scores, locs), mutated = apply_fn(
                    {'params': params, 'batch_stats': state.batch_stats},
                    images, train=False, mutable=['batch_stats'])
                new_stats = mutated['batch_stats']
            elif frozen_bn:
                # running-stat normalization, stats not updated (train=False
                # only gates BN in every zoo module); params still train
                scores, locs = apply_fn(
                    {'params': params, 'batch_stats': state.batch_stats},
                    images, train=False)
                new_stats = state.batch_stats
            else:
                (scores, locs), mutated = apply_fn(
                    {'params': params, 'batch_stats': state.batch_stats},
                    images, train=True, mutable=['batch_stats'])
                new_stats = mutated['batch_stats']
            loss, class_loss, loc_loss = criterion(
                scores.astype(jnp.float32), locs.astype(jnp.float32),
                anchors, target)
            return loss, (class_loss, loc_loss, new_stats)

        (loss, (class_loss, loc_loss, batch_stats)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, updates)
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema is not None:
            step = (state.step + 1).astype(jnp.float32)
            decay = jnp.minimum(jnp.float32(ema),
                                (1.0 + step) / (10.0 + step))
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e + (1.0 - decay) * (p.astype(e.dtype) - e),
                state.ema_params, params)

        new_state = state.replace(step=state.step + 1,
                                  params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state,
                                  ema_params=ema_params)
        metrics = {'loss': loss, 'class_loss': class_loss,
                   'loc_loss': loc_loss}
        if with_grads:
            # for TaylorExpansion pruning (engine feeds observe_grads on a
            # cadence; the extra output is only materialized when pulled)
            metrics['grads'] = grads
        return new_state, metrics

    return train_step


def make_eval_step(module, criterion, assigner, anchors,
                   postprocessor, apply_fn: Optional[Callable] = None
                   ) -> Callable:
    """Build the jitted eval step (parity: eval.py:43-57 + init.py:118-123):
    forward + loss + batched postprocess, all on-chip.

    ``apply_fn`` overrides ``module.apply`` — e.g. the calibrated int8
    forward from ``export.quantize.quantized_apply``.
    """
    anchors = jnp.asarray(anchors)
    apply_fn = apply_fn if apply_fn is not None else module.apply

    def eval_step(state, batch):
        images = batch['image']
        target = assigner(batch['boxes'], batch['box_mask'], anchors)

        scores, locs = apply_fn(
            {'params': state.params, 'batch_stats': state.batch_stats},
            images, train=False)
        scores = scores.astype(jnp.float32)
        locs = locs.astype(jnp.float32)

        # padded rows of a partial batch must not contribute loss
        loss, class_loss, loc_loss = criterion(
            scores, locs, anchors, target,
            image_mask=batch.get('image_valid'))
        detections, valid = postprocessor(scores, locs, anchors)
        metrics = {'loss': loss, 'class_loss': class_loss,
                   'loc_loss': loc_loss}
        return metrics, detections, valid

    return jax.jit(eval_step)


def make_predict_step(module, postprocessor, anchors,
                      apply_fn: Optional[Callable] = None) -> Callable:
    """Inference-only step (parity: detector_wrapper.py:49-65
    ``predict_single``, but batched).  ``apply_fn`` as in
    :func:`make_eval_step`."""
    anchors = jnp.asarray(anchors)
    apply_fn = apply_fn if apply_fn is not None else module.apply

    @jax.jit
    def predict_step(variables, images):
        scores, locs = apply_fn(variables, images, train=False)
        return postprocessor(scores.astype(jnp.float32),
                             locs.astype(jnp.float32), anchors)

    return predict_step
