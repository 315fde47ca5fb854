"""Pallas TPU kernel: batched exact greedy NMS.

Replaces the reference's ``torchvision.ops.nms`` C++/CUDA hot loop
(box_utils.py:193) — the BASELINE.md north-star native kernel (p50 batched
NMS < 2 ms).

Design: the postprocessor reduces each (image, class) pair to K=128
score-sorted candidates; NMS over N = batch x classes independent problems.
The kernel processes a block of ``BN`` problems per grid step entirely in
VMEM: pairwise IoU as pure VPU math, then the K-step greedy suppression sweep
— each step updates an ``[BN, K]`` tile, exactly one VPU register row per
problem, so the sequential chain is amortized across the block.  No HBM
traffic inside the loop.

Semantics match ``torchvision.ops.nms``: process in descending score order,
suppress any later box with IoU strictly greater than the threshold against a
kept box (same contract as ops/nms.py:nms_mask, which is the jnp reference
implementation this kernel is tested against).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _nms_block_kernel(boxes_ref, out_ref, suppress_ref, *,
                      overlap_threshold: float, num_valid: int):
    """boxes_ref: [BN, 4, K] f32 (score-sorted); out_ref: [BN, K] f32 keep;
    suppress_ref: [BN, K, K] f32 VMEM scratch (pairwise suppression matrix)."""
    bn, _, k = boxes_ref.shape

    x0 = boxes_ref[:, 0, :]
    y0 = boxes_ref[:, 1, :]
    x1 = boxes_ref[:, 2, :]
    y1 = boxes_ref[:, 3, :]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)  # [BN, K]

    ix0 = jnp.maximum(x0[:, :, None], x0[:, None, :])
    iy0 = jnp.maximum(y0[:, :, None], y0[:, None, :])
    ix1 = jnp.minimum(x1[:, :, None], x1[:, None, :])
    iy1 = jnp.minimum(y1[:, :, None], y1[:, None, :])
    inter = (jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0))
    union = area[:, :, None] + area[:, None, :] - inter
    iou = inter / union  # NaN for empty/padded rows -> comparisons False

    later = (jax.lax.broadcasted_iota(jnp.int32, (bn, k, k), 2)
             > jax.lax.broadcasted_iota(jnp.int32, (bn, k, k), 1))
    suppress_ref[:, :, :] = jnp.where(later & (iou > overlap_threshold),
                                      1.0, 0.0)

    # greedy sweep: out_ref accumulates the *suppressed* mask.  Dynamic row
    # reads go through the scratch ref (sublane dynamic indexing); the
    # per-problem "is row i still alive" scalar is extracted with a one-hot
    # reduction because dynamic indexing of the lane dimension won't lower.
    out_ref[:, :] = jnp.zeros((bn, k), jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, k), 1)

    def body(i, _):
        row = suppress_ref[:, pl.ds(i, 1), :][:, 0, :]       # [BN, K]
        onehot = (lane_ids == i).astype(jnp.float32)
        alive = 1.0 - jnp.sum(out_ref[:, :] * onehot, axis=1, keepdims=True)
        out_ref[:, :] = jnp.maximum(out_ref[:, :], row * alive)
        return 0

    jax.lax.fori_loop(0, num_valid, body, 0)
    out_ref[:, :] = 1.0 - out_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=('overlap_threshold', 'block_problems'))
def nms_keep_batched(boxes: jnp.ndarray,
                     scores: jnp.ndarray,
                     overlap_threshold: float,
                     block_problems: int = 16) -> jnp.ndarray:
    """Exact greedy NMS over ``N`` independent problems.

    Args:
      boxes: ``[N, K, 4]`` corner boxes, **sorted by score descending**.
      scores: ``[N, K]`` sorted scores; ``-inf`` marks invalid candidates.
      overlap_threshold: suppress IoU strictly greater than this.
    Returns:
      ``[N, K]`` bool keep mask.
    """
    n, k, _ = boxes.shape
    k_pad = max(LANE, ((k + LANE - 1) // LANE) * LANE)
    bn = min(block_problems, n)
    n_pad = ((n + bn - 1) // bn) * bn

    boxes_t = jnp.moveaxis(boxes, 2, 1)  # [N, 4, K]
    boxes_t = jnp.pad(boxes_t, ((0, n_pad - n), (0, 0), (0, k_pad - k)))

    keep = pl.pallas_call(
        functools.partial(_nms_block_kernel,
                          overlap_threshold=overlap_threshold,
                          num_valid=k),
        grid=(n_pad // bn,),
        in_specs=[pl.BlockSpec((bn, 4, k_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, k_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, k_pad, k_pad), jnp.float32)],
    )(boxes_t)

    return (keep[:n, :k] > 0.5) & (scores > -jnp.inf)


def available() -> bool:
    """Pallas TPU path available on this backend?"""
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False
