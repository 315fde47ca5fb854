"""Pallas NMS kernel vs the jnp reference implementation (interpret mode on
CPU; the real kernel runs on TPU via benchmarks/nms_bench.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from single_shot_detection_tpu.ops import nms as nms_ops
from single_shot_detection_tpu.ops import nms_pallas


def _interpret_keep(boxes, scores, threshold, bn=4):
    """Run the kernel in interpreter mode (CPU-safe)."""
    n, k, _ = boxes.shape
    k_pad = max(128, ((k + 127) // 128) * 128)
    n_pad = ((n + bn - 1) // bn) * bn
    boxes_t = jnp.moveaxis(boxes, 2, 1)
    boxes_t = jnp.pad(boxes_t, ((0, n_pad - n), (0, 0), (0, k_pad - k)))
    keep = pl.pallas_call(
        functools.partial(nms_pallas._nms_block_kernel,
                          overlap_threshold=threshold, num_valid=k),
        grid=(n_pad // bn,),
        in_specs=[pl.BlockSpec((bn, 4, k_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, k_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, k_pad, k_pad), jnp.float32)],
        interpret=True,
    )(boxes_t)
    return (keep[:n, :k] > 0.5) & (np.asarray(scores) > -np.inf)


def sorted_problem(rng, n, k):
    boxes = rng.rand(n, k, 4).astype(np.float32) * 100
    boxes[..., 2:] = boxes[..., :2] + rng.rand(n, k, 2).astype(np.float32) * 40 + 1
    scores = -np.sort(-rng.rand(n, k).astype(np.float32), axis=1)
    return boxes, scores


def test_kernel_matches_jnp_reference(rng):
    boxes, scores = sorted_problem(rng, 6, 50)
    got = np.asarray(_interpret_keep(jnp.asarray(boxes), scores, 0.5))
    for i in range(6):
        expected = np.asarray(nms_ops.nms_mask(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5))
        np.testing.assert_array_equal(got[i], expected, err_msg=f'problem {i}')


def test_kernel_handles_invalid_rows(rng):
    boxes, scores = sorted_problem(rng, 2, 30)
    scores[:, 20:] = -np.inf
    boxes[:, 20:] = 0.0  # degenerate padded boxes
    got = np.asarray(_interpret_keep(jnp.asarray(boxes), scores, 0.5))
    assert not got[:, 20:].any()
    for i in range(2):
        expected = np.asarray(nms_ops.nms_mask(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5))
        np.testing.assert_array_equal(got[i], expected)


def test_kernel_identical_boxes(rng):
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (1, 8, 1))
    scores = -np.sort(-rng.rand(1, 8).astype(np.float32), axis=1)
    got = np.asarray(_interpret_keep(jnp.asarray(boxes), scores, 0.5))
    assert got.sum() == 1 and got[0, 0]
