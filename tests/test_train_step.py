import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.ops import losses, matching, sampling
from single_shot_detection_tpu.ops.box_coder import BoxCoder
from single_shot_detection_tpu.ops.postprocess import Postprocessor
from single_shot_detection_tpu.train import (create_train_state,
                                             make_eval_step, make_train_step,
                                             optimizers)
from single_shot_detection_tpu.train.step import apply_mixup


IMG = 96
NUM_CLASSES = 4


@pytest.fixture(scope='module')
def tiny_setup():
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 2},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (13, 18)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    sampler = functools.partial(sampling.hard_negative_mining,
                                negative_per_positive_ratio=3,
                                min_negative_per_image=5)
    criterion = losses.MultiboxLoss(sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5, 0.5)
    tx = optimizers.create_optimizer(
        {'name': 'SGD', 'lr': 1e-3, 'momentum': 0.9})
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(variables, tx)
    return bundle, anchors, coder, criterion, assigner, tx, state


def make_batch(rng, batch=2, g=4):
    images = rng.rand(batch, IMG, IMG, 3).astype(np.float32)
    boxes = np.zeros((batch, g, 6), np.float32)
    mask = np.zeros((batch, g), bool)
    for b in range(batch):
        for i in range(2):
            cx, cy = rng.rand(2) * 60 + 18
            w, h = rng.rand(2) * 30 + 12
            boxes[b, i] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                           rng.randint(1, NUM_CLASSES), 1.0]
            mask[b, i] = True
    return {'image': jnp.asarray(images), 'boxes': jnp.asarray(boxes),
            'box_mask': jnp.asarray(mask)}


def test_train_step_loss_decreases(tiny_setup, rng):
    bundle, anchors, coder, criterion, assigner, tx, state = tiny_setup
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)
    first = None
    last = None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        if first is None:
            first = float(metrics['loss'])
        last = float(metrics['loss'])
    assert np.isfinite(last)
    assert last < first, f'{last} !< {first}'
    assert int(state.step) == 12


def test_frozen_bn_train_step(tiny_setup, rng):
    """frozen_bn: running stats are normalization inputs and never update;
    params (incl. BN scale/bias) still train; loss still decreases."""
    bundle, anchors, coder, criterion, assigner, tx, state = tiny_setup
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False, frozen_bn=True)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)
    stats_before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    params_before = jax.tree_util.tree_map(np.asarray, state.params)

    first = last = None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        if first is None:
            first = float(metrics['loss'])
        last = float(metrics['loss'])
    assert np.isfinite(last) and last < first

    # batch statistics are bit-identical (never updated)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        stats_before, state.batch_stats)
    # parameters moved — including a BN scale somewhere in the tree
    leaves_before = jax.tree_util.tree_leaves_with_path(params_before)
    after = state.params
    moved_bn = moved_any = False
    for path, arr in leaves_before:
        node = after
        for k in path:
            node = node[k.key]
        if not np.array_equal(arr, np.asarray(node)):
            moved_any = True
            if any(getattr(k, 'key', '') == 'scale' for k in path):
                moved_bn = True
    assert moved_any and moved_bn


def test_eval_step_outputs(tiny_setup, rng):
    bundle, anchors, coder, criterion, assigner, tx, state = tiny_setup
    pp = Postprocessor(coder, score_threshold=0.01, max_total=20,
                       nms={'max_per_class': 10, 'overlap_threshold': 0.45})
    eval_step = make_eval_step(bundle.module, criterion, assigner, anchors, pp)
    batch = make_batch(rng)
    metrics, dets, valid = eval_step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert dets.shape == (2, 20, 6)
    assert valid.shape == (2, 20)


def test_mixup_semantics(rng):
    images = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
    boxes = jnp.asarray(rng.rand(4, 3, 6).astype(np.float32))
    boxes = boxes.at[..., 5].set(1.0)
    mask = jnp.ones((4, 3), bool)
    out_img, out_boxes, out_mask = apply_mixup(
        jax.random.PRNGKey(0), images, boxes, mask, alpha=0.5, p=1.0)
    assert out_img.shape == images.shape
    assert out_boxes.shape == (4, 6, 6)
    assert out_mask.shape == (4, 6)
    # scores of own+partner rows sum to ~1 per slot when both valid
    s = np.asarray(out_boxes[..., 5])
    np.testing.assert_allclose(s[:, :3] + s[:, 3:], 1.0, rtol=1e-5)
    # with p=0 nothing changes
    same_img, same_boxes, same_mask = apply_mixup(
        jax.random.PRNGKey(0), images, boxes, mask, alpha=0.5, p=0.0)
    np.testing.assert_allclose(np.asarray(same_img), np.asarray(images))
    assert not np.asarray(same_mask)[:, 3:].any()


def test_train_step_with_mixup_runs(tiny_setup, rng):
    bundle, anchors, coder, criterion, assigner, tx, state = tiny_setup
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           mixup={'alpha': 0.5, 'p': 0.5}, donate=False)
    batch = make_batch(rng)
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['loss']))
