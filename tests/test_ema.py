"""EMA weights (train.ema, beyond-parity): shadow params updated in-step,
read by eval/serving, checkpoint-compatible in both directions."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.ops import losses, matching, sampling
from single_shot_detection_tpu.ops.box_coder import BoxCoder
from single_shot_detection_tpu.train import (create_train_state,
                                             make_train_step, optimizers)

IMG = 96
NUM_CLASSES = 4


@pytest.fixture(scope='module')
def setup():
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
        {'name': 'SGD', 'lr': 1e-2, 'momentum': 0.9})
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=2)
    return bundle, anchors, criterion, assigner, tx, variables


def _batch(rng):
    boxes = np.zeros((2, 4, 6), np.float32)
    mask = np.zeros((2, 4), bool)
    boxes[:, 0] = [20, 20, 60, 60, 1, 1.0]
    mask[:, 0] = True
    return {'image': jnp.asarray(rng.rand(2, IMG, IMG, 3).astype(np.float32)),
            'boxes': jnp.asarray(boxes), 'box_mask': jnp.asarray(mask)}


def test_ema_matches_manual_recurrence(setup):
    bundle, anchors, criterion, assigner, tx, variables = setup
    decay = 0.9
    state = create_train_state(variables, tx, ema=True)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False, ema=decay)
    rng = np.random.RandomState(0)

    flat = lambda t: np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(t)])
    expected = flat(state.params)
    for t in range(3):
        state, _ = step(state, _batch(rng), jax.random.PRNGKey(t))
        d = min(decay, (1.0 + (t + 1)) / (10.0 + (t + 1)))  # warmup ramp
        expected = expected + (1.0 - d) * (flat(state.params) - expected)
    np.testing.assert_allclose(flat(state.ema_params), expected,
                               rtol=2e-5, atol=1e-6)
    # the shadow trails the live params
    assert not np.allclose(flat(state.ema_params), flat(state.params))


def test_ema_disabled_keeps_empty_shadow(setup):
    bundle, anchors, criterion, assigner, tx, variables = setup
    state = create_train_state(variables, tx)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False)
    state, _ = step(state, _batch(np.random.RandomState(0)),
                    jax.random.PRNGKey(0))
    assert state.ema_params == {}


def test_checkpoint_roundtrip_both_directions(setup, tmp_path):
    from single_shot_detection_tpu.train import checkpoint as ckpt
    bundle, anchors, criterion, assigner, tx, variables = setup

    # old-style checkpoint (no EMA) -> EMA-enabled run: shadow seeds from
    # the checkpoint's own params
    old = create_train_state(variables, tx)
    old = old.replace(params=jax.tree_util.tree_map(lambda p: p + 1.0,
                                                    old.params))
    path = ckpt.save(str(tmp_path / 'a'), old, epoch=1)
    template = create_train_state(variables, tx, ema=True)
    restored, _ = ckpt.restore(path, template)
    a = jax.tree_util.tree_leaves(restored.ema_params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # EMA checkpoint -> EMA-disabled run: shadow dropped cleanly
    ema_state = create_train_state(variables, tx, ema=True)
    path2 = ckpt.save(str(tmp_path / 'b'), ema_state, epoch=1)
    restored2, _ = ckpt.restore(path2, create_train_state(variables, tx))
    assert restored2.ema_params == {}


def test_restore_weights_only_carries_ema(setup, tmp_path):
    """--load-weights / detector.weight into an EMA-enabled run must NOT
    leave the template's random-init shadow in place (eval/export would
    silently read untrained weights)."""
    from single_shot_detection_tpu.train import checkpoint as ckpt
    bundle, anchors, criterion, assigner, tx, variables = setup

    # checkpoint WITH a trained-looking EMA shadow (params+2 so shadow,
    # params and the template random-init all differ)
    src = create_train_state(variables, tx, ema=True)
    src = src.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, src.params),
        ema_params=jax.tree_util.tree_map(lambda p: p + 2.0, src.params))
    path = ckpt.save(str(tmp_path / 'w'), src, epoch=0)
    template = create_train_state(variables, tx, ema=True)
    loaded = ckpt.restore_weights_only(path, template)
    for got, want in zip(jax.tree_util.tree_leaves(loaded.ema_params),
                         jax.tree_util.tree_leaves(src.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # pre-EMA checkpoint into an EMA run: shadow seeded from ITS params,
    # not from the template's random init
    old = create_train_state(variables, tx)
    old = old.replace(params=jax.tree_util.tree_map(lambda p: p + 3.0,
                                                    old.params))
    path2 = ckpt.save(str(tmp_path / 'w2'), old, epoch=0)
    loaded2 = ckpt.restore_weights_only(
        path2, create_train_state(variables, tx, ema=True))
    for got, want in zip(jax.tree_util.tree_leaves(loaded2.ema_params),
                         jax.tree_util.tree_leaves(old.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_engine_ema_eval_uses_shadow(tmp_path):
    import os
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['ema'] = {'decay': 0.99}
    cfg.config.train['epochs'] = 1
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True)
    exp.train()
    assert exp.ema_decay == 0.99
    assert exp.state.ema_params, 'shadow params missing'
    leaves_p = jax.tree_util.tree_leaves(exp.state.params)
    leaves_e = jax.tree_util.tree_leaves(exp.state.ema_params)
    assert any(not np.allclose(np.asarray(p), np.asarray(e))
               for p, e in zip(leaves_p, leaves_e))
    metrics = exp.evaluate()
    assert np.isfinite(metrics['loss'])
