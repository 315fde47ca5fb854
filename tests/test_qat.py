"""Quantization-aware training (export/quantize.py QAT section,
train.qat): fake-quant forward with STE gradients and EMA activation
scales living in batch_stats, handing off directly to int8 serving."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from single_shot_detection_tpu.export import quantize


class Mixed(nn.Module):
    """Dense conv + depthwise + pointwise — quantized and skipped paths."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=True, name='stem')(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=16, name='dw')(x)
        x = nn.Conv(8, (1, 1), name='pw')(x)
        return x


@pytest.fixture(scope='module')
def mixed():
    m = Mixed()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    v = quantize.qat_init(m, m.init, jax.random.PRNGKey(0), x)
    return m, v, x


def test_ste_gradient_is_identity():
    g = jax.grad(lambda x: quantize._fake_quant(x, 0.1).sum())(
        jnp.linspace(-1.0, 1.0, 11))
    np.testing.assert_array_equal(np.asarray(g), np.ones(11))


def test_qat_init_creates_act_amax_for_supported_convs_only(mixed):
    m, v, x = mixed
    bs = v['batch_stats']
    assert set(bs.keys()) == {'stem', 'pw'}  # depthwise skipped
    assert float(bs['stem']['act_amax']) == 0.0


def test_qat_train_updates_scales_eval_reads_only(mixed):
    m, v, x = mixed
    apply = quantize.qat_apply(m)
    (y, mut) = apply(v, x, train=True, mutable=['batch_stats'])
    amax = float(mut['batch_stats']['stem']['act_amax'])
    assert amax == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)
    # second batch: EMA, not overwrite
    (y2, mut2) = apply({'params': v['params'],
                        'batch_stats': mut['batch_stats']},
                       x * 2.0, train=True, mutable=['batch_stats'])
    amax2 = float(mut2['batch_stats']['stem']['act_amax'])
    expect = quantize.QAT_DECAY * amax + (1 - quantize.QAT_DECAY) * 2 * amax
    assert amax2 == pytest.approx(expect, rel=1e-5)
    # eval: read-only (no mutable) must not raise and must fake-quant
    y_eval = apply({'params': v['params'],
                    'batch_stats': mut['batch_stats']}, x, train=False)
    assert np.isfinite(np.asarray(y_eval)).all()


def test_qat_bypasses_until_calibrated(mixed):
    """amax == 0 (fresh init) must run the float path bit-for-bit."""
    m, v, x = mixed
    y_qat = quantize.qat_apply(m)(v, x, train=False)
    y_float = m.apply(v, x, train=False)
    # weights are still fake-quantized, so allow weight-rounding noise only
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_float),
                               rtol=0.05, atol=0.05)


def test_qat_noise_matches_int8_serving_path(mixed):
    """The conv is linear, so fake-quant(x) * fake-quant(w) in float must
    equal the int8 path's (x_q * w_q) * scales up to float rounding — the
    QAT noise IS the serving noise."""
    m, v, x = mixed
    apply = quantize.qat_apply(m)
    _, mut = apply(v, x, train=True, mutable=['batch_stats'])
    variables = {'params': v['params'], 'batch_stats': mut['batch_stats']}
    y_qat = apply(variables, x, train=False)

    amax = quantize.amax_from_batch_stats(mut['batch_stats'])
    y_int8 = quantize.quantized_apply(m, amax)(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_int8),
                               rtol=1e-4, atol=1e-4)


def test_amax_extraction_keys_match_calibration_keys(mixed):
    m, v, x = mixed
    apply = quantize.qat_apply(m)
    _, mut = apply(v, x, train=True, mutable=['batch_stats'])
    learned = quantize.amax_from_batch_stats(mut['batch_stats'])
    calibrated = quantize.calibrate(m, v, [x])
    assert set(learned) == set(calibrated)


def test_gradients_flow_through_fake_quant(mixed):
    m, v, x = mixed
    apply = quantize.qat_apply(m)
    _, mut = apply(v, x, train=True, mutable=['batch_stats'])

    def loss(params):
        y, _ = apply({'params': params,
                      'batch_stats': mut['batch_stats']},
                     x, train=True, mutable=['batch_stats'])
        return (y ** 2).mean()

    grads = jax.grad(loss)(v['params'])
    for path, g in [('stem', grads['stem']['kernel']),
                    ('pw', grads['pw']['kernel'])]:
        assert float(jnp.abs(g).max()) > 0, f'no gradient through {path}'


def test_engine_qat_end_to_end(tmp_path):
    """train.qat through the Experiment: scales learn during training,
    eval runs the fake-quant forward, --int8 harvests the learned scales
    without calibration."""
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['qat'] = {'decay': 0.9}
    cfg.config.train['epochs'] = 1
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True, int8=True)
    exp.train()
    learned = quantize.amax_from_batch_stats(exp.state.batch_stats)
    assert learned, 'no act_amax learned during training'
    metrics = exp.evaluate()
    assert np.isfinite(metrics['loss'])
    # --int8 must have harvested the QAT scales, not recalibrated
    assert exp._int8_amax == learned


def test_checkpoint_roundtrip_both_directions(tmp_path):
    """Float checkpoint -> QAT run (zeros seed the EMA) and QAT checkpoint
    -> float run (act_amax dropped)."""
    from single_shot_detection_tpu.train import checkpoint as ckpt
    from single_shot_detection_tpu.train import (create_train_state,
                                                 optimizers)

    m = Mixed()
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    v_float = m.init(jax.random.PRNGKey(0), x)
    v_qat = quantize.qat_init(m, m.init, jax.random.PRNGKey(0), x)

    # float -> QAT
    s_float = create_train_state(v_float, tx)
    path = ckpt.save(str(tmp_path / 'f'), s_float, epoch=0)
    restored, _ = ckpt.restore(path, create_train_state(v_qat, tx))
    assert float(restored.batch_stats['stem']['act_amax']) == 0.0

    # QAT (with learned scales) -> float
    apply = quantize.qat_apply(m)
    _, mut = apply(v_qat, x, train=True, mutable=['batch_stats'])
    s_qat = create_train_state(
        {'params': v_qat['params'], 'batch_stats': mut['batch_stats']}, tx)
    path2 = ckpt.save(str(tmp_path / 'q'), s_qat, epoch=0)
    restored2, _ = ckpt.restore(path2, create_train_state(v_float, tx))
    assert 'stem' not in restored2.batch_stats


def test_qat_with_frozen_bn_still_updates_scales():
    """frozen_bn + qat: the step runs train=False but the act_amax EMA
    must still update (train/step.py frozen+qat branch)."""
    import functools

    from single_shot_detection_tpu.models import builder
    from single_shot_detection_tpu.ops import losses, matching, sampling
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step, optimizers)

    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 2},
        num_classes=3,
        features={'name': 'Features', 'out_layers': (13, 18)},
        input_size=(96, 96))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    sampler = functools.partial(sampling.hard_negative_mining,
                                negative_per_positive_ratio=3,
                                min_negative_per_image=5)
    criterion = losses.MultiboxLoss(sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5, 0.5)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    variables = quantize.qat_init(bundle.module, bundle.init,
                                  jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(variables, tx)
    apply_fn = quantize.qat_apply(bundle.module)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False, frozen_bn=True,
                           apply_fn=apply_fn, qat=True)
    boxes = np.zeros((2, 4, 6), np.float32)
    mask = np.zeros((2, 4), bool)
    boxes[:, 0] = [20, 20, 60, 60, 1, 1.0]
    mask[:, 0] = True
    batch = {'image': jnp.asarray(
                 np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32)),
             'boxes': jnp.asarray(boxes), 'box_mask': jnp.asarray(mask)}
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    learned = quantize.amax_from_batch_stats(state2.batch_stats)
    assert learned, 'act_amax did not update under frozen_bn + qat'
    # frozen BN: running stats untouched
    def bn_leaves(bs):
        return [np.asarray(x) for p, x in
                sorted(jax.tree_util.tree_flatten_with_path(bs)[0],
                       key=lambda t: str(t[0]))
                if 'act_amax' not in str(p)]
    for a, b in zip(bn_leaves(jax.device_get(state.batch_stats)),
                    bn_leaves(jax.device_get(state2.batch_stats))):
        np.testing.assert_array_equal(a, b)
    assert np.isfinite(float(metrics['loss']))
