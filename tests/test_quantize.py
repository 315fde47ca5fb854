"""Int8 post-training quantization (export/quantize.py).

The TPU-native analog of the reference's OpenVINO deployment path
(bf/utils/mo_exporter.py): calibrated symmetric int8 convs on the MXU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from single_shot_detection_tpu.export import quantize
from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.ops.postprocess import Postprocessor


class Mixed(nn.Module):
    """Dense conv + depthwise + bias + stride — every code path at once."""

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
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v, x


def test_calibrate_records_only_supported_convs(mixed):
    m, v, x = mixed
    amax = quantize.calibrate(m, v, [x])
    assert set(amax) == {'stem', 'pw'}  # depthwise excluded
    assert all(val > 0 for val in amax.values())


def test_quantized_apply_close_to_float(mixed):
    m, v, x = mixed
    amax = quantize.calibrate(m, v, [x])
    ref = m.apply(v, x)
    out = jax.jit(quantize.quantized_apply(m, amax))(v, x)
    assert out.shape == ref.shape
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.05, rel


def test_uncalibrated_convs_fall_back_to_float(mixed):
    m, v, x = mixed
    # empty calibration: the quantized apply must be the float model exactly
    out = quantize.quantized_apply(m, {})(v, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(m.apply(v, x)))


def test_weight_quantization_per_channel():
    """Channels with very different magnitudes must each keep precision."""
    class One(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(2, (1, 1), use_bias=False, name='c')(x)

    m = One()
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # channel 0 tiny, channel 1 large: per-tensor scales would crush ch 0
    kernel = jnp.array([[[[1e-3, 0.0], [2e-3, 0.0], [-1e-3, 0.0]]]])
    kernel = kernel.at[..., 1].set(jnp.array([100.0, -50.0, 25.0]))
    v = {'params': {'c': {'kernel': kernel}}}
    ref = m.apply(v, x)
    out = quantize.quantized_apply(m, quantize.calibrate(m, v, [x]))(v, x)
    rel = np.abs(np.asarray(out) - np.asarray(ref)) / np.abs(np.asarray(ref))
    assert rel.max() < 0.02, rel.max()


def test_quantized_detector_end_to_end():
    """Full zoo detector: quantized predict agrees with float predict on
    which objects it sees (scores shift slightly, geometry stays)."""
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9,
                          'aspect_ratios': [[1.0, 2.0]] * 2},
        num_classes=4,
        features={'name': 'Features', 'out_layers': (13, 18)},
        input_size=(96, 96))
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=1)
    rng = np.random.RandomState(23)
    images = jnp.asarray(rng.rand(2, 96, 96, 3).astype(np.float32))

    ref_scores, ref_locs = bundle.module.apply(variables, images, train=False)
    amax = quantize.calibrate(bundle.module, variables, [images])
    assert len(amax) >= 10  # the MBv2 pointwise/expand convs all calibrate
    q_scores, q_locs = quantize.quantized_apply(bundle.module, amax)(
        variables, images, train=False)

    # raw heads stay close in float terms
    s_err = float(jnp.max(jnp.abs(q_scores - ref_scores)))
    l_err = float(jnp.max(jnp.abs(q_locs - ref_locs)))
    assert s_err < 0.5 * float(jnp.max(jnp.abs(ref_scores)) + 1.0)
    assert l_err < 0.5 * float(jnp.max(jnp.abs(ref_locs)) + 1.0)

    # and the serving step runs end to end with finite outputs
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    post = Postprocessor(BoxCoder(10.0, 5.0), score_threshold=0.01,
                         nms={'overlap_threshold': 0.5, 'max_per_class': 10},
                         max_total=20)
    predict = quantize.make_quantized_predict_step(
        bundle.module, post, bundle.anchors(), amax)
    dets, valid = predict(variables, images)
    assert np.isfinite(np.asarray(dets)).all()
    assert dets.shape[0] == 2


def test_int8_eval_keeps_map_on_trained_checkpoint():
    """``--int8`` end to end through the engine: the committed trained
    checkpoint (150-epoch synthetic, f32 mAP 0.671) must keep its mAP
    through the quantized eval path (PTQ's whole value proposition)."""
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    exp_dir = os.path.join(os.path.dirname(__file__), '..', 'experiments',
                           '2026-08-16-225820')
    if not os.path.isdir(exp_dir):
        pytest.skip('learning-evidence experiment not present')
    cfg = load_config(os.path.join(exp_dir, 'config.py'))
    # explicit int8 block = opt-in past the serving gate (mobilenet at
    # small batch is a measured int8 regression point; this test is about
    # ACCURACY, not speed)
    cfg.config.int8 = {}
    exp = Experiment(cfg, phases=['eval'], debug=True, resume_from=exp_dir,
                     int8=True)
    metrics = exp.evaluate()
    assert exp._int8_amax, 'calibration did not run'
    # float mAP is 0.671; int8 PTQ must stay in the same regime
    assert metrics['mAP'] > 0.55, metrics


def test_int8_recalibrates_when_training_advances():
    """Activation amax calibrated at step N must be invalidated once
    training moves past N — stale early-epoch scales silently clip later
    activations (engine._ensure_int8 staleness guard)."""
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['epochs'] = 1
    cfg.config.int8 = {}  # opt-in past the mobilenet/small-batch gate
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True, int8=True)

    exp._ensure_int8()
    amax0 = dict(exp._int8_amax)
    step0 = exp._int8_calib_step
    # same weights -> cached (the dict object is reused, not rebuilt)
    exp._ensure_int8()
    assert exp._int8_amax is not None and exp._int8_calib_step == step0

    exp.train()
    assert int(jax.device_get(exp.state.step)) > step0
    exp._ensure_int8()
    assert exp._int8_calib_step == int(jax.device_get(exp.state.step))
    assert exp._int8_calib_step != step0
    # the scales were actually recomputed from the trained weights
    assert set(amax0) == set(exp._int8_amax)


def test_int8_without_dataset_is_a_clear_error():
    """--phases export --int8 has no loaders; calibration must raise a
    clear ValueError, not a bare StopIteration."""
    from single_shot_detection_tpu import export as export_mod

    class _NoLoaders:
        loaders = {}

    with pytest.raises(ValueError, match='int8 calibration'):
        export_mod._calibration_images(_NoLoaders())


def test_int8_serving_gate_mb2_small_batch():
    """The measured-regression gate: --int8 on a mobilenet config below
    batch 128 (-42% at b32, docs/SERVING.md) is refused with a warning
    and eval falls back to float; an explicit ``int8 = {}`` block forces
    it through."""
    from single_shot_detection_tpu.export.quantize import resolve_int8_opts
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)  # mobilenet_v2, batch 8
    enabled, _ = resolve_int8_opts(cfg.config)
    assert not enabled

    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['eval'], debug=True, int8=True)
    exp._ensure_int8()
    assert exp.int8 is False and exp._int8_amax is None

    cfg2 = load_config(smoke)
    cfg2.config.int8 = {}  # explicit block = opt-in
    enabled2, _ = resolve_int8_opts(cfg2.config)
    assert enabled2


def test_int8_preset_auto_spatial_limit_on_512_inputs():
    """512-input configs get spatial_limit=256 auto-chosen (full int8
    re-tiles the stem activations, -21% measured); a config-pinned value
    wins."""
    from single_shot_detection_tpu.export.quantize import resolve_int8_opts
    from single_shot_detection_tpu.utils.config import load_config

    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)
    cfg.config.model = dict(cfg.config.model)
    cfg.config.model['base'] = {'name': 'torchvision_vgg16_bn'}
    cfg.config.input_size = (512, 512)
    enabled, opts = resolve_int8_opts(cfg.config)
    assert enabled and opts['spatial_limit'] == 256

    cfg.config.int8 = {'spatial_limit': 128}
    enabled, opts = resolve_int8_opts(cfg.config)
    assert enabled and opts['spatial_limit'] == 128


def test_serving_postprocessor_presets_top_k():
    """Anchor-heavy configs get pre_nms_top_k=1000 on the serving paths
    (predict/test/export) while eval keeps the config-exact
    postprocessor; a config that pins the key is respected."""
    import numpy as np
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['eval'], debug=True)
    # smoke has few anchors: preset must NOT kick in
    assert exp.serving_postprocessor() is exp.postprocessor

    # anchor-heavy: preset kicks in (anchors only read for their count)
    exp.anchors = np.zeros((20000, 4), np.float32)
    pp = exp.serving_postprocessor()
    assert pp is not exp.postprocessor
    assert pp.pre_nms_top_k == 1000
    assert exp.postprocessor.pre_nms_top_k is None  # eval path untouched

    # pinned key (even explicitly None) disables the preset
    cfg2 = load_config(smoke)
    cfg2.config.train = dict(cfg2.config.train)
    cfg2.config.train['epochs'] = 0
    cfg2.config.postprocess = dict(cfg2.config.postprocess)
    cfg2.config.postprocess['pre_nms_top_k'] = None
    exp2 = Experiment(cfg2, phases=['eval'], debug=True)
    exp2.anchors = np.zeros((20000, 4), np.float32)
    assert exp2.serving_postprocessor() is exp2.postprocessor


def test_qat_run_overrides_int8_gate():
    """A train.qat config trained FOR int8 serving: the regression gate
    must not refuse --int8 there (it would silently discard the learned
    scales and serve float) — pinned after a round-4 regression."""
    from single_shot_detection_tpu.export.quantize import resolve_int8_opts
    from single_shot_detection_tpu.utils.config import load_config
    smoke = os.path.join(os.path.dirname(__file__), '..', 'samples',
                         'synthetic_smoke.py')
    cfg = load_config(smoke)  # mobilenet at batch 8 = gated point
    assert not resolve_int8_opts(cfg)[0]
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['qat'] = True
    assert resolve_int8_opts(cfg)[0]
