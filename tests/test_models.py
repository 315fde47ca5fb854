import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.models import builder


SSD_MB2_VOC_MODEL = {
    'base': {'name': 'torchvision_mobilenet_v2', 'pretrained': True},
    'num_classes': 21,
    'use_depthwise': True,
    'features': {'name': 'Features', 'out_layers': (13, 18)},
    'extras': {'layers': (('s', 512), ('s', 256), ('s', 256), ('s', 128))},
    'anchor_generator': {
        'type': 'ssd', 'num_scales': 6, 'min_scale': 0.1, 'max_scale': 1.05,
        'aspect_ratios': [[1.0, 2.0]] + [[1.0, 2.0, 3.0]] * 3 + [[1.0, 2.0]] * 2,
    },
}


@pytest.fixture(scope='module')
def ssd_mb2_bundle():
    return builder.build(base=SSD_MB2_VOC_MODEL['base'],
                         anchor_generator=SSD_MB2_VOC_MODEL['anchor_generator'],
                         num_classes=21,
                         features=SSD_MB2_VOC_MODEL['features'],
                         use_depthwise=True,
                         extras=SSD_MB2_VOC_MODEL['extras'],
                         input_size=(300, 300))


def test_feature_map_sizes_golden(ssd_mb2_bundle):
    # 300 input with TF-asymmetric stride-2 padding (verified against the
    # reference torch geometry): stage13 -> 18, stage18 -> 9, extras -> 5,3,2,1
    fms = ssd_mb2_bundle.feature_map_sizes((300, 300))
    assert fms == [(18, 18), (9, 9), (5, 5), (3, 3), (2, 2), (1, 1)]


def test_anchor_count_golden(ssd_mb2_bundle):
    anchors = ssd_mb2_bundle.anchors((300, 300))
    # 18^2*4 + 9^2*6 + 5^2*6 + 3^2*6 + 2^2*4 + 1*4
    assert anchors.shape == (2006, 4)


def test_forward_shapes_and_finiteness(ssd_mb2_bundle):
    variables = ssd_mb2_bundle.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 300, 300, 3), jnp.float32)
    scores, locs = ssd_mb2_bundle.module.apply(variables, x, train=False)
    assert scores.shape == (2, 2006, 21)
    assert locs.shape == (2, 2006, 4)
    assert np.isfinite(np.asarray(scores)).all()
    assert np.isfinite(np.asarray(locs)).all()


def test_train_mode_updates_batch_stats(ssd_mb2_bundle):
    variables = ssd_mb2_bundle.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 300, 3))
    (scores, locs), mutated = ssd_mb2_bundle.module.apply(
        variables, x, train=True, mutable=['batch_stats'])
    assert 'batch_stats' in mutated
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_mobilenet_v2_stage_channels():
    from single_shot_detection_tpu.models.mobilenet_v2 import MobileNetV2
    m = MobileNetV2()
    out, _ = jax.eval_shape(
        lambda: m.init_with_output(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 224, 224, 3))))
    stages, aux = out
    assert len(stages) == 19
    channels = [s.shape[-1] for s in stages]
    assert channels == [32, 16, 24, 24, 32, 32, 32, 64, 64, 64, 64,
                        96, 96, 96, 160, 160, 160, 320, 1280]
    # spatial strides at taps: stage13 16x, stage18 32x
    assert stages[13].shape[1] == 14 and stages[18].shape[1] == 7  # 224 input
    # inner expand_relu tap exists for stage 13
    assert (13, 'expand_relu') in aux


def test_inner_tap_out_layers():
    from single_shot_detection_tpu.models import builder as b
    bundle = b.build(base={'name': 'mobilenet_v2'},
                     anchor_generator={
                         'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                         'max_scale': 0.9,
                         'aspect_ratios': [[1.0, 2.0]] * 3},
                     num_classes=5,
                     features={'name': 'Features',
                               'out_layers': ((13, 'expand_relu'), 18)},
                     extras={'layers': (('s', 128),)},
                     input_size=(160, 160))
    fms = bundle.feature_map_sizes((160, 160))
    assert fms[0] == (10, 10)  # expand_relu of stage 13 is pre-stride, 160/16
    variables = bundle.init(jax.random.PRNGKey(0))
    scores, locs = bundle.module.apply(
        variables, jnp.ones((1, 160, 160, 3)), train=False)
    assert scores.shape[1] == bundle.anchors((160, 160)).shape[0]


def test_config_initializers_honored():
    """Reference-style ``initializer`` config dicts reach the right convs
    (parity: features.py:24-38, detector_builder.py:61,100-123,
    predictors.py:19,51-55) and the predictor towers default to
    normal(std=0.01) like the reference's SharedConvPredictor."""
    from single_shot_detection_tpu.models import builder as b

    bundle = b.build(
        base={'name': 'mobilenet_025'},
        anchor_generator={'type': 'retina_net', 'min_level': 3,
                          'max_level': 6, 'aspect_ratios': [1.0, 2.0],
                          'scale': 4.0, 'scales_per_level': 2},
        num_classes=5,
        features={'name': 'FeaturePyramid', 'out_layers': (5, 11, 13),
                  'pyramid_layers': 4, 'pyramid_channels': 64,
                  'initializer': {'name': 'normal_',
                                  'args': {'mean': 0, 'std': 0.03}}},
        predictor={'num_layers': 2, 'num_channels': 64,
                   'initializer': {'name': 'normal_',
                                   'args': {'mean': 0, 'std': 0.005}}},
        heads={'initializer': {'name': 'normal_',
                               'args': {'mean': 0, 'std': 0.002}},
               'score_head_bias_init': -4.6},
        input_size=(64, 64))
    variables = bundle.init(jax.random.PRNGKey(3))
    params = variables['params']

    def std_of(path_params):
        return float(np.std(np.asarray(path_params['kernel'])))

    # FPN laterals + output convs: configured std 0.03 (vs glorot default)
    feats = params['features']
    assert abs(std_of(feats['lateral0']) - 0.03) < 0.01
    assert abs(std_of(feats['output0']['conv']) - 0.03) < 0.005
    # predictor towers: configured std 0.005
    pred = params['predictor']
    assert abs(std_of(pred['score_conv0']['conv']) - 0.005) < 0.001
    assert abs(std_of(pred['loc_conv1']['conv']) - 0.005) < 0.001
    # heads: configured std 0.002, score bias -4.6
    assert abs(std_of(params['score_head0']) - 0.002) < 0.0005
    assert abs(std_of(params['loc_head1']) - 0.002) < 0.0005
    assert np.allclose(np.asarray(params['score_head0']['bias']), -4.6)


def test_predictor_tower_default_init_is_normal_001():
    """Without a config initializer the shared towers come out ~N(0, 0.01)
    — the reference's default (predictors.py:19) — not flax lecun_normal."""
    from single_shot_detection_tpu.models.detector import SharedConvPredictor
    m = SharedConvPredictor(num_layers=1, num_channels=32)
    variables = m.init(jax.random.PRNGKey(0),
                       [jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 16))])
    k = np.asarray(variables['params']['score_conv0']['conv']['kernel'])
    assert abs(float(np.std(k)) - 0.01) < 0.002
    # lecun_normal on 3x3x16 fan-in would be ~0.083 — far outside the band


def test_extras_config_initializer():
    """extras ``initializer`` reaches the extra-scale convs
    (xavier_uniform_ here: bounded support distinguishes it from the
    default xavier_normal)."""
    from single_shot_detection_tpu.models import builder as b
    bundle = b.build(
        base={'name': 'mobilenet_025'},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 3},
        num_classes=5,
        features={'name': 'Features', 'out_layers': (11, 13)},
        extras={'layers': (('s', 64),),
                'initializer': {'name': 'xavier_uniform_'}},
        input_size=(64, 64))
    variables = bundle.init(jax.random.PRNGKey(1))
    k = np.asarray(
        variables['params']['extra0']['expand']['conv']['kernel'])
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    fan_out = k.shape[0] * k.shape[1] * k.shape[3]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    assert np.abs(k).max() <= limit + 1e-6      # uniform support bound
    assert np.abs(k).max() > 0.9 * limit        # ...and actually fills it


def test_unsupported_initializer_raises():
    from single_shot_detection_tpu.models.layers import get_initializer
    import pytest as _pytest
    with _pytest.raises(ValueError, match='Unsupported initializer'):
        get_initializer({'name': 'orthogonal_'})
    with _pytest.raises(ValueError, match='mean=0'):
        get_initializer({'name': 'normal_', 'args': {'mean': 1, 'std': 1}})
