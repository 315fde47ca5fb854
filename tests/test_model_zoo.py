"""Golden geometry tests for every canonical model family (BASELINE.md
parity set), using shape-only evaluation — no FLOPs."""

import jax
import jax.numpy as jnp
import pytest

from single_shot_detection_tpu.models import builder


def geometry(bundle, img_size):
    return bundle.feature_map_sizes(img_size)


def test_ssd300_vgg16_geometry():
    bundle = builder.build(
        base={'name': 'torchvision_vgg16_bn'},
        anchor_generator={'type': 'ssd', 'num_scales': 6, 'min_scale': 0.15,
                          'max_scale': 1.05,
                          'aspect_ratios': [[1.0, 2.0]] + [[1.0, 2.0, 3.0]] * 3
                          + [[1.0, 2.0]] * 2},
        num_classes=21,
        features={'name': 'Features', 'out_layers': (32, 42),
                  'last_feature_layer': 42},
        extras={'layers': (('s', 512), ('s', 256), ('s', 256), ('s', 256))},
        input_size=(300, 300))
    # conv4_3 relu (idx 32) at stride 8 -> 37; conv5_3 relu (42) -> 18
    assert geometry(bundle, (300, 300)) == [(37, 37), (18, 18), (9, 9),
                                            (5, 5), (3, 3), (2, 2)]
    a = bundle.anchors((300, 300))
    expected = (37 * 37 * 4 + 18 * 18 * 6 + 9 * 9 * 6 + 5 * 5 * 6
                + 3 * 3 * 4 + 2 * 2 * 4)
    assert a.shape == (expected, 4)


def test_ssd512_vgg16_geometry():
    bundle = builder.build(
        base={'name': 'torchvision_vgg16_bn'},
        anchor_generator={'type': 'ssd', 'num_scales': 6, 'min_scale': 0.15,
                          'max_scale': 1.05,
                          'aspect_ratios': [[1.0, 2.0]] + [[1.0, 2.0, 3.0]] * 3
                          + [[1.0, 2.0]] * 2},
        num_classes=81,
        features={'name': 'Features', 'out_layers': (32, 42),
                  'last_feature_layer': 42},
        extras={'layers': (('s', 512), ('s', 256), ('s', 256), ('s', 256))},
        input_size=(512, 512))
    assert geometry(bundle, (512, 512)) == [(64, 64), (32, 32), (16, 16),
                                            (8, 8), (4, 4), (2, 2)]


def test_retina_rn50_fpn_geometry():
    bundle = builder.build(
        base={'name': 'torchvision_resnet50'},
        anchor_generator={'type': 'retina_net', 'min_level': 3, 'max_level': 7,
                          'aspect_ratios': [1.0, 2.0, 0.5], 'scale': 4.0,
                          'scales_per_level': 3},
        num_classes=80,
        features={'name': 'FeaturePyramid', 'out_layers': (5, 6, 7),
                  'pyramid_layers': 5, 'pyramid_channels': 256},
        predictor={'num_layers': 4, 'num_channels': 256, 'kernel_size': 3},
        heads={'score_head_bias_init': -4.6},
        input_size=(500, 500))
    fms = geometry(bundle, (500, 500))
    assert fms == [(63, 63), (32, 32), (16, 16), (8, 8), (4, 4)]
    a = bundle.anchors((500, 500))
    assert a.shape == (sum(w * h for w, h in fms) * 9, 4)


def test_m2det_vgg16_mlfpn_geometry():
    bundle = builder.build(
        base={'name': 'torchvision_vgg16_bn'},
        anchor_generator={'type': 'ssd', 'num_scales': 6, 'min_scale': 0.07,
                          'max_scale': 1.05,
                          'aspect_ratios': [[1.0, 2.0]] + [[1.0, 2.0, 3.0]] * 3
                          + [[1.0, 2.0]] * 2},
        num_classes=81,
        features={'name': 'MultilevelFeaturePyramid', 'out_layers': (32, 42),
                  'last_feature_layer': 42, 'num_scales': 6, 'num_tums': 2,
                  'base_reduced_channels': [512, 256]},
        input_size=(512, 512))
    fms = geometry(bundle, (512, 512))
    # TUM down chain from the stride-8 tap: 64 -> 32 -> 16 -> 8 -> 4 -> 2,
    # output large -> small
    assert fms == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]


def test_shufflenet_ssd_geometry():
    bundle = builder.build(
        base={'name': 'torchvision_shufflenet_v2_x1_0'},
        anchor_generator={'type': 'ssd', 'num_scales': 6, 'min_scale': 0.15,
                          'max_scale': 1.05,
                          'aspect_ratios': [[1.0, 2.0]] + [[1.0, 2.0, 3.0]] * 3
                          + [[1.0, 2.0]] * 2},
        num_classes=21,
        use_depthwise=True,
        features={'name': 'Features', 'out_layers': (3, 5)},
        extras={'layers': (('s', 256), ('s', 256), ('s', 256), ('s', 128))},
        input_size=(300, 300))
    assert geometry(bundle, (300, 300)) == [(19, 19), (10, 10), (5, 5),
                                            (3, 3), (2, 2), (1, 1)]


def test_mobilenet_v1_stages():
    from single_shot_detection_tpu.models.mobilenet import MobileNet
    m = MobileNet()
    out, _ = jax.eval_shape(
        lambda: m.init_with_output(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 224, 224, 3))))
    stages, _ = out
    assert len(stages) == 14
    assert stages[-1].shape[-1] == 1024
    assert stages[-1].shape[1] == 7  # stride 32


def test_vgg16_bn_layer_count_and_channels():
    from single_shot_detection_tpu.models.vgg import VGG, VGG_CONFIGS
    m = VGG(config=VGG_CONFIGS[16], use_bn=True)
    assert m.num_stages == 44  # matches torchvision vgg16_bn.features
    out, _ = jax.eval_shape(
        lambda: m.init_with_output(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 300, 300, 3))))
    stages, _ = out
    assert stages[32].shape[-1] == 512 and stages[32].shape[1] == 37
    assert stages[42].shape[-1] == 512 and stages[42].shape[1] == 18


def test_resnet50_stage_channels():
    from single_shot_detection_tpu.models.resnet import ResNet, RESNET_CONFIGS
    m = ResNet(**RESNET_CONFIGS[50])
    out, _ = jax.eval_shape(
        lambda: m.init_with_output(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 224, 224, 3))))
    stages, _ = out
    assert [s.shape[-1] for s in stages[4:]] == [256, 512, 1024, 2048]
    assert stages[7].shape[1] == 7


def test_resnext_groups():
    from single_shot_detection_tpu.models.resnet import ResNet, RESNET_CONFIGS
    m = ResNet(**RESNET_CONFIGS[50], groups=32, width_per_group=4)
    out, _ = jax.eval_shape(
        lambda: m.init_with_output(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3))))
    stages, _ = out
    assert stages[7].shape[-1] == 2048


def test_depthwise_fpn_builds():
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 4, 'min_scale': 0.2,
                          'max_scale': 0.95, 'aspect_ratios': [[1.0, 2.0]] * 4},
        num_classes=5,
        features={'name': 'DepthwiseFeaturePyramid', 'out_layers': (13, 18),
                  'pyramid_layers': 4, 'pyramid_channels': 128},
        input_size=(128, 128))
    fms = geometry(bundle, (128, 128))
    assert len(fms) == 4
    assert fms[0] == (8, 8)  # stride 16 tap


def test_small_forward_retina_path():
    # tiny FPN + shared predictor + focal-style head actually runs forward
    bundle = builder.build(
        base={'name': 'torchvision_resnet18'},
        anchor_generator={'type': 'retina_net', 'min_level': 3, 'max_level': 5,
                          'aspect_ratios': [1.0, 2.0], 'scale': 4.0,
                          'scales_per_level': 1},
        num_classes=4,
        features={'name': 'FeaturePyramid', 'out_layers': (5, 6, 7),
                  'pyramid_layers': 3, 'pyramid_channels': 64},
        predictor={'num_layers': 1, 'num_channels': 64},
        heads={'score_head_bias_init': -4.6},
        input_size=(128, 128))
    variables = bundle.init(jax.random.PRNGKey(0))
    scores, locs = bundle.module.apply(
        variables, jnp.ones((1, 128, 128, 3)), train=False)
    assert scores.shape[1] == bundle.anchors((128, 128)).shape[0]
    assert scores.shape[2] == 4
    # focal prior: sigmoid(score) should start near 0.01
    import numpy as np
    mean_sigmoid = float(jax.nn.sigmoid(scores).mean())
    assert 0.005 < mean_sigmoid < 0.05


def test_se_resnet_backbone():
    from single_shot_detection_tpu.models import backbones
    m = backbones.get('pretrainedmodels_se_resnet50')()
    out, _ = jax.eval_shape(
        lambda: m.init_with_output(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 224, 224, 3))))
    stages, _ = out
    # _senet_wrapper indexing: [layer0, layer1..4] (base_builder.py:44-57)
    assert [s.shape[-1] for s in stages] == [64, 256, 512, 1024, 2048]
    assert stages[-1].shape[1] == 7
    # SE gate actually runs forward
    m2 = backbones.get('pretrainedmodels_se_resnext50_32x4d')()
    variables = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    stages, _ = m2.apply(variables, jnp.ones((1, 64, 64, 3)))
    import numpy as np
    assert np.isfinite(np.asarray(stages[-1])).all()
    assert 'se' in variables['params']['layer1_0']
