"""Physical pruning materialization: narrow model == masked model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.train import create_train_state, deps, pruning
from single_shot_detection_tpu.train.materialize import (build_channel_spaces,
                                                         materialize_bundle)


def flagship_like():
    return builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 3},
        num_classes=5,
        use_depthwise=True,
        features={'name': 'Features', 'out_layers': (13, 18)},
        extras={'layers': (('s', 64),)},
        input_size=(96, 96))


def vgg_like():
    # ssd_300_vgg16_voc-shaped (small input / few scales for test speed)
    return builder.build(
        base={'name': 'torchvision_vgg16_bn'},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 2},
        num_classes=5, use_depthwise=False,
        features={'name': 'Features', 'out_layers': (32, 42),
                  'last_feature_layer': 42},
        extras=None, input_size=(64, 64))


def resnet_like():
    return builder.build(
        base={'name': 'torchvision_resnet18'},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 2},
        num_classes=5, use_depthwise=False,
        features={'name': 'Features', 'out_layers': (6, 7)},
        extras=None, input_size=(64, 64))


def test_channel_spaces_cover_all_convs():
    bundle = flagship_like()
    variables = bundle.init(jax.random.PRNGKey(0))
    spaces = build_channel_spaces(bundle.module, variables, bundle.input_size)
    kernels = {('params',) + k
               for k in pruning.conv_kernel_paths(variables['params'])}
    writers = {m.path for s in spaces for m in s.members
               if m.role in ('producer', 'depthwise')}
    assert not (kernels - writers), kernels - writers


def test_channel_spaces_tie_residual_chains():
    bundle = resnet_like()
    variables = bundle.init(jax.random.PRNGKey(0))
    spaces = build_channel_spaces(bundle.module, variables, bundle.input_size)
    # layer1 has 2 basic blocks: conv2 outs + the stem join in one space
    for s in spaces:
        prods = {m.path[2:] for m in s.by_role('producer')}
        if ('base', 'layer1_0', 'conv2', 'kernel') in prods:
            assert ('base', 'layer1_1', 'conv2', 'kernel') in prods
            break
    else:
        raise AssertionError('no space with layer1_0/conv2 producer')


def _roundtrip(bundle, include_paths, num):
    tx = pruning.masked(optax.sgd(1e-2))
    variables = bundle.init(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    spaces = build_channel_spaces(bundle.module, variables, bundle.input_size)

    pruner = pruning.Pruner(state.params, {'name': 'MinL1Norm'},
                            include_paths=include_paths, num=num,
                            spaces=spaces)
    state = pruner.prune(state)
    assert pruner.dead

    w, h = bundle.input_size
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3))
    masked_out = bundle.module.apply(
        {'params': state.params, 'batch_stats': state.batch_stats},
        x, train=False)

    new_bundle, new_vars = materialize_bundle(
        bundle, {'params': state.params, 'batch_stats': state.batch_stats},
        pruner.dead, spaces=spaces)
    narrow_out = new_bundle.module.apply(
        {'params': jax.tree_util.tree_map(jnp.asarray, new_vars['params']),
         'batch_stats': jax.tree_util.tree_map(jnp.asarray,
                                               new_vars['batch_stats'])},
        x, train=False)

    for a, b in zip(masked_out, narrow_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    old_size = sum(np.size(v) for v in
                   jax.tree_util.tree_leaves(state.params))
    new_size = sum(np.size(v) for v in
                   jax.tree_util.tree_leaves(new_vars['params']))
    assert new_size < old_size


def test_materialized_equals_masked():
    _roundtrip(flagship_like(), ['features', 'extra'], num=12)


def test_materialized_equals_masked_vgg():
    _roundtrip(vgg_like(), ['features'], num=10)


def test_materialized_equals_masked_resnet():
    _roundtrip(resnet_like(), ['features'], num=10)


def fpn_like():
    return builder.build(
        base={'name': 'torchvision_resnet18'},
        anchor_generator={'type': 'retina_net', 'min_level': 3,
                          'max_level': 5, 'aspect_ratios': [1.0, 2.0],
                          'scale': 4.0},
        num_classes=5, use_depthwise=False,
        features={'name': 'FeaturePyramid', 'out_layers': (5, 6, 7),
                  'pyramid_layers': 3, 'pyramid_channels': 32},
        extras=None, input_size=(64, 64))


def test_fpn_laterals_form_one_space():
    bundle = fpn_like()
    variables = bundle.init(jax.random.PRNGKey(0))
    spaces = build_channel_spaces(bundle.module, variables, bundle.input_size)
    lat = [s for s in spaces
           if any(m.path[2].startswith('lateral')
                  for m in s.by_role('producer'))]
    assert len(lat) == 1 and not lat[0].frozen
    names = {m.path[2] for m in lat[0].by_role('producer')}
    assert names == {'lateral0', 'lateral1', 'lateral2'}


def test_materialized_equals_masked_fpn():
    _roundtrip(fpn_like(), ['features'], num=14)
