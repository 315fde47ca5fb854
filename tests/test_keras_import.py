"""Keras .h5 backbone import (utils/keras_import.py).

Layout tests in the spirit of tests/test_torch_import.py: a synthetic .h5
in the keras-applications group layout (``<layer>/<layer>/<weight>:0``)
is imported into a freshly initialized flax MobileNet and every landing,
transpose, and BN-stat placement is checked.  Parity target: the
reference's convert_weights.py:10-142 keras->torch converter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from single_shot_detection_tpu.utils import keras_import

h5py = pytest.importorskip('h5py')


def _write_keras_h5(path, mapping, params, batch_stats, rng,
                    nested_model_weights=False):
    """Synthesize an .h5 in keras layout with arrays shaped from the flax
    tree; returns {keras layer: {weight name: array}} for later checks."""
    def get(tree, keys):
        for k in keys:
            tree = tree[k]
        return tree

    written = {}
    with h5py.File(path, 'w') as f:
        root = (f.create_group('model_weights') if nested_model_weights
                else f)
        for layer, (our_path, kind) in mapping.items():
            grp = root.create_group(layer).create_group(layer)
            leaf = get(params, our_path)
            arrays = {}
            if kind == keras_import.BN:
                ch = np.asarray(leaf['scale']).shape[0]
                arrays['gamma:0'] = rng.randn(ch).astype(np.float32)
                arrays['beta:0'] = rng.randn(ch).astype(np.float32)
                arrays['moving_mean:0'] = rng.randn(ch).astype(np.float32)
                arrays['moving_variance:0'] = np.abs(
                    rng.randn(ch)).astype(np.float32)
            elif kind == keras_import.DEPTHWISE:
                kshape = np.asarray(leaf['kernel']).shape  # [kh,kw,1,ch]
                arrays['depthwise_kernel:0'] = rng.randn(
                    kshape[0], kshape[1], kshape[3],
                    kshape[2]).astype(np.float32)
            else:
                kshape = np.asarray(leaf['kernel']).shape
                arrays['kernel:0'] = rng.randn(*kshape).astype(np.float32)
            for name, arr in arrays.items():
                grp.create_dataset(name, data=arr)
            written[layer] = arrays
    return written


@pytest.mark.parametrize('family', ['v1', 'v2'])
def test_keras_import_layout(tmp_path, family):
    rng = np.random.RandomState(0)
    if family == 'v1':
        from single_shot_detection_tpu.models.mobilenet import MobileNet
        model = MobileNet()
        mapping = keras_import.keras_mobilenet_v1_mapping()
        backbone = 'mobilenet_v1'
        conv_layer, conv_path = 'conv_pw_5', ('stage5', 'pointwise_conv')
        dw_layer, dw_path = 'conv_dw_5', ('stage5', 'depthwise_conv')
        bn_layer, bn_path = 'conv_dw_5_bn', ('stage5', 'depthwise_bn')
    else:
        from single_shot_detection_tpu.models.mobilenet_v2 import MobileNetV2
        model = MobileNetV2()
        mapping = keras_import.keras_mobilenet_v2_mapping()
        backbone = 'mobilenet_v2'
        conv_layer, conv_path = 'block_4_expand', ('stage5', 'expand_conv')
        dw_layer, dw_path = ('block_4_depthwise',
                             )[0], ('stage5', 'depthwise_conv')
        bn_layer, bn_path = 'block_4_depthwise_BN', ('stage5', 'depthwise_bn')

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    path = str(tmp_path / 'weights.h5')
    written = _write_keras_h5(path, mapping, variables['params'],
                              variables.get('batch_stats', {}), rng,
                              nested_model_weights=(family == 'v2'))

    new_vars = keras_import.import_keras_backbone(
        path, variables, backbone, base_path=())

    def get(tree, keys):
        for k in keys:
            tree = tree[k]
        return np.asarray(tree)

    # plain conv kernel: keras layout IS flax layout (no transpose)
    np.testing.assert_array_equal(get(new_vars['params'], conv_path + ('kernel',)),
                                  written[conv_layer]['kernel:0'])
    # depthwise kernel: [kh,kw,ch,1] -> [kh,kw,1,ch]
    np.testing.assert_array_equal(
        get(new_vars['params'], dw_path + ('kernel',)),
        written[dw_layer]['depthwise_kernel:0'].transpose(0, 1, 3, 2))
    # BN: gamma->scale, moving stats -> batch_stats
    np.testing.assert_array_equal(get(new_vars['params'], bn_path + ('scale',)),
                                  written[bn_layer]['gamma:0'])
    np.testing.assert_array_equal(
        get(new_vars['batch_stats'], bn_path + ('mean',)),
        written[bn_layer]['moving_mean:0'])
    np.testing.assert_array_equal(
        get(new_vars['batch_stats'], bn_path + ('var',)),
        written[bn_layer]['moving_variance:0'])

    # the imported model still runs
    out = model.apply(new_vars, x, train=False)
    stages = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(stages[-1])).all()


def test_keras_import_shape_mismatch_raises(tmp_path):
    """A depth_multiplier mismatch between model and weight file must raise,
    not silently skip."""
    from single_shot_detection_tpu.models.mobilenet import MobileNet
    rng = np.random.RandomState(1)
    model = MobileNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 64, 64, 3), jnp.float32))
    mapping = keras_import.keras_mobilenet_v1_mapping()
    path = str(tmp_path / 'w.h5')
    _write_keras_h5(path, mapping, variables['params'],
                    variables.get('batch_stats', {}), rng)
    # corrupt one layer's channel count
    with h5py.File(path, 'a') as f:
        del f['conv1/conv1/kernel:0']
        f['conv1/conv1'].create_dataset(
            'kernel:0', data=np.zeros((3, 3, 3, 7), np.float32))
    with pytest.raises(ValueError, match='shape mismatch'):
        keras_import.import_keras_backbone(path, variables, 'mobilenet_v1',
                                           base_path=())


def test_keras_mapping_unknown_backbone_raises():
    with pytest.raises(KeyError, match='keras'):
        keras_import.keras_backbone_mapping('torchvision_vgg16_bn')
