"""Keras .h5 weight import for the MobileNet backbones.

Functional-parity target: reference ``bf/utils/convert_weights.py:10-142``
(``from_keras``) + ``base_builder.py:81-84`` (``init_from_keras``) — the
reference's documented path for initializing its custom MobileNets from
keras-applications pretrained weights.

TPU-first design: the reference instantiates a live Keras model (full TF
runtime) and copies layer-by-layer into a torch ``state_dict``.  Here the
``.h5`` weight FILE is read directly with ``h5py`` — no TF dependency —
and mapped straight into the flax variable tree: keras conv kernels are
already ``[kh, kw, in, out]`` (flax layout, no transpose — torch needed
``permute(3, 2, 0, 1)``), depthwise kernels ``[kh, kw, ch, mult]`` swap
the trailing axes, and BN moving stats land in ``batch_stats``.

Usage: ``model.base.weight = 'mobilenet_1_0_224.h5'`` in a config routes
here by suffix (train/engine.py); the layer tables mirror
convert_weights.py:79-129.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

# kinds: how a keras layer's weight arrays convert into a flax leaf
CONV = 'conv'            # kernel:0 [kh,kw,in,out] -> kernel (identity)
DEPTHWISE = 'depthwise'  # depthwise_kernel:0 [kh,kw,ch,1] -> [kh,kw,1,ch]
BN = 'bn'                # gamma/beta -> scale/bias; moving_* -> batch_stats


def load_keras_h5(path: str) -> Dict[str, np.ndarray]:
    """All weight datasets of a keras ``.h5`` file, keyed by their full
    group path (e.g. ``conv1/conv1/kernel:0``).  Handles both whole-model
    saves (weights under ``model_weights/``) and ``save_weights`` files."""
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(path, 'r') as f:
        root = f['model_weights'] if 'model_weights' in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = np.asarray(obj)

        root.visititems(visit)
    return out


def keras_mobilenet_v1_mapping() -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """keras-applications MobileNet layer name -> (our flax path, kind)
    (parity: convert_weights.py:79-88; our names as in
    torch_import.mobilenet_v1_mapping)."""
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {
        'conv1': (('stage0_conv',), CONV),
        'conv1_bn': (('stage0_bn',), BN),
    }
    for i in range(1, 14):
        m[f'conv_dw_{i}'] = ((f'stage{i}', 'depthwise_conv'), DEPTHWISE)
        m[f'conv_dw_{i}_bn'] = ((f'stage{i}', 'depthwise_bn'), BN)
        m[f'conv_pw_{i}'] = ((f'stage{i}', 'pointwise_conv'), CONV)
        m[f'conv_pw_{i}_bn'] = ((f'stage{i}', 'pointwise_bn'), BN)
    return m


def keras_mobilenet_v2_mapping() -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """keras-applications MobileNetV2 layer name -> (our flax path, kind)
    (parity: convert_weights.py:106-124)."""
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {
        'Conv1': (('stage0', 'conv'), CONV),
        'bn_Conv1': (('stage0', 'bn'), BN),
        'expanded_conv_depthwise': (('stage1', 'depthwise_conv'), DEPTHWISE),
        'expanded_conv_depthwise_BN': (('stage1', 'depthwise_bn'), BN),
        'expanded_conv_project': (('stage1', 'project_conv'), CONV),
        'expanded_conv_project_BN': (('stage1', 'project_bn'), BN),
        'Conv_1': (('stage18', 'conv'), CONV),
        'Conv_1_bn': (('stage18', 'bn'), BN),
    }
    for i in range(2, 18):
        m[f'block_{i - 1}_expand'] = ((f'stage{i}', 'expand_conv'), CONV)
        m[f'block_{i - 1}_expand_BN'] = ((f'stage{i}', 'expand_bn'), BN)
        m[f'block_{i - 1}_depthwise'] = ((f'stage{i}', 'depthwise_conv'),
                                         DEPTHWISE)
        m[f'block_{i - 1}_depthwise_BN'] = ((f'stage{i}', 'depthwise_bn'), BN)
        m[f'block_{i - 1}_project'] = ((f'stage{i}', 'project_conv'), CONV)
        m[f'block_{i - 1}_project_BN'] = ((f'stage{i}', 'project_bn'), BN)
    return m


def keras_backbone_mapping(backbone: str
                           ) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """Mapping for a registry backbone name; keras weights exist only for
    the MobileNet families the reference converter supports."""
    if backbone.startswith('mobilenet_v2'):
        return keras_mobilenet_v2_mapping()
    if backbone.startswith('mobilenet_v1') or (
            backbone.startswith('mobilenet_')
            and backbone[len('mobilenet_'):].isdigit()):
        return keras_mobilenet_v1_mapping()
    raise KeyError(
        f'No keras-weight mapping for backbone {backbone!r} (keras '
        f'pretrained weights exist for mobilenet v1/v2 only — '
        f'convert_weights.py supports exactly those)')


def _layer_weights(datasets: Dict[str, np.ndarray],
                   layer: str) -> Dict[str, np.ndarray]:
    """The weight arrays of one keras layer, keyed by trailing name
    (``kernel:0`` etc.).  Matches ``layer`` as a PATH SEGMENT so
    ``conv1`` does not also swallow ``conv1_bn``'s datasets."""
    found = {}
    for name, arr in datasets.items():
        parts = name.split('/')
        if layer in parts[:-1]:
            found[parts[-1]] = arr
    return found


def import_keras_backbone(path: str,
                          variables: dict,
                          backbone: str,
                          base_path: Tuple[str, ...] = ('features', 'base'),
                          ) -> dict:
    """Fill the backbone subtree of ``variables`` from a keras ``.h5``
    weight file.  Returns a new variables dict; layers absent from the
    file keep their init (warned, mirroring convert_weights.py:23)."""
    import jax

    mapping = keras_backbone_mapping(backbone)
    datasets = load_keras_h5(path)

    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    batch_stats = jax.tree_util.tree_map(np.asarray,
                                         variables.get('batch_stats', {}))

    def get_subtree(tree, keys):
        for k in keys:
            if not isinstance(tree, dict) or k not in tree:
                return None
            tree = tree[k]
        return tree

    target_params = get_subtree(params, base_path)
    target_stats = get_subtree(batch_stats, base_path) or {}
    if target_params is None:
        raise KeyError(f'no backbone subtree at {"/".join(base_path)}')

    filled = 0
    missing_src = []
    missing_dst = []
    for layer, (our_path, kind) in mapping.items():
        weights = _layer_weights(datasets, layer)
        if not weights:
            missing_src.append(layer)
            continue
        leaf = get_subtree(target_params, our_path)
        if leaf is None:
            missing_dst.append(layer)
            continue

        def put(leaf_key, value, node=leaf):
            if leaf_key not in node:
                return
            if node[leaf_key].shape != value.shape:
                raise ValueError(
                    f'{layer}: shape mismatch {value.shape} -> '
                    f'{leaf_key} {node[leaf_key].shape} (check '
                    f'depth_multiplier matches the weight file)')
            node[leaf_key] = value.astype(node[leaf_key].dtype)

        if kind == BN:
            if 'gamma:0' in weights:
                put('scale', weights['gamma:0'])
            if 'beta:0' in weights:
                put('bias', weights['beta:0'])
            stats_leaf = get_subtree(target_stats, our_path)
            if stats_leaf is not None:
                if 'moving_mean:0' in weights:
                    put('mean', weights['moving_mean:0'], node=stats_leaf)
                if 'moving_variance:0' in weights:
                    put('var', weights['moving_variance:0'], node=stats_leaf)
        else:
            if 'kernel:0' in weights:
                put('kernel', weights['kernel:0'])
            elif 'depthwise_kernel:0' in weights:
                # keras [kh, kw, ch, mult] -> flax grouped-conv
                # [kh, kw, in/groups=1 (x mult), ch]
                put('kernel',
                    weights['depthwise_kernel:0'].transpose(0, 1, 3, 2))
            if 'bias:0' in weights:
                put('bias', weights['bias:0'])
        filled += 1

    if missing_src:
        logging.warning(f'WW keras import: layers missing in source file: '
                        f'{missing_src[:5]}... ({len(missing_src)} total)')
    if missing_dst:
        logging.warning(f'WW keras import: no target for layers '
                        f'{missing_dst[:5]}... ({len(missing_dst)} total)')
    logging.info(f'===> keras import: filled {filled} layers into '
                 f'{"/".join(base_path)}')
    out = {'params': params}
    if batch_stats:
        out['batch_stats'] = batch_stats
    return out
