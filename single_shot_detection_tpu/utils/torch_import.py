"""Import pretrained torch checkpoints into flax param trees.

Functional-parity targets: reference pretrained-weight loading
(``base_builder.py:81-84``, torchvision ``pretrained=True`` download) and the
Keras converter spirit (``bf/utils/convert_weights.py``).  This environment
has no network egress, so weights arrive as torch ``state_dict`` files the
user provides (``model.base.weight`` config key or CLI); this module does the
layout conversion:

  torch Conv2d weight  [out, in, kh, kw]   -> flax kernel [kh, kw, in, out]
  torch depthwise      [out, 1, kh, kw]    -> flax kernel [kh, kw, 1, out]
  torch Linear weight  [out, in]           -> flax kernel [in, out]
  torch BatchNorm      weight/bias/running_mean/running_var
                       -> scale/bias + batch_stats mean/var
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Optional, Tuple

import numpy as np


def _to_numpy(value):
    if hasattr(value, 'detach'):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def convert_tensor(name: str, value: np.ndarray, target_shape) -> np.ndarray:
    """Convert a single torch tensor to the flax layout for ``target_shape``."""
    value = _to_numpy(value)
    if value.ndim == 4:
        # [out, in/groups, kh, kw] -> [kh, kw, in/groups, out]
        converted = value.transpose(2, 3, 1, 0)
    elif value.ndim == 2:
        converted = value.transpose(1, 0)
    else:
        converted = value
    if tuple(converted.shape) != tuple(target_shape):
        raise ValueError(f'{name}: converted shape {converted.shape} != '
                         f'target {target_shape}')
    return converted


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    payload = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(payload, dict) and 'state_dict' in payload:
        payload = payload['state_dict']
    if isinstance(payload, dict) and 'model_dict' in payload:
        payload = payload['model_dict']
    return {k: _to_numpy(v) for k, v in payload.items()}


# ------------------------------------------------------------------ mappings

def mobilenet_v2_mapping() -> Dict[str, Tuple[str, ...]]:
    """torchvision mobilenet_v2 state_dict key prefix -> our param path.

    torchvision layout: features.0 (ConvBNReLU), features.1..17
    (InvertedResidual with .conv.N submodules), features.18 (ConvBNReLU).
    Ours: stage0 / stage1..17 (expand/depthwise/project) / stage18.
    """
    m: Dict[str, Tuple[str, ...]] = {}
    m['features.0.0'] = ('stage0', 'conv')
    m['features.0.1'] = ('stage0', 'bn')
    # stage 1 has no expansion: conv.0 = dw ConvBNReLU, conv.1 = project conv,
    # conv.2 = project bn
    m['features.1.conv.0.0'] = ('stage1', 'depthwise_conv')
    m['features.1.conv.0.1'] = ('stage1', 'depthwise_bn')
    m['features.1.conv.1'] = ('stage1', 'project_conv')
    m['features.1.conv.2'] = ('stage1', 'project_bn')
    for i in range(2, 18):
        m[f'features.{i}.conv.0.0'] = (f'stage{i}', 'expand_conv')
        m[f'features.{i}.conv.0.1'] = (f'stage{i}', 'expand_bn')
        m[f'features.{i}.conv.1.0'] = (f'stage{i}', 'depthwise_conv')
        m[f'features.{i}.conv.1.1'] = (f'stage{i}', 'depthwise_bn')
        m[f'features.{i}.conv.2'] = (f'stage{i}', 'project_conv')
        m[f'features.{i}.conv.3'] = (f'stage{i}', 'project_bn')
    m['features.18.0'] = ('stage18', 'conv')
    m['features.18.1'] = ('stage18', 'bn')
    return m


def vgg_mapping(config, bn: bool = True) -> Dict[str, Tuple[str, ...]]:
    """torchvision vggN[_bn] ``features.K`` -> our conv{i}[/bn{i}] names.

    With BN each conv block is (conv, bn, relu) — stride 3 in the
    ``features`` Sequential; without BN it is (conv, relu) — stride 2 and
    no bn keys.
    """
    m: Dict[str, Tuple[str, ...]] = {}
    idx = 0
    conv = 0
    for item in config:
        if item == 'M':
            idx += 1
            continue
        m[f'features.{idx}'] = (f'conv{conv}',)
        if bn:
            m[f'features.{idx + 1}'] = (f'bn{conv}',)
        idx += 3 if bn else 2
        conv += 1
    return m


def vgg_bn_mapping(config) -> Dict[str, Tuple[str, ...]]:
    return vgg_mapping(config, bn=True)


def resnet_mapping(layers) -> Dict[str, Tuple[str, ...]]:
    m: Dict[str, Tuple[str, ...]] = {
        'conv1': ('conv1',), 'bn1': ('bn1',),
    }
    for li, count in enumerate(layers, start=1):
        for b in range(count):
            base = f'layer{li}.{b}'
            ours = f'layer{li}_{b}'
            for name in ('conv1', 'bn1', 'conv2', 'bn2', 'conv3', 'bn3'):
                m[f'{base}.{name}'] = (ours, name)
            m[f'{base}.downsample.0'] = (ours, 'downsample_conv')
            m[f'{base}.downsample.1'] = (ours, 'downsample_bn')
    return m


def shufflenet_v2_mapping(stage_repeats=(4, 8, 4)) -> Dict[str, Tuple[str, ...]]:
    """torchvision shufflenet_v2 state_dict prefixes -> our param paths.

    torchvision: conv1.[0 conv, 1 bn]; stage{2,3,4}.{i}.branch1.[0 dw, 1 bn,
    2 pw, 3 bn] (stride units only) / branch2.[0 pw, 1 bn, 3 dw, 4 bn, 5 pw,
    6 bn]; conv5.[0 conv, 1 bn].
    """
    m: Dict[str, Tuple[str, ...]] = {
        'conv1.0': ('conv1',), 'conv1.1': ('conv1_bn',),
        'conv5.0': ('conv5',), 'conv5.1': ('conv5_bn',),
    }
    for si, repeats in enumerate(stage_repeats, start=2):
        for i in range(repeats):
            base = f'stage{si}.{i}'
            ours = f'stage{si}_{i}'
            if i == 0:  # stride unit has branch1
                m[f'{base}.branch1.0'] = (ours, 'branch1_dw')
                m[f'{base}.branch1.1'] = (ours, 'branch1_dw_bn')
                m[f'{base}.branch1.2'] = (ours, 'branch1_pw')
                m[f'{base}.branch1.3'] = (ours, 'branch1_pw_bn')
            m[f'{base}.branch2.0'] = (ours, 'branch2_pw1')
            m[f'{base}.branch2.1'] = (ours, 'branch2_pw1_bn')
            m[f'{base}.branch2.3'] = (ours, 'branch2_dw')
            m[f'{base}.branch2.4'] = (ours, 'branch2_dw_bn')
            m[f'{base}.branch2.5'] = (ours, 'branch2_pw2')
            m[f'{base}.branch2.6'] = (ours, 'branch2_pw2_bn')
    return m


def mobilenet_v1_mapping() -> Dict[str, Tuple[str, ...]]:
    """Reference custom MobileNet v1 state_dict (bf/base/mobilenet.py:96-112:
    ``features.0.{conv,bn}`` then 13 ``features.{i}.{depthwise,pointwise}_
    {conv,bn}`` blocks) -> our stage0/stage{1..13} names."""
    m: Dict[str, Tuple[str, ...]] = {
        'features.0.conv': ('stage0_conv',),
        'features.0.bn': ('stage0_bn',),
    }
    for i in range(1, 14):
        for name in ('depthwise_conv', 'depthwise_bn',
                     'pointwise_conv', 'pointwise_bn'):
            m[f'features.{i}.{name}'] = (f'stage{i}', name)
    return m


def se_resnet_mapping(layers) -> Dict[str, Tuple[str, ...]]:
    """pretrainedmodels se_resnet/se_resnext state_dict layout
    (``layer0.{conv1,bn1}``; ``layer{L}.{b}.{conv,bn}{1..3}``,
    ``.se_module.{fc1,fc2}`` 1x1 convs, ``.downsample.{0,1}``) -> our
    SEResNet names (models/resnet.py:229-275)."""
    m: Dict[str, Tuple[str, ...]] = {
        'layer0.conv1': ('conv1',), 'layer0.bn1': ('bn1',),
    }
    for li, count in enumerate(layers, start=1):
        for b in range(count):
            base = f'layer{li}.{b}'
            ours = f'layer{li}_{b}'
            for name in ('conv1', 'bn1', 'conv2', 'bn2', 'conv3', 'bn3'):
                m[f'{base}.{name}'] = (ours, name)
            m[f'{base}.se_module.fc1'] = (ours, 'se', 'fc1')
            m[f'{base}.se_module.fc2'] = (ours, 'se', 'fc2')
            m[f'{base}.downsample.0'] = (ours, 'downsample_conv')
            m[f'{base}.downsample.1'] = (ours, 'downsample_bn')
    return m


SE_LAYERS = {
    'se_resnet50': (3, 4, 6, 3),
    'se_resnet101': (3, 4, 23, 3),
    'se_resnet152': (3, 8, 36, 3),
    'se_resnext50_32x4d': (3, 4, 6, 3),
    'se_resnext101_32x4d': (3, 4, 23, 3),
}

MAPPINGS = {
    'torchvision_mobilenet_v2': lambda: mobilenet_v2_mapping(),
    'mobilenet_v2': lambda: mobilenet_v2_mapping(),
    'mobilenet_v1': mobilenet_v1_mapping,
}
for _suffix in ('x0_5', 'x1_0', 'x1_5', 'x2_0'):
    MAPPINGS[f'torchvision_shufflenet_v2_{_suffix}'] = shufflenet_v2_mapping
for _mult in ('10', '075', '050', '05', '035'):
    MAPPINGS[f'mobilenet_v2_{_mult}'] = mobilenet_v2_mapping
for _mult in ('10', '075', '050', '05', '025'):
    MAPPINGS[f'mobilenet_{_mult}'] = mobilenet_v1_mapping
for _name, _layers in SE_LAYERS.items():
    MAPPINGS[f'pretrainedmodels_{_name}'] = functools.partial(
        se_resnet_mapping, _layers)


def mobilenet_v2_reference_mapping() -> Dict[str, Tuple[str, ...]]:
    """The REFERENCE's custom MobileNetV2 state_dict layout
    (bf/base/mobilenet_v2.py: ``features.0.{conv,bn}``, inverted-residual
    blocks ``features.{1..17}.{expand,depthwise,project}_{conv,bn}``,
    ``features.18.{conv,bn}``) -> our stage names.  Same leaves by design."""
    m: Dict[str, Tuple[str, ...]] = {
        'features.0.conv': ('stage0', 'conv'),
        'features.0.bn': ('stage0', 'bn'),
        'features.18.conv': ('stage18', 'conv'),
        'features.18.bn': ('stage18', 'bn'),
    }
    for leaf in ('depthwise_conv', 'depthwise_bn',
                 'project_conv', 'project_bn'):
        m[f'features.1.{leaf}'] = ('stage1', leaf)
    for i in range(2, 18):
        for leaf in ('expand_conv', 'expand_bn', 'depthwise_conv',
                     'depthwise_bn', 'project_conv', 'project_bn'):
            m[f'features.{i}.{leaf}'] = (f'stage{i}', leaf)
    return m


def resnet_reference_mapping(layers) -> Dict[str, Tuple[str, ...]]:
    """The reference wraps torchvision ResNets into an index-keyed
    ``features`` Sequential (base_builder.py:10-26 _resnet_wrapper:
    conv1, bn1, relu, maxpool, layer1..4 -> indices 0..7), so its
    checkpoint keys are ``{idx}.{block}.{leaf}``."""
    m: Dict[str, Tuple[str, ...]] = {'0': ('conv1',), '1': ('bn1',)}
    for li, count in enumerate(layers, start=1):
        idx = li + 3  # layer1 lands at Sequential index 4
        for b in range(count):
            base = f'{idx}.{b}'
            ours = f'layer{li}_{b}'
            for name in ('conv1', 'bn1', 'conv2', 'bn2', 'conv3', 'bn3'):
                m[f'{base}.{name}'] = (ours, name)
            m[f'{base}.downsample.0'] = (ours, 'downsample_conv')
            m[f'{base}.downsample.1'] = (ours, 'downsample_bn')
    return m


def fpn_reference_mapping(num_laterals: int,
                          pyramid_layers: int) -> Dict[str, Tuple[str, ...]]:
    """FeaturePyramid neck (bf/modules/features.py:52-120): plain-Conv2d
    laterals + Conv2dBn output convs.  Keys are relative to the neck
    (``predictor.features.`` in a detector checkpoint)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for i in range(num_laterals):
        m[f'pyramid_lateral.{i}'] = (f'lateral{i}',)
    for i in range(pyramid_layers):
        m[f'pyramid_output.{i}.conv'] = (f'output{i}', 'conv')
        m[f'pyramid_output.{i}.bn'] = (f'output{i}', 'bn')
    return m


def _convbn_entries(torch_prefix: str, our_path: Tuple[str, ...],
                    use_depthwise: bool = False) -> Dict[str, Tuple[str, ...]]:
    """Mapping entries for one Conv2dBn / DepthwiseConv2dBn block."""
    if use_depthwise:
        return {f'{torch_prefix}.{leaf}': our_path + (leaf,)
                for leaf in ('depthwise_conv', 'depthwise_bn',
                             'pointwise_conv', 'pointwise_bn')}
    return {f'{torch_prefix}.conv': our_path + ('conv',),
            f'{torch_prefix}.bn': our_path + ('bn',)}


def mlfpn_reference_mapping(num_out_layers: int,
                            num_scales: int,
                            num_tums: int,
                            use_depthwise: bool = False,
                            ) -> Dict[str, Tuple[str, ...]]:
    """M2Det MultilevelFeaturePyramid (bf/modules/features.py:303-400):
    base reducers -> TUM chain (+ per-TUM base reducers) -> SFAM gates.
    Keys are relative to the neck (``predictor.features.`` in a detector
    checkpoint).  Index correspondence: reference ``down_layers.{j}`` /
    ``up_layers.{j}`` are built for scale i=j+1 (our ``down{i}``/``up{i}``),
    ``smooth_layers.{j}`` matches our ``smooth{j}`` (both deepest-first at
    apply time), ``reducers.{t}`` feeds TUM t+1 (our ``reducer{t+1}``)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for i in range(num_out_layers):
        m.update(_convbn_entries(f'base_reducers.{i}', (f'base_reducer{i}',)))
    for t in range(num_tums):
        for i in range(1, num_scales):
            m.update(_convbn_entries(f'tums.{t}.down_layers.{i - 1}',
                                     (f'tum{t}', f'down{i}'), use_depthwise))
            m.update(_convbn_entries(f'tums.{t}.up_layers.{i - 1}',
                                     (f'tum{t}', f'up{i}'), use_depthwise))
        for j in range(num_scales):
            m.update(_convbn_entries(f'tums.{t}.smooth_layers.{j}',
                                     (f'tum{t}', f'smooth{j}'),
                                     use_depthwise))
    for t in range(1, num_tums):
        m.update(_convbn_entries(f'reducers.{t - 1}', (f'reducer{t}',)))
    for s in range(num_scales):
        m[f'sfam.fc1.{s}'] = ('sfam', f'fc1_{s}')
        m[f'sfam.fc2.{s}'] = ('sfam', f'fc2_{s}')
    return m


def shared_predictor_reference_mapping(num_layers: int,
                                       num_levels: int,
                                       use_depthwise: bool = False,
                                       ) -> Dict[str, Tuple[str, ...]]:
    """SharedConvPredictor towers (detection/modules/predictors.py:8-76):
    per-head conv stacks shared across levels (``convs.{head}.{l}``,
    Conv2dBn/DepthwiseConv2dBn with use_bn=False) + per-level un-shared
    BatchNorms (``norms.{head}.{l}.{s}``).  Keys are relative to the
    predictor (``predictor.predictor.`` in a detector checkpoint)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for head in ('score', 'loc'):
        for l in range(num_layers):
            if use_depthwise:
                for leaf in ('depthwise_conv', 'pointwise_conv'):
                    m[f'convs.{head}.{l}.{leaf}'] = (f'{head}_conv{l}', leaf)
            else:
                m[f'convs.{head}.{l}.conv'] = (f'{head}_conv{l}', 'conv')
            for s in range(num_levels):
                m[f'norms.{head}.{l}.{s}'] = (f'{head}_norm{l}_{s}',)
    return m


def reference_detector_mapping(extras_spec,
                               num_scales: int,
                               use_depthwise: bool = False,
                               backbone_mapping: Dict[str, Tuple[str, ...]] = None,
                               fpn: Optional[dict] = None,
                               mlfpn: Optional[dict] = None,
                               predictor: Optional[dict] = None,
                               ) -> Dict[str, Tuple[str, ...]]:
    """FULL-detector mapping for a reference training checkpoint
    (``model_dict`` of detection/detector.py's Detector): backbone +
    neck (Features or FeaturePyramid) + SSD extras + optional
    SharedConvPredictor towers + score/loc heads.  Lets a reference-trained
    model be imported and served/fine-tuned by this framework (and the
    reverse, via :func:`export_state_dict`).

    Reference layout: ``predictor.features.base.<backbone>``,
    ``predictor.features.pyramid_{lateral,output}.*`` (FeaturePyramid),
    ``predictor.extras.{j}.{0,1}.<Conv2dBn|DepthwiseConv2dBn leaves>``
    (detector_builder.py:57-109), ``predictor.predictor.{convs,norms}.*``
    (SharedConvPredictor), ``predictor.heads.{i}.{score,loc}``
    (detector_builder.py:111-137).

    ``fpn``: ``{'num_laterals': n, 'pyramid_layers': m}`` when the neck is
    a FeaturePyramid.  ``predictor``: ``{'num_layers': l}`` (+ optional
    ``use_depthwise``) when SharedConvPredictor towers are configured —
    levels default to ``num_scales``.
    """
    if backbone_mapping is None:
        backbone_mapping = mobilenet_v2_reference_mapping()
    m: Dict[str, Tuple[str, ...]] = {}
    for k, path in backbone_mapping.items():
        # the reference's Features copies the backbone's ``features``
        # Sequential as its own ``base`` (features.py:18-44), so checkpoint
        # keys read ``predictor.features.base.{i}...`` without a second
        # ``features`` level
        k = k[len('features.'):] if k.startswith('features.') else k
        m[f'predictor.features.base.{k}'] = ('features', 'base') + tuple(path)
    if fpn:
        for k, path in fpn_reference_mapping(
                int(fpn['num_laterals']),
                int(fpn['pyramid_layers'])).items():
            m[f'predictor.features.{k}'] = ('features',) + tuple(path)
    if mlfpn:
        for k, path in mlfpn_reference_mapping(
                int(mlfpn['num_out_layers']),
                int(mlfpn['num_scales']),
                int(mlfpn['num_tums']),
                bool(mlfpn.get('use_depthwise', use_depthwise))).items():
            m[f'predictor.features.{k}'] = ('features',) + tuple(path)
    if predictor:
        for k, path in shared_predictor_reference_mapping(
                int(predictor['num_layers']),
                int(predictor.get('num_levels', num_scales)),
                bool(predictor.get('use_depthwise', use_depthwise))).items():
            m[f'predictor.predictor.{k}'] = ('predictor',) + tuple(path)
    for j, (type_, _out) in enumerate(extras_spec):
        if type_ == 'm':  # maxpool — no params
            continue
        m[f'predictor.extras.{j}.0.conv'] = (f'extra{j}', 'reduce', 'conv')
        m[f'predictor.extras.{j}.0.bn'] = (f'extra{j}', 'reduce', 'bn')
        if use_depthwise:
            for leaf in ('depthwise_conv', 'depthwise_bn',
                         'pointwise_conv', 'pointwise_bn'):
                m[f'predictor.extras.{j}.1.{leaf}'] = (f'extra{j}', 'expand',
                                                       leaf)
        else:
            m[f'predictor.extras.{j}.1.conv'] = (f'extra{j}', 'expand', 'conv')
            m[f'predictor.extras.{j}.1.bn'] = (f'extra{j}', 'expand', 'bn')
    for i in range(num_scales):
        m[f'predictor.heads.{i}.score'] = (f'score_head{i}',)
        m[f'predictor.heads.{i}.loc'] = (f'loc_head{i}',)
    return m


def reference_backbone_mapping(backbone: str) -> Dict[str, Tuple[str, ...]]:
    """Backbone half of a reference checkpoint, by reference registry name.

    Supported: the custom MobileNets (their own torch layouts), the
    torchvision VGGs (the reference's Features copies ``<backbone>.features``
    children directly, so checkpoint keys are the same indices minus the
    ``features.`` prefix), and the torchvision ResNet/ResNeXt family (the
    reference re-wraps those into an index-keyed Sequential,
    base_builder.py:10-26, which ``resnet_reference_mapping`` mirrors).
    SE-ResNet/SE-ResNeXt use pretrainedmodels' layer0-indexed layout and are
    not mapped — they raise here rather than import garbage.
    """
    if backbone.startswith('mobilenet_v2'):
        return mobilenet_v2_reference_mapping()
    # v1 registry names: 'mobilenet_v1' and width aliases 'mobilenet_<digits>'
    # ('mobilenet_10'/'075'/'05'/'025', backbones.py) — a bare 'mobilenet_'
    # prefix must NOT catch future variants (e.g. a v3) silently
    if backbone.startswith('mobilenet_v1') or (
            backbone.startswith('mobilenet_')
            and backbone[len('mobilenet_'):].isdigit()):
        return mobilenet_v1_mapping()
    if 'vgg' in backbone:
        from single_shot_detection_tpu.models.vgg import VGG_CONFIGS
        depth = int(''.join(ch for ch in backbone if ch.isdigit()))
        return vgg_mapping(VGG_CONFIGS[depth], bn=backbone.endswith('_bn'))
    # Anchored match: 'se_resnet50'/'se_resnext50_32x4d' must NOT fall in
    # here — their reference layout is the layer0-indexed senet wrapper,
    # not conv1/bn1, and a substring match would import garbage silently.
    import re
    m = re.match(r'(?:torchvision_)?(?:resnet|resnext)(\d+)', backbone)
    if m:
        from single_shot_detection_tpu.models.resnet import RESNET_CONFIGS
        return resnet_reference_mapping(RESNET_CONFIGS[int(m[1])]['layers'])
    raise KeyError(f'No reference-checkpoint mapping for backbone '
                   f'{backbone!r} (supported: mobilenet v1/v2, vgg, '
                   f'resnet/resnext)')


def import_reference_checkpoint(path: str,
                                variables: dict,
                                extras_spec,
                                num_scales: int,
                                use_depthwise: bool = False,
                                backbone: str = 'mobilenet_v2',
                                fpn: Optional[dict] = None,
                                mlfpn: Optional[dict] = None,
                                predictor: Optional[dict] = None) -> dict:
    """Load a reference training checkpoint (``ckpt-N.pt`` from
    /root/reference main.py — pickled global_state with ``model_dict``)
    into our detector variables."""
    mapping = reference_detector_mapping(
        extras_spec, num_scales, use_depthwise,
        backbone_mapping=reference_backbone_mapping(backbone),
        fpn=fpn, mlfpn=mlfpn, predictor=predictor)
    sd = load_torch_state_dict(path)
    # Belt-and-braces vs mapping gaps: any checkpoint tensor whose module
    # prefix the mapping never names would be silently dropped (the model
    # keeping its random init there) — report them loudly instead.
    unconsumed = sorted({k.rsplit('.', 1)[0] for k in sd
                         if k.rsplit('.', 1)[-1] in
                         ('weight', 'bias', 'running_mean', 'running_var')}
                        - set(mapping))
    if unconsumed:
        logging.warning(
            f'WW torch import: {len(unconsumed)} checkpoint modules have '
            f'no mapping entry and were NOT imported (model keeps its '
            f'init there): {unconsumed[:8]}...')
    return import_backbone(sd, variables, 'reference_detector',
                           base_path=(), mapping=mapping)


def invert_tensor(name: str, value: np.ndarray) -> np.ndarray:
    """Convert a single flax-layout array back to the torch layout
    (exact inverse of :func:`convert_tensor`)."""
    value = np.asarray(value)
    if value.dtype != np.float32:  # bf16 params aren't a numpy-native dtype
        value = value.astype(np.float32)
    if value.ndim == 4:
        # [kh, kw, in/groups, out] -> [out, in/groups, kh, kw]
        return value.transpose(3, 2, 0, 1)
    if value.ndim == 2:
        return value.transpose(1, 0)
    return value


def export_state_dict(variables: dict,
                      mapping: Dict[str, Tuple[str, ...]],
                      base_path: Tuple[str, ...] = (),
                      ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_backbone`: emit a torch-layout state_dict
    from our param tree, using the same mapping tables.

    BatchNorm leaves (``scale``/``bias`` + ``batch_stats`` mean/var) become
    ``weight``/``bias``/``running_mean``/``running_var`` (+
    ``num_batches_tracked``, required for ``strict=True`` loads); conv and
    linear kernels transpose back to ``[out, in, kh, kw]`` / ``[out, in]``.
    Mapping entries with no matching target leaf are skipped (logged) —
    coverage mirrors the importer's.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    batch_stats = jax.tree_util.tree_map(np.asarray,
                                         variables.get('batch_stats', {}))

    def get_subtree(tree, path):
        for k in path:
            if not isinstance(tree, dict) or k not in tree:
                return None
            tree = tree[k]
        return tree

    source_params = get_subtree(params, base_path)
    source_stats = get_subtree(batch_stats, base_path) or {}

    out: Dict[str, np.ndarray] = {}
    missing = []
    fabricated_stats = []
    for torch_prefix, our_path in mapping.items():
        leaf = get_subtree(source_params, our_path)
        if leaf is None:
            missing.append(torch_prefix)
            continue
        if 'scale' in leaf:  # BatchNorm
            out[f'{torch_prefix}.weight'] = invert_tensor(
                torch_prefix, leaf['scale'])
            out[f'{torch_prefix}.bias'] = invert_tensor(
                torch_prefix, leaf['bias'])
            stats_leaf = get_subtree(source_stats, our_path)
            if stats_leaf is None:
                # Identity stats keep strict torch loads working, but an
                # eval-mode torch model then normalizes differently from
                # the trained model — surface it, don't hide it.
                fabricated_stats.append(torch_prefix)
            mean = (stats_leaf['mean'] if stats_leaf is not None
                    else np.zeros_like(leaf['scale']))
            var = (stats_leaf['var'] if stats_leaf is not None
                   else np.ones_like(leaf['scale']))
            out[f'{torch_prefix}.running_mean'] = invert_tensor(
                torch_prefix, mean)
            out[f'{torch_prefix}.running_var'] = invert_tensor(
                torch_prefix, var)
            out[f'{torch_prefix}.num_batches_tracked'] = np.asarray(
                0, dtype=np.int64)
        elif 'kernel' in leaf:  # Conv / Linear
            out[f'{torch_prefix}.weight'] = invert_tensor(
                torch_prefix, leaf['kernel'])
            if 'bias' in leaf:
                out[f'{torch_prefix}.bias'] = invert_tensor(
                    torch_prefix, leaf['bias'])
        else:
            missing.append(torch_prefix)
    if missing:
        logging.warning(f'WW torch export: no source leaf for '
                        f'{missing[:5]}... ({len(missing)} total)')
    if fabricated_stats:
        logging.warning(
            f'WW torch export: fabricated identity running stats '
            f'(mean=0/var=1) for BatchNorms with no batch_stats leaf: '
            f'{fabricated_stats[:5]}... ({len(fabricated_stats)} total) '
            f'— the exported model will normalize differently in eval mode')
    logging.info(f'===> torch export: emitted {len(out)} tensors')
    return out


def export_reference_checkpoint(path: str,
                                variables: dict,
                                extras_spec,
                                num_scales: int,
                                use_depthwise: bool = False,
                                backbone: str = 'mobilenet_v2',
                                epoch: int = 0,
                                global_step: int = 0,
                                fpn: Optional[dict] = None,
                                mlfpn: Optional[dict] = None,
                                predictor: Optional[dict] = None) -> str:
    """Inverse of :func:`import_reference_checkpoint`: write a checkpoint
    the reference stack loads AS-IS (``torch.save`` of a global_state with
    ``model_dict`` — bf/training/callbacks.py:69-73, consumed by
    helpers.py:44-66) so a model trained on TPU can be served or
    fine-tuned by an existing torch deployment.  Scope mirrors the
    importer: all three reference model families — SSD, Retina, M2Det
    (backbone + Features/FeaturePyramid/MultilevelFeaturePyramid + extras
    + SharedConvPredictor towers + heads) — over the mobilenet/vgg/resnet
    backbones ``reference_backbone_mapping`` knows.
    """
    import torch
    mapping = reference_detector_mapping(
        extras_spec, num_scales, use_depthwise,
        backbone_mapping=reference_backbone_mapping(backbone),
        fpn=fpn, mlfpn=mlfpn, predictor=predictor)
    sd = export_state_dict(variables, mapping, base_path=())
    payload = {
        'model_dict': {k: torch.from_numpy(np.array(v))  # writable copy
                       for k, v in sd.items()},
        'epoch': int(epoch),
        'global_step': int(global_step),
    }
    torch.save(payload, path)
    logging.info(f'===> wrote reference-format checkpoint {path} '
                 f'({len(sd)} tensors)')
    return path


def mapping_args_from_config(model_cfg: dict) -> dict:
    """Derive :func:`import_reference_checkpoint` /
    :func:`export_reference_checkpoint` kwargs from a config's ``model``
    dict (the declarative schema both frameworks share) — so a reference
    checkpoint can be loaded/written given nothing but the config."""
    detector_cfg = dict(model_cfg.get('detector', {}))
    base_name = dict(model_cfg.get('base', {})).get('name', 'mobilenet_v2')
    backbone = base_name[len('torchvision_'):] \
        if base_name.startswith('torchvision_') else base_name
    extras_spec = tuple(dict(detector_cfg.get('extras', {}))
                        .get('layers', ()))
    features_cfg = dict(detector_cfg.get('features', {}))
    fpn = None
    mlfpn = None
    features_name = features_cfg.get('name', 'Features')
    if features_name == 'FeaturePyramid':
        fpn = {'num_laterals': len(features_cfg.get('out_layers', ())),
               'pyramid_layers': int(features_cfg['pyramid_layers'])}
    elif features_name == 'MultilevelFeaturePyramid':
        mlfpn = {'num_out_layers': len(features_cfg.get('out_layers', ())),
                 'num_scales': int(features_cfg['num_scales']),
                 'num_tums': int(features_cfg['num_tums'])}
    elif features_name not in (None, '', 'Features'):
        # An unknown neck (e.g. DepthwiseFeaturePyramid) would otherwise
        # proceed with NO neck mapping entries at all — the checkpoint's
        # neck keys would never be consulted and the model would silently
        # run with random neck weights.
        raise KeyError(
            f'No reference-checkpoint mapping for neck {features_name!r} '
            f"(supported: Features, FeaturePyramid, "
            f"MultilevelFeaturePyramid)")
    predictor_cfg = detector_cfg.get('predictor')
    predictor = ({'num_layers': int(predictor_cfg.get('num_layers', 0))}
                 if predictor_cfg else None)
    if fpn:
        num_sources = fpn['pyramid_layers']
    elif mlfpn:
        num_sources = mlfpn['num_scales']
    else:
        num_sources = len(features_cfg.get('out_layers', ()))
    num_scales = int(dict(model_cfg.get('anchor_generator', {})).get(
        'num_scales', num_sources + len(extras_spec)))
    return dict(extras_spec=extras_spec, num_scales=num_scales,
                use_depthwise=bool(detector_cfg.get('use_depthwise', False)),
                backbone=backbone, fpn=fpn, mlfpn=mlfpn,
                predictor=predictor)


def resolve_mapping(backbone_name: str) -> Dict[str, Tuple[str, ...]]:
    """torch state_dict prefix -> our param path, for any registry backbone."""
    if backbone_name.startswith('torchvision_vgg'):
        from single_shot_detection_tpu.models.vgg import VGG_CONFIGS
        depth = int(''.join(ch for ch in backbone_name if ch.isdigit()))
        return vgg_mapping(VGG_CONFIGS[depth],
                           bn=backbone_name.endswith('_bn'))
    if backbone_name.startswith('torchvision_resnet') or \
            backbone_name.startswith('torchvision_resnext'):
        from single_shot_detection_tpu.models.resnet import RESNET_CONFIGS
        depth = int(''.join(ch for ch in backbone_name.split('_')[1]
                            if ch.isdigit()))
        return resnet_mapping(RESNET_CONFIGS[depth]['layers'])
    if backbone_name in MAPPINGS:
        return MAPPINGS[backbone_name]()
    raise KeyError(f'No torch mapping for backbone {backbone_name!r}')


def import_backbone(state_dict: Dict[str, np.ndarray],
                    variables: dict,
                    backbone_name: str,
                    base_path: Tuple[str, ...] = ('features', 'base'),
                    mapping: Dict[str, Tuple[str, ...]] = None) -> dict:
    """Fill the backbone subtree of ``variables`` from a torch state_dict.

    Returns a new variables dict; unmatched target params keep their init
    (logged).  ``base_path`` locates the backbone inside the detector tree.
    An explicit ``mapping`` overrides the name-based resolution.
    """
    if mapping is None:
        mapping = resolve_mapping(backbone_name)

    import jax

    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    batch_stats = jax.tree_util.tree_map(np.asarray,
                                         variables.get('batch_stats', {}))

    def get_subtree(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    target_params = get_subtree(params, base_path)
    target_stats = get_subtree(batch_stats, base_path) if batch_stats else {}

    filled = 0
    missing = []
    for torch_prefix, our_path in mapping.items():
        w = state_dict.get(f'{torch_prefix}.weight')
        b = state_dict.get(f'{torch_prefix}.bias')
        rm = state_dict.get(f'{torch_prefix}.running_mean')
        rv = state_dict.get(f'{torch_prefix}.running_var')

        node = target_params
        ok = True
        for k in our_path[:-1]:
            if k not in node:
                ok = False
                break
            node = node[k]
        leaf_name = our_path[-1]
        if not ok or leaf_name not in node:
            if w is not None:
                missing.append(torch_prefix)
            continue
        leaf = node[leaf_name]

        if rm is not None:  # BatchNorm
            if w is not None:
                leaf['scale'] = convert_tensor(torch_prefix, w,
                                               leaf['scale'].shape)
            if b is not None:
                leaf['bias'] = convert_tensor(torch_prefix, b,
                                              leaf['bias'].shape)
            stats_node = target_stats
            for k in our_path[:-1]:
                stats_node = stats_node.get(k, {})
            stats_leaf = stats_node.get(leaf_name)
            if stats_leaf is not None:
                stats_leaf['mean'] = convert_tensor(torch_prefix, rm,
                                                    stats_leaf['mean'].shape)
                stats_leaf['var'] = convert_tensor(torch_prefix, rv,
                                                   stats_leaf['var'].shape)
            filled += 1
        else:  # Conv/Linear
            if w is not None:
                leaf['kernel'] = convert_tensor(torch_prefix, w,
                                                leaf['kernel'].shape)
                filled += 1
            if b is not None and 'bias' in leaf:
                leaf['bias'] = convert_tensor(torch_prefix, b,
                                              leaf['bias'].shape)

    if missing:
        logging.warning(f'WW torch import: no target for {missing[:5]}...'
                        f' ({len(missing)} total)')
    logging.info(f'===> torch import: filled {filled} modules into '
                 f'{"/".join(base_path)}')
    out = {'params': params}
    if batch_stats:
        out['batch_stats'] = batch_stats
    return out
