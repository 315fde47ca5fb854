"""Backbone registry.

Functional-parity target: reference ``bf/base/__init__.py`` — a flat
``name -> ctor`` namespace covering torchvision classics plus custom
MobileNets at several width multipliers.

Every backbone is a flax module with the contract
``__call__(x, train=False, max_stage=None) -> (stages, aux)`` where
``stages[i]`` is the output of public feature stage ``i`` (the index space
sample configs use for ``out_layers``) and ``aux[(i, name)]`` holds named
inner taps.

``torchvision_*`` names map to our JAX implementations with the same stage
indexing, so sample configs carry over unchanged.  Pretrained torchvision
weights can be imported from a torch checkpoint via utils/torch_import.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str, factory: Callable):
    _REGISTRY[name] = factory


def get(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f'Unknown backbone: {name!r}. '
                       f'Available: {sorted(_REGISTRY)}')
    return _REGISTRY[name]


def available():
    return sorted(_REGISTRY)


def _register_all():
    from single_shot_detection_tpu.models.mobilenet_v2 import MobileNetV2

    def mbv2(depth_multiplier=1.0, **kwargs):
        kwargs = {k: v for k, v in kwargs.items()
                  if k in ('axis_name', 'dtype', 'min_depth')}
        return MobileNetV2(depth_multiplier=depth_multiplier, **kwargs)

    register('mobilenet_v2', mbv2)
    register('torchvision_mobilenet_v2', mbv2)
    # custom width multipliers (parity: base/__init__.py:46-54 —
    # reference names use '050'; '05' kept as a compat alias)
    for mult, suffix in [(1.0, '10'), (0.75, '075'), (0.5, '050'),
                         (0.5, '05'), (0.35, '035')]:
        register(f'mobilenet_v2_{suffix}',
                 functools.partial(mbv2, depth_multiplier=mult))

    try:
        from single_shot_detection_tpu.models.mobilenet import MobileNet

        def mbv1(depth_multiplier=1.0, **kwargs):
            kwargs = {k: v for k, v in kwargs.items()
                      if k in ('axis_name', 'dtype', 'min_depth')}
            return MobileNet(depth_multiplier=depth_multiplier, **kwargs)

        register('mobilenet_v1', mbv1)
        for mult, suffix in [(1.0, '10'), (0.75, '075'), (0.5, '050'),
                             (0.5, '05'), (0.25, '025')]:
            register(f'mobilenet_{suffix}',
                     functools.partial(mbv1, depth_multiplier=mult))
    except ImportError:
        pass

    try:
        from single_shot_detection_tpu.models.vgg import VGG, VGG_CONFIGS

        for depth in (11, 13, 16, 19):
            for bn in (False, True):
                name = f'torchvision_vgg{depth}' + ('_bn' if bn else '')
                register(name, functools.partial(
                    lambda depth, bn, **kw: VGG(
                        config=VGG_CONFIGS[depth], use_bn=bn,
                        **{k: v for k, v in kw.items()
                           if k in ('axis_name', 'dtype', 'packed_stem')}),
                    depth, bn))
    except ImportError:
        pass

    try:
        from single_shot_detection_tpu.models.resnet import ResNet, RESNET_CONFIGS

        for depth in (18, 34, 50, 101, 152):
            register(f'torchvision_resnet{depth}', functools.partial(
                lambda depth, **kw: ResNet(
                    **RESNET_CONFIGS[depth],
                    **{k: v for k, v in kw.items() if k in ('axis_name', 'dtype')}),
                depth))
        for depth, groups, width in [(50, 32, 4), (101, 32, 8)]:
            register(f'torchvision_resnext{depth}_{groups}x{width}d',
                     functools.partial(
                         lambda depth, groups, width, **kw: ResNet(
                             **RESNET_CONFIGS[depth], groups=groups,
                             width_per_group=width,
                             **{k: v for k, v in kw.items() if k in ('axis_name', 'dtype')}),
                         depth, groups, width))
    except ImportError:
        pass

    try:
        from single_shot_detection_tpu.models.resnet import SEResNet

        for name, depth_layers in [('se_resnet50', (3, 4, 6, 3)),
                                   ('se_resnet101', (3, 4, 23, 3)),
                                   ('se_resnet152', (3, 8, 36, 3))]:
            register(f'pretrainedmodels_{name}', functools.partial(
                lambda layers, **kw: SEResNet(
                    layers=layers,
                    **{k: v for k, v in kw.items() if k in ('axis_name', 'dtype')}),
                depth_layers))
        for name, layers, groups, width in [
                ('se_resnext50_32x4d', (3, 4, 6, 3), 32, 4),
                ('se_resnext101_32x4d', (3, 4, 23, 3), 32, 4)]:
            register(f'pretrainedmodels_{name}', functools.partial(
                lambda layers, groups, width, **kw: SEResNet(
                    layers=layers, groups=groups, width_per_group=width,
                    **{k: v for k, v in kw.items() if k in ('axis_name', 'dtype')}),
                layers, groups, width))
    except ImportError:
        pass

    try:
        from single_shot_detection_tpu.models.shufflenet_v2 import ShuffleNetV2, SHUFFLENET_WIDTHS

        for mult, suffix in [(0.5, 'x0_5'), (1.0, 'x1_0'), (1.5, 'x1_5'), (2.0, 'x2_0')]:
            register(f'torchvision_shufflenet_v2_{suffix}', functools.partial(
                lambda mult, **kw: ShuffleNetV2(
                    channels=SHUFFLENET_WIDTHS[mult],
                    **{k: v for k, v in kw.items() if k in ('axis_name', 'dtype')}),
                mult))
    except ImportError:
        pass


_register_all()
