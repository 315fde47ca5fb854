"""ResNet / ResNeXt backbones (flax, NHWC) with the reference's wrapper
stage indexing.

Functional-parity target: torchvision resnet18/34/50/101/152 and
resnext50_32x4d / resnext101_32x8d as wrapped by the reference
(``bf/builders/base_builder.py:10-26`` ``_resnet_wrapper``):
``stages = [conv1, bn1, relu, maxpool, layer1, layer2, layer3, layer4]`` —
so configs like retina_rn50's ``out_layers (5, 6, 7)`` tap C3/C4/C5.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width1: Optional[int] = None      # pruning-materialize: conv1 out
    out_width: Optional[int] = None   # pruning-materialize: block out

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                axis_name=self.axis_name if train else None,
                                dtype=self.dtype, name=name)

        identity = x
        w1 = self.width1 or self.features
        w_out = self.out_width or self.features
        out = nn.Conv(w1, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.relu(bn('bn1')(out))
        out = nn.Conv(w_out, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = bn('bn2')(out)
        if self.downsample:
            identity = nn.Conv(w_out, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = bn('downsample_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # output channels = features * 4
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width1: Optional[int] = None      # pruning-materialize: conv1 out
    width2: Optional[int] = None      # pruning-materialize: conv2 out
    out_width: Optional[int] = None   # pruning-materialize: block out

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                axis_name=self.axis_name if train else None,
                                dtype=self.dtype, name=name)

        width = int(self.features * (self.base_width / 64.0)) * self.groups
        w1 = self.width1 or width
        w2 = self.width2 or width
        w_out = self.out_width or self.features * self.expansion
        identity = x
        out = nn.Conv(w1, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.relu(bn('bn1')(out))
        out = nn.Conv(w2, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), feature_group_count=self.groups,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = nn.relu(bn('bn2')(out))
        out = nn.Conv(w_out, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = bn('bn3')(out)
        if self.downsample:
            identity = nn.Conv(w_out, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = bn('downsample_bn')(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """8-stage feature extractor matching the reference wrapper indexing."""

    block: str = 'bottleneck'  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width_overrides: Any = None  # {block_name: {'conv1','conv2','out'}} —
    #                               pruning-materialize narrow widths

    num_stages = 8

    @nn.compact
    def __call__(self, x, train: bool = False, max_stage: Optional[int] = None):
        last = self.num_stages - 1 if max_stage is None else max_stage
        stages = []

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        stages.append(x)
        if last <= 0:
            return stages, {}
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name='bn1')(x)
        stages.append(x)
        if last <= 1:
            return stages, {}
        x = nn.relu(x)
        stages.append(x)
        if last <= 2:
            return stages, {}
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages.append(x)
        if last <= 3:
            return stages, {}

        block_cls = Bottleneck if self.block == 'bottleneck' else BasicBlock
        expansion = 4 if self.block == 'bottleneck' else 1
        in_features = 64
        for i, (features, count) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if i == 0 else 2
            for j in range(count):
                name = f'layer{i + 1}_{j}'
                kwargs = dict(features=features,
                              stride=stride if j == 0 else 1,
                              downsample=(j == 0 and
                                          (stride != 1 or
                                           in_features != features * expansion)),
                              axis_name=self.axis_name, dtype=self.dtype,
                              name=name)
                if self.block == 'bottleneck':
                    kwargs.update(groups=self.groups,
                                  base_width=self.width_per_group)
                if self.width_overrides and name in self.width_overrides:
                    ov = self.width_overrides[name]
                    kwargs['width1'] = ov.get('conv1')
                    kwargs['out_width'] = ov.get('out')
                    if self.block == 'bottleneck':
                        kwargs['width2'] = ov.get('conv2')
                x = block_cls(**kwargs)(x, train)
                in_features = features * expansion
            stages.append(x)
            if last <= 4 + i:
                return stages, {}
        return stages, {}


RESNET_CONFIGS = {
    18: dict(block='basic', layers=(2, 2, 2, 2)),
    34: dict(block='basic', layers=(3, 4, 6, 3)),
    50: dict(block='bottleneck', layers=(3, 4, 6, 3)),
    101: dict(block='bottleneck', layers=(3, 4, 23, 3)),
    152: dict(block='bottleneck', layers=(3, 8, 36, 3)),
}


class SEBlock(nn.Module):
    """Squeeze-and-excitation gate (for the pretrainedmodels se_* variants
    the reference exposes optionally, bf/base/__init__.py:28-39)."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(channels // self.reduction, (1, 1), dtype=self.dtype,
                    name='fc1')(g)
        g = nn.relu(g)
        g = nn.Conv(channels, (1, 1), dtype=self.dtype, name='fc2')(g)
        return x * nn.sigmoid(g)


class SEBottleneck(Bottleneck):
    """Bottleneck with an SE gate before the residual add."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                axis_name=self.axis_name if train else None,
                                dtype=self.dtype, name=name)

        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = nn.relu(bn('bn1')(out))
        out = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), feature_group_count=self.groups,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = nn.relu(bn('bn2')(out))
        out = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = bn('bn3')(out)
        out = SEBlock(reduction=self.reduction, dtype=self.dtype,
                      name='se')(out)
        if self.downsample:
            identity = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = bn('downsample_bn')(identity)
        return nn.relu(out + identity)


class SEResNet(nn.Module):
    """SE-ResNet with the reference's _senet_wrapper 5-stage indexing:
    stages = [layer0 (stem), layer1..layer4] (base_builder.py:44-57)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    num_stages = 5

    @nn.compact
    def __call__(self, x, train: bool = False, max_stage: Optional[int] = None):
        last = self.num_stages - 1 if max_stage is None else max_stage
        stages = []

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages.append(x)  # layer0
        if last <= 0:
            return stages, {}

        in_features = 64
        for i, (features, count) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if i == 0 else 2
            for j in range(count):
                x = SEBottleneck(features=features,
                                 stride=stride if j == 0 else 1,
                                 downsample=(j == 0 and
                                             (stride != 1 or
                                              in_features != features * 4)),
                                 groups=self.groups,
                                 base_width=self.width_per_group,
                                 axis_name=self.axis_name, dtype=self.dtype,
                                 name=f'layer{i + 1}_{j}')(x, train)
                in_features = features * 4
            stages.append(x)
            if last <= 1 + i:
                return stages, {}
        return stages, {}
