"""MobileNet v1 backbone (flax, NHWC).

Functional-parity target: reference ``bf/base/mobilenet.py:7-149`` — the
TF-flavored MobileNet: 14-stage ``features`` (conv_bn then 13 depthwise-
separable blocks), ReLU6, TF-asymmetric ZeroPad (0,1,0,1) on stride-2 convs,
width multiplier with min_depth.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from single_shot_detection_tpu.models.layers import (
    tf_same_pad, xavier_uniform as _xavier_uniform)


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


# (features, stride) for the 13 depthwise-separable stages 1..13
_MBV1_STAGES = [
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
    (1024, 2), (1024, 1),
]


class _SeparableBlock(nn.Module):
    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                axis_name=self.axis_name if train else None,
                                dtype=self.dtype, name=name)

        x = nn.Conv(x.shape[-1], (3, 3), strides=(self.stride,) * 2,
                    padding=tf_same_pad(3, self.stride),
                    feature_group_count=x.shape[-1], use_bias=False, kernel_init=_xavier_uniform,
                    dtype=self.dtype, name='depthwise_conv')(x)
        x = _relu6(bn('depthwise_bn')(x))
        x = nn.Conv(self.features, (1, 1), use_bias=False, kernel_init=_xavier_uniform, dtype=self.dtype,
                    name='pointwise_conv')(x)
        return _relu6(bn('pointwise_bn')(x))


class MobileNet(nn.Module):
    """14-stage MobileNet v1 feature extractor."""

    depth_multiplier: float = 1.0
    min_depth: int = 4
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width_overrides: Any = None  # {stage: width} — pruning-materialize

    num_stages = 14

    def depth(self, d: int) -> int:
        return max(int(d * self.depth_multiplier), self.min_depth)

    def _width(self, stage: int, default: int) -> int:
        if self.width_overrides and stage in self.width_overrides:
            return self.width_overrides[stage]
        return default

    @nn.compact
    def __call__(self, x, train: bool = False, max_stage: Optional[int] = None):
        last = self.num_stages - 1 if max_stage is None else max_stage
        stages = []

        x = nn.Conv(self._width(0, self.depth(32)), (3, 3), strides=(2, 2),
                    padding=tf_same_pad(3, 2), use_bias=False, kernel_init=_xavier_uniform,
                    dtype=self.dtype, name='stage0_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name='stage0_bn')(x)
        x = _relu6(x)
        stages.append(x)

        for i, (features, stride) in enumerate(_MBV1_STAGES, start=1):
            if i > last:
                return stages, {}
            x = _SeparableBlock(self._width(i, self.depth(features)), stride,
                                axis_name=self.axis_name, dtype=self.dtype,
                                name=f'stage{i}')(x, train)
            stages.append(x)
        return stages, {}
