"""MobileNetV2 backbone (flax.linen, NHWC).

Functional-parity target: reference ``bf/base/mobilenet_v2.py`` — the custom
TF-flavored MobileNetV2: inverted-residual bottlenecks with
expand/depthwise/project, residual iff same-shape stride-1, TF-style
asymmetric ZeroPad (0,1,0,1) on stride-2 convs, ReLU6, and a 19-stage
``features`` sequence whose indices are the public tap points used by configs
(e.g. ``out_layers=(13, 18)``).

The stage indexing (0..18) is preserved exactly so sample configs carry over
unchanged.  Inner tap names (``expand_relu`` — used by ssd_mb2_coco's
``[13, 'expand_relu']``) are exposed via the ``aux`` outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from single_shot_detection_tpu.models.layers import (
    tf_same_pad, xavier_uniform as _xavier_uniform)


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _ConvBn(nn.Module):
    """conv + BN + ReLU6 with TF-asymmetric stride-2 padding
    (parity: mobilenet_v2.py:7-30 ``_conv_bn``)."""

    features: int
    kernel_size: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=tf_same_pad(self.kernel_size, self.stride),
                    use_bias=False, kernel_init=_xavier_uniform, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name='bn')(x)
        return _relu6(x)


class InvertedResidual(nn.Module):
    """Inverted-residual bottleneck (parity: mobilenet_v2.py:33-81).

    Returns ``(out, aux)`` where ``aux['expand_relu']`` is the post-expansion
    activation — the inner tap point configs can address.
    """

    features: int
    stride: int
    expansion_ratio: int
    inner_features: Optional[int] = None  # pruning-materialize override
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        in_features = x.shape[-1]
        inner = (self.inner_features if self.inner_features is not None
                 else in_features * self.expansion_ratio)
        residual = in_features == self.features and self.stride == 1
        aux = {}

        h = x
        # structure follows the expansion ratio; widths may be overridden
        if self.expansion_ratio > 1:
            h = nn.Conv(inner, (1, 1), use_bias=False, kernel_init=_xavier_uniform, dtype=self.dtype,
                        name='expand_conv')(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             axis_name=self.axis_name if train else None,
                             dtype=self.dtype, name='expand_bn')(h)
            h = _relu6(h)
            aux['expand_relu'] = h

        h = nn.Conv(inner, (3, 3), strides=(self.stride, self.stride),
                    padding=tf_same_pad(3, self.stride),
                    feature_group_count=inner, use_bias=False, kernel_init=_xavier_uniform,
                    dtype=self.dtype, name='depthwise_conv')(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name='depthwise_bn')(h)
        h = _relu6(h)

        h = nn.Conv(self.features, (1, 1), use_bias=False, kernel_init=_xavier_uniform, dtype=self.dtype,
                    name='project_conv')(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name='project_bn')(h)
        return (x + h if residual else h), aux


# (features, stride, expansion) per stage 1..17; stage 0 and 18 are _ConvBn.
_MBV2_STAGES = [
    (16, 1, 1),
    (24, 2, 6), (24, 1, 6),
    (32, 2, 6), (32, 1, 6), (32, 1, 6),
    (64, 2, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6),
    (96, 1, 6), (96, 1, 6), (96, 1, 6),
    (160, 2, 6), (160, 1, 6), (160, 1, 6),
    (320, 1, 6),
]


class MobileNetV2(nn.Module):
    """19-stage MobileNetV2 feature extractor (parity: mobilenet_v2.py:84-134).

    ``__call__`` returns ``(stages, aux)``: ``stages[i]`` is the output of
    feature stage ``i`` (0..18), ``aux[(i, name)]`` holds inner taps.
    """

    depth_multiplier: float = 1.0
    min_depth: int = 4
    width_overrides: Any = None  # {stage: {'features': n, 'inner': n}} —
    #                               pruning-materialize narrow widths
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    num_stages = 19

    def depth(self, d: int) -> int:
        return max(int(d * self.depth_multiplier), self.min_depth)

    def _width(self, stage: int, default: int, key: str = 'features') -> int:
        if self.width_overrides and stage in self.width_overrides:
            return self.width_overrides[stage].get(key, default) or default
        return default

    def _inner(self, stage: int):
        if self.width_overrides and stage in self.width_overrides:
            return self.width_overrides[stage].get('inner')
        return None

    @nn.compact
    def __call__(self, x, train: bool = False, max_stage: Optional[int] = None):
        last = self.num_stages - 1 if max_stage is None else max_stage
        stages = []
        aux = {}
        x = _ConvBn(self._width(0, self.depth(32)), 3, stride=2,
                    axis_name=self.axis_name,
                    dtype=self.dtype, name='stage0')(x, train)
        stages.append(x)
        for i, (f, s, e) in enumerate(_MBV2_STAGES, start=1):
            if i > last:
                return stages, aux
            x, block_aux = InvertedResidual(self._width(i, self.depth(f)), s, e,
                                            inner_features=self._inner(i),
                                            axis_name=self.axis_name,
                                            dtype=self.dtype,
                                            name=f'stage{i}')(x, train)
            stages.append(x)
            for k, v in block_aux.items():
                aux[(i, k)] = v
        if last >= 18:
            x = _ConvBn(self._width(18, self.depth(1280)), 1,
                        axis_name=self.axis_name,
                        dtype=self.dtype, name='stage18')(x, train)
            stages.append(x)
        return stages, aux
