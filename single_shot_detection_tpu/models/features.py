"""Feature necks: plain taps, FPN, depthwise FPN, and M2Det's MLFPN
(flax.linen, NHWC).

Functional-parity targets: reference ``bf/modules/features.py`` —
``Features`` (:18-49), ``FeaturePyramid`` (:52-120, arXiv 1612.03144),
``DepthwiseFeaturePyramid`` (:123-212, arXiv 1807.11013),
``ThinnedUshapeModule``/``SFAM``/``MultilevelFeaturePyramid`` (:215-393,
M2Det).

Every neck's ``__call__(x, train)`` returns ``(sources, x)`` where ``sources``
is the list of per-scale NHWC feature maps (large -> small spatial) and ``x``
feeds the SSD extras chain.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from single_shot_detection_tpu.models.layers import (ConvBn, DepthwiseConvBn,
                                                     get_initializer)

# the reference initializes every neck conv xavier_normal by default and
# honors a config ``initializer`` dict (features.py:24,37,61,131,224,314)
xavier = nn.initializers.glorot_normal()


def interpolate(x: jnp.ndarray, size: Tuple[int, int], mode: str = 'nearest') -> jnp.ndarray:
    """Resize NHWC spatial dims (replaces torch ``F.interpolate``)."""
    method = {'nearest': 'nearest', 'bilinear': 'linear', 'linear': 'linear'}[mode]
    out_shape = (x.shape[0], size[0], size[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method=method)


class Features(nn.Module):
    """Backbone tap selector (parity: features.py:18-49).

    ``out_layers`` entries are stage indices or ``(stage, inner_name)`` tuples
    (e.g. ``(13, 'expand_relu')`` — torch_utils.py:7-37's sub-module taps).
    """

    base: nn.Module
    out_layers: Sequence
    last_feature_layer: Optional[int] = None

    def _max_stage(self):
        return self.last_feature_layer

    @nn.compact
    def __call__(self, x, train: bool = False):
        stages, aux = self.base(x, train=train, max_stage=self._max_stage())
        sources = []
        for layer in self.out_layers:
            if isinstance(layer, (tuple, list)):
                sources.append(aux[(layer[0], layer[1])])
            else:
                sources.append(stages[layer])
        return sources, stages[-1]


class FeaturePyramid(nn.Module):
    """FPN: 1x1 laterals + top-down adds + 3x3 output convs, extra stride-2
    levels beyond the backbone (parity: features.py:52-120)."""

    base: nn.Module
    out_layers: Sequence
    pyramid_layers: int
    pyramid_channels: int
    interpolation_mode: str = 'nearest'
    use_depthwise: bool = False
    activation: Optional[str] = 'ReLU'
    last_feature_layer: Optional[int] = None
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width_overrides: Any = None  # {'lateral': n, 'output': (n0, ...)} —
    #                               pruning-materialize narrow widths

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.pyramid_layers >= len(self.out_layers)
        stages, aux = self.base(x, train=train, max_stage=self.last_feature_layer)
        sources = [aux[tuple(l)] if isinstance(l, (tuple, list)) else stages[l]
                   for l in self.out_layers]

        kinit = get_initializer(self.initializer, xavier)
        ov = self.width_overrides or {}
        lateral_ch = ov.get('lateral', self.pyramid_channels)

        def out_ch(i):
            outs = ov.get('output')
            return outs[i] if outs and outs[i] else self.pyramid_channels

        feats = [nn.Conv(lateral_ch, (1, 1), kernel_init=kinit,
                         dtype=self.dtype, name=f'lateral{i}')(s)
                 for i, s in enumerate(sources)]

        for i in reversed(range(len(feats) - 1)):
            feats[i] = feats[i] + interpolate(feats[i + 1], feats[i].shape[1:3],
                                              self.interpolation_mode)

        outputs = []
        for i in range(self.pyramid_layers):
            extra = i >= len(feats)
            inp = outputs[-1] if extra else feats[i]
            # depthwise output convs flow their input's channel count
            width = inp.shape[-1] if self.use_depthwise else out_ch(i)
            outputs.append(ConvBn(width, kernel_size=3,
                                  stride=2 if extra else 1, padding=1,
                                  groups=inp.shape[-1] if self.use_depthwise
                                  else 1, activation=self.activation,
                                  kernel_init=kinit,
                                  axis_name=self.axis_name, dtype=self.dtype,
                                  name=f'output{i}')(inp, train))
        return outputs, outputs[-1]


class DepthwiseFeaturePyramid(nn.Module):
    """Lightweight dual-path FPN (parity: features.py:123-212, arXiv 1807.11013).

    Down path: per extra level, concat of (asym-pad maxpool2 -> 1x1 conv) and
    (depthwise 3x3 stride-2), each producing ``pyramid_channels // 2``.
    Up path: nearest-upsample + grouped 3x3 conv + lateral add.
    """

    base: nn.Module
    out_layers: Sequence
    pyramid_layers: int
    pyramid_channels: int
    interpolation_mode: str = 'nearest'
    activation: Optional[str] = 'ReLU'
    last_feature_layer: Optional[int] = None
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stages, aux = self.base(x, train=train, max_stage=self.last_feature_layer)
        sources = [aux[tuple(l)] if isinstance(l, (tuple, list)) else stages[l]
                   for l in self.out_layers]

        kinit = get_initializer(self.initializer, xavier)
        feats = [nn.Conv(self.pyramid_channels, (1, 1), kernel_init=kinit,
                         dtype=self.dtype, name=f'lateral{i}')(s)
                 for i, s in enumerate(sources)]

        half = self.pyramid_channels // 2
        for i in range(self.pyramid_layers - len(self.out_layers)):
            prev = feats[-1]
            # asymmetric (0,1) pad when the spatial dim is odd-capable (>2),
            # matching features.py:185-195
            pad_w = (0, 1) if prev.shape[2] > 2 else (0, 0)
            pad_h = (0, 1) if prev.shape[1] > 2 else (0, 0)
            padded = jnp.pad(prev, ((0, 0), pad_h, pad_w, (0, 0)),
                             constant_values=-jnp.inf)
            pooled = nn.max_pool(padded, (2, 2), strides=(2, 2))
            first = ConvBn(half, kernel_size=1, activation=self.activation,
                           kernel_init=kinit,
                           axis_name=self.axis_name, dtype=self.dtype,
                           name=f'down{i}_pool_conv')(pooled, train)
            second = DepthwiseConvBn(half, kernel_size=3, stride=2, padding=1,
                                     activation=self.activation,
                                     kernel_init=kinit,
                                     axis_name=self.axis_name, dtype=self.dtype,
                                     name=f'down{i}_dw')(prev, train)
            feats.append(jnp.concatenate([first, second], axis=-1))

        output = [feats[-1]]
        for i in reversed(range(len(feats) - 1)):
            up = interpolate(output[-1], feats[i].shape[1:3], self.interpolation_mode)
            up = ConvBn(self.pyramid_channels, kernel_size=3, padding=1,
                        groups=self.pyramid_channels, activation=self.activation,
                        kernel_init=kinit,
                        axis_name=self.axis_name, dtype=self.dtype,
                        name=f'up{i}')(up, train)
            output.append(up + feats[i])

        output = list(reversed(output))
        return output, output[-1]


class ThinnedUshapeModule(nn.Module):
    """M2Det TUM (parity: features.py:215-270).

    Returns per-scale outputs ordered deepest (small) -> shallowest (large).
    """

    inner_channels: int
    out_channels: int
    num_scales: int
    interpolation_mode: str = 'nearest'
    use_depthwise: bool = False
    activation: Optional[str] = 'ReLU'
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_op = DepthwiseConvBn if self.use_depthwise else ConvBn
        common = dict(activation=self.activation, axis_name=self.axis_name,
                      kernel_init=get_initializer(self.initializer, xavier),
                      dtype=self.dtype)

        down_path = [x]
        for i in range(1, self.num_scales):
            x = conv_op(self.inner_channels, kernel_size=3, stride=2, padding=1,
                        name=f'down{i}', **common)(x, train)
            down_path.append(x)

        up_path = [x]
        for i in reversed(range(1, self.num_scales)):
            skip = down_path[i - 1]
            x = conv_op(skip.shape[-1], kernel_size=1, name=f'up{i}', **common)(x, train)
            x = interpolate(x, skip.shape[1:3], self.interpolation_mode)
            x = x + skip
            up_path.append(x)

        # smooth layers applied deepest-first (features.py:268)
        out = []
        for i, feat in enumerate(up_path):
            out.append(conv_op(self.out_channels, kernel_size=1,
                               name=f'smooth{self.num_scales - 1 - i}',
                               **common)(feat, train))
        return out


class ScalewiseFeatureAggregationModule(nn.Module):
    """M2Det SFAM: per-scale squeeze-excite gates (parity: features.py:273-300)."""

    num_scales: int
    reduction_ratio: int = 16
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}

    @nn.compact
    def __call__(self, features):
        assert len(features) == self.num_scales
        # reference: MLFPN's init_layer sweeps the SFAM convs too
        # (features.py:365), xavier_normal by default
        kinit = get_initializer(self.initializer, xavier)
        result = []
        for i, feature in enumerate(features):
            channels = feature.shape[-1]
            g = jnp.mean(feature, axis=(1, 2), keepdims=True)
            g = nn.Conv(channels // self.reduction_ratio, (1, 1),
                        kernel_init=kinit, name=f'fc1_{i}')(g)
            g = nn.relu(g)
            g = nn.Conv(channels, (1, 1), kernel_init=kinit, name=f'fc2_{i}')(g)
            g = nn.sigmoid(g)
            result.append(feature * g)
        return result


class MultilevelFeaturePyramid(nn.Module):
    """M2Det MLFPN (parity: features.py:303-393).

    Two base reducers -> upscale+concat base feature; a chain of ``num_tums``
    TUMs each fed ``[prev-TUM-shallowest || reduced base]``; per-scale concat
    over TUM outputs -> SFAM gates.  Output order: large -> small spatial.
    """

    base: nn.Module
    out_layers: Sequence
    num_scales: int
    num_tums: int
    base_reduced_channels: Sequence[int] = (256, 512)
    reduced_channels: int = 128
    interpolation_mode: str = 'nearest'
    use_depthwise: bool = False
    activation: Optional[str] = 'ReLU'
    tum: Any = None
    sfam: Any = None
    last_feature_layer: Optional[int] = None
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, tum_range=None,
                 stage_state=None):
        """``tum_range=(a, b)`` runs a SEGMENT of the forward for pipeline
        parallelism (parallel/pipeline.py, >2 stages): ``a == 0`` includes
        the backbone + base-feature prep, ``b == num_tums`` includes the
        final concat + SFAM (returning the ordinary ``(features, last)``);
        interior segments take/return an opaque ``(base_features,
        per-scale outputs so far)`` state.  Module names are identical in
        segmented and full execution (everything here is explicitly
        named), so one variable tree serves both."""
        assert len(self.out_layers) == len(self.base_reduced_channels)
        assert self.num_tums > 0
        tum_cfg = dict(self.tum or {'inner_channels': 256, 'out_channels': 128})
        sfam_cfg = dict(self.sfam or {})

        a, b = (0, self.num_tums) if tum_range is None else tum_range
        assert 0 <= a <= b <= self.num_tums

        common = dict(activation=self.activation, axis_name=self.axis_name,
                      kernel_init=get_initializer(self.initializer, xavier),
                      dtype=self.dtype)

        if a == 0:
            stages, aux = self.base(x, train=train,
                                    max_stage=self.last_feature_layer)
            sources = [aux[tuple(l)] if isinstance(l, (tuple, list))
                       else stages[l] for l in self.out_layers]
            reduced = [ConvBn(c, kernel_size=1, name=f'base_reducer{i}',
                              **common)(s, train)
                       for i, (s, c) in enumerate(
                           zip(sources, self.base_reduced_channels))]

            upscaled = [reduced[0]] + [interpolate(r, reduced[0].shape[1:3],
                                                   self.interpolation_mode)
                                       for r in reduced[1:]]
            base_features = jnp.concatenate(upscaled, axis=-1)
            per_scale = None
        else:
            base_features, per_scale_t = stage_state
            per_scale = [list(fs) for fs in per_scale_t]

        make_tum = lambda i: ThinnedUshapeModule(
            num_scales=self.num_scales,
            interpolation_mode=self.interpolation_mode,
            use_depthwise=self.use_depthwise,
            activation=self.activation, initializer=self.initializer,
            axis_name=self.axis_name,
            dtype=self.dtype, name=f'tum{i}',
            **{k: v for k, v in tum_cfg.items()
               if k in ('inner_channels', 'out_channels')})

        for i in range(a, b):
            if i == 0:
                per_scale = [[f] for f in make_tum(0)(base_features, train)]
                continue
            shallowest = per_scale[-1][-1]
            red = ConvBn(self.reduced_channels, kernel_size=1,
                         name=f'reducer{i}', **common)(base_features, train)
            tum_in = jnp.concatenate([shallowest, red], axis=-1)
            for s, feat in enumerate(make_tum(i)(tum_in, train)):
                per_scale[s].append(feat)

        if tum_range is not None and b < self.num_tums:
            # interior pipeline segment: hand the chain state onward
            return base_features, tuple(tuple(fs) for fs in per_scale)

        features = [jnp.concatenate(fs, axis=-1) for fs in reversed(per_scale)]
        features = ScalewiseFeatureAggregationModule(
            num_scales=self.num_scales,
            reduction_ratio=sfam_cfg.get('reduction_ratio', 16),
            initializer=self.initializer,
            name='sfam')(features)
        return features, features[-1]


NECKS = {
    'Features': Features,
    'FeaturePyramid': FeaturePyramid,
    'DepthwiseFeaturePyramid': DepthwiseFeaturePyramid,
    'MultilevelFeaturePyramid': MultilevelFeaturePyramid,
}
