"""Detector assembly: extras, shared predictor towers, heads (flax, NHWC).

Functional-parity targets: reference ``detection/detector.py`` (Predictor /
Detector), ``detection/detector_builder.py:57-137`` (extras/heads specs) and
``detection/modules/predictors.py`` (SharedConvPredictor).

TPU-first choices:
  * NHWC throughout — head outputs are already ``[B, H, W, boxes*C]`` so the
    reference's permute+contiguous (detector.py:55-62) disappears; a single
    reshape yields ``[B, H*W*boxes, C]`` in exactly the anchor order.
  * anchors are not generated in the forward pass — they are trace-time
    constants produced by the builder from static feature-map shapes
    (see ops/anchors.py), so the jitted program carries them for free.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from single_shot_detection_tpu.models.layers import (ConvBn, DepthwiseConvBn,
                                                     get_initializer)

head_kernel_init = nn.initializers.normal(stddev=0.01)
xavier = nn.initializers.glorot_normal()


class ExtraLayer(nn.Module):
    """One SSD extra-scale block from a spec tuple (parity:
    detector_builder.py:57-109 ``get_extras``).

    type 'm': 3x3/2 maxpool (channels preserved);
    type 's': 1x1 reduce to out//2, then 3x3/2 conv to out;
    type '':  1x1 reduce to out//2, then 3x3 valid conv to out.
    """

    type: str
    out_channels: int
    use_depthwise: bool = False
    reduce_features: Optional[int] = None  # pruning-materialize override
    activation: Optional[str] = 'ReLU'
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # parity: the reference initializes every extras conv with a config
        # initializer, xavier_normal + zero bias by default
        # (detector_builder.py:61,100-107)
        common = dict(activation=self.activation, axis_name=self.axis_name,
                      dtype=self.dtype,
                      kernel_init=get_initializer(self.initializer, xavier))
        reduce_f = (self.reduce_features if self.reduce_features is not None
                    else self.out_channels // 2)
        if self.type == 'm':
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.type == 's':
            x = ConvBn(reduce_f, kernel_size=1, name='reduce',
                       **common)(x, train)
            conv_op = DepthwiseConvBn if self.use_depthwise else ConvBn
            return conv_op(self.out_channels, kernel_size=3, stride=2,
                           padding=1, name='expand', **common)(x, train)
        if self.type == '':
            x = ConvBn(reduce_f, kernel_size=1, name='reduce',
                       **common)(x, train)
            conv_op = DepthwiseConvBn if self.use_depthwise else ConvBn
            return conv_op(self.out_channels, kernel_size=3, padding=0,
                           name='expand', **common)(x, train)
        raise ValueError(f'Unknown layer type: {self.type}')


class SharedConvPredictor(nn.Module):
    """RetinaNet-style conv towers: convs shared across pyramid levels,
    BatchNorms un-shared per level (parity: predictors.py:8-76)."""

    num_layers: int = 0
    num_channels: int = 256
    kernel_size: int = 3
    use_depthwise: bool = False
    activation: str = 'ReLU'
    initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sources, train: bool = False):
        from single_shot_detection_tpu.models.layers import ACTIVATIONS
        act = ACTIVATIONS[self.activation]
        # parity: the reference's tower convs default to normal(std=0.01)
        # + zero bias (predictors.py:19,51-55)
        kinit = get_initializer(self.initializer, head_kernel_init)

        outputs = {}
        for head in ('score', 'loc'):
            feats = list(sources)
            for layer in range(self.num_layers):
                if self.use_depthwise:
                    conv = DepthwiseConvBn(self.num_channels,
                                           kernel_size=self.kernel_size,
                                           padding=1, use_bias=True,
                                           use_bn=False, activation=None,
                                           kernel_init=kinit,
                                           dtype=self.dtype,
                                           name=f'{head}_conv{layer}')
                else:
                    conv = ConvBn(self.num_channels, kernel_size=self.kernel_size,
                                  padding=1, use_bias=True, use_bn=False,
                                  activation=None, kernel_init=kinit,
                                  dtype=self.dtype,
                                  name=f'{head}_conv{layer}')
                new_feats = []
                for level, f in enumerate(feats):
                    f = conv(f, train)  # same module -> shared params
                    f = act(f)
                    f = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9,
                                     axis_name=self.axis_name if train else None,
                                     dtype=self.dtype,
                                     name=f'{head}_norm{layer}_{level}')(f)
                    new_feats.append(f)
                feats = new_feats
            outputs[head] = feats
        return outputs['score'], outputs['loc']


def tum_stage_chunks(num_tums: int, n_stages: int):
    """Split a TUM chain into per-pipeline-stage ``(a, b)`` segments.

    Even spread, remainder to the EARLY stages (the last stage also runs
    SFAM + extras + predictor + heads, so it gets the short straw).  The
    first segment must be non-empty (stage 0 owns the base-feature prep
    the first TUM consumes)."""
    if n_stages < 2:
        raise ValueError(f'n_stages must be >= 2, got {n_stages}')
    base, rem = divmod(num_tums, n_stages)
    sizes = [base + (1 if i < rem else 0) for i in range(n_stages)]
    if sizes[0] == 0:
        raise ValueError(
            f'{n_stages} pipeline stages need at least {n_stages - 1} TUMs '
            f'(got {num_tums})')
    bounds = []
    start = 0
    for s in sizes:
        bounds.append((start, start + s))
        start += s
    return bounds


class Detector(nn.Module):
    """features -> extras -> [predictor towers] -> per-scale heads ->
    concatenated ``(scores [B, A, C], locs [B, A, 4])``
    (parity: detector.py:8-96 Predictor/Detector forward).
    """

    features: nn.Module
    num_classes: int
    extras: Sequence[Tuple[str, int]] = ()
    num_boxes: Sequence[int] = ()
    use_depthwise: bool = False
    predictor: Optional[dict] = None
    score_head_bias_init: float = 0.0
    extras_initializer: Any = None  # reference-style {'name': ..., 'args': ...}
    head_initializer: Any = None    # reference-style {'name': ..., 'args': ...}
    extras_overrides: Any = None  # per-extra {'reduce': n, 'out': n} widths
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    # score/loc head conv dtype; None = follow ``dtype``.  Running the heads
    # in f32 under a bf16 policy keeps the logits (and therefore the loss
    # gradients and hard-negative-mining ranks) at full precision for a
    # negligible FLOP cost — the mixed-precision "keep the ends wide" recipe.
    head_dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_sources: bool = False,
                 stage: Optional[int] = None, stage_state=None,
                 n_stages: int = 2):
        """``stage`` exposes the pipeline-parallel seam
        (parallel/pipeline.py).  With ``n_stages=2`` (default): ``stage=0``
        runs only the backbone/neck and returns ``(sources, x)``;
        ``stage=1`` consumes that tuple via ``stage_state`` and runs
        extras/predictor/heads.  With ``n_stages > 2`` (M2Det's deep TUM
        chain — needs a MultilevelFeaturePyramid neck) the chain is split
        into per-stage TUM segments: stage 0 = backbone + base prep +
        first segment, interior stages = TUM segments, last stage = final
        segment + SFAM + extras/predictor/heads.  ``stage=None`` (default)
        is the ordinary full forward.  Parameter names are identical in
        all modes (every submodule here is explicitly named), so one
        variable tree serves full and staged application."""
        if stage is not None and n_stages > 2:
            num_tums = getattr(self.features, 'num_tums', None)
            if num_tums is None:
                raise ValueError(
                    f'n_stages={n_stages} pipeline stages need a '
                    f'MultilevelFeaturePyramid neck (a TUM chain to split); '
                    f'{type(self.features).__name__} supports 2 stages')
            chunks = tum_stage_chunks(num_tums, n_stages)
            a, b = chunks[stage]
            if stage == 0:
                return self.features(x, train=train, tum_range=(a, b))
            if stage < n_stages - 1:
                return self.features(None, train=train, tum_range=(a, b),
                                     stage_state=stage_state)
            sources, x = self.features(None, train=train, tum_range=(a, b),
                                       stage_state=stage_state)
            sources = list(sources)
        elif stage == 1:
            sources, x = stage_state
            sources = list(sources)
        else:
            sources, x = self.features(x, train=train)
            sources = list(sources)
            if stage == 0:
                return tuple(sources), x

        for i, (type_, out_channels) in enumerate(self.extras):
            override = (self.extras_overrides[i]
                        if self.extras_overrides else None) or {}
            x = ExtraLayer(type_, override.get('out', out_channels),
                           self.use_depthwise,
                           reduce_features=override.get('reduce'),
                           initializer=self.extras_initializer,
                           axis_name=self.axis_name, dtype=self.dtype,
                           name=f'extra{i}')(x, train)
            sources.append(x)

        assert len(sources) == len(self.num_boxes), \
            f'{len(sources)} scales vs {len(self.num_boxes)} anchor generators'

        if self.predictor is not None:
            pred_kwargs = {k: v for k, v in self.predictor.items()
                           if k in ('num_layers', 'num_channels', 'kernel_size',
                                    'activation', 'initializer')}
            # reference configs use {'name': ..., 'args': ...} activation dicts
            # (flax may have frozen the nested dict into a Mapping)
            import collections.abc
            if isinstance(pred_kwargs.get('activation'), collections.abc.Mapping):
                pred_kwargs['activation'] = pred_kwargs['activation']['name']
            score_sources, loc_sources = SharedConvPredictor(
                use_depthwise=self.use_depthwise, axis_name=self.axis_name,
                dtype=self.dtype, name='predictor',
                **pred_kwargs)(sources, train)
        else:
            score_sources = loc_sources = sources

        batch = x.shape[0]
        head_dtype = self.head_dtype if self.head_dtype is not None else self.dtype
        # parity: heads default to normal(std=0.01), config-overridable
        # (detector_builder.py:114-123)
        hinit = get_initializer(self.head_initializer, head_kernel_init)
        scores, locs = [], []
        for i, (nb, ss, ls) in enumerate(zip(self.num_boxes, score_sources,
                                             loc_sources)):
            s = nn.Conv(nb * self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=True, kernel_init=hinit,
                        bias_init=nn.initializers.constant(self.score_head_bias_init),
                        dtype=head_dtype, name=f'score_head{i}')(ss)
            l = nn.Conv(nb * 4, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=True, kernel_init=hinit,
                        dtype=head_dtype, name=f'loc_head{i}')(ls)
            # NHWC: [B, H, W, nb*C] -> [B, H*W*nb, C]; matches anchor order
            scores.append(s.reshape(batch, -1, self.num_classes))
            locs.append(l.reshape(batch, -1, 4))

        out_scores = jnp.concatenate(scores, axis=1)
        out_locs = jnp.concatenate(locs, axis=1)
        if return_sources:
            return out_scores, out_locs, loc_sources
        return out_scores, out_locs
