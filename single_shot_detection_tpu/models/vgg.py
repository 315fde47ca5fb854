"""VGG backbones (flax, NHWC) with torchvision per-layer stage indexing.

Functional-parity target: torchvision ``vgg11/13/16/19(+bn)`` as consumed by
the reference (``bf/base/__init__.py:19-26``) — sample configs index into
``features`` at *sub-layer* granularity (conv / bn / relu / pool each count),
e.g. ssd_300_vgg16_voc taps layers 32 (conv4_3 relu) and 42 (conv5_3 relu)
with ``last_feature_layer: 42``.  The stage list reproduces that indexing
exactly so configs carry over unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

VGG_CONFIGS = {
    11: (64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'),
    13: (64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M',
         512, 512, 'M'),
    16: (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M',
         512, 512, 512, 'M'),
    19: (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
         512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M'),
}


class VGG(nn.Module):
    """``stages[i]`` mirrors ``torchvision vggN(_bn).features[i]`` output:
    each conv, bn, relu and maxpool is its own stage."""

    config: Sequence[Union[int, str]] = VGG_CONFIGS[16]
    use_bn: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width_overrides: Any = None  # {conv_idx: width} — pruning-materialize

    @property
    def num_stages(self):
        per_conv = 3 if self.use_bn else 2
        convs = sum(1 for c in self.config if c != 'M')
        pools = sum(1 for c in self.config if c == 'M')
        return convs * per_conv + pools

    @nn.compact
    def __call__(self, x, train: bool = False, max_stage: Optional[int] = None):
        last = self.num_stages - 1 if max_stage is None else max_stage
        stages = []
        conv_idx = 0

        def push(value):
            stages.append(value)
            return len(stages) - 1 >= last

        for item in self.config:
            if item == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if push(x):
                    return stages, {}
            else:
                if self.width_overrides and conv_idx in self.width_overrides:
                    item = self.width_overrides[conv_idx]
                x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=True, dtype=self.dtype,
                            name=f'conv{conv_idx}')(x)
                conv_idx += 1
                if push(x):
                    return stages, {}
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9,
                                     axis_name=self.axis_name if train else None,
                                     dtype=self.dtype,
                                     name=f'bn{conv_idx - 1}')(x)
                    if push(x):
                        return stages, {}
                x = nn.relu(x)
                if push(x):
                    return stages, {}
        return stages, {}
