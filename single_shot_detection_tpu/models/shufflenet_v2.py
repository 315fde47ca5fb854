"""ShuffleNetV2 backbone (flax, NHWC) with the reference's wrapper indexing.

Functional-parity target: torchvision shufflenet_v2_x{0.5,1.0,1.5,2.0} as
wrapped by the reference (``bf/builders/base_builder.py:28-42``):
``stages = [conv1, maxpool, stage2, stage3, stage4, conv5]`` — ssd_sh2_voc
taps ``out_layers (3, 5)``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

SHUFFLENET_WIDTHS = {
    0.5: (48, 96, 192, 1024),
    1.0: (116, 232, 464, 1024),
    1.5: (176, 352, 704, 1024),
    2.0: (244, 488, 976, 2048),
}

_STAGE_REPEATS = (4, 8, 4)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
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

        branch_features = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
        else:
            x1 = x2 = x
            # left branch: dw 3x3/s + bn + pw 1x1 + bn + relu
            x1 = nn.Conv(x.shape[-1], (3, 3), strides=(self.stride,) * 2,
                         padding=((1, 1), (1, 1)),
                         feature_group_count=x.shape[-1], use_bias=False,
                         dtype=self.dtype, name='branch1_dw')(x1)
            x1 = bn('branch1_dw_bn')(x1)
            x1 = nn.Conv(branch_features, (1, 1), use_bias=False,
                         dtype=self.dtype, name='branch1_pw')(x1)
            x1 = nn.relu(bn('branch1_pw_bn')(x1))

        # right branch: pw + bn + relu, dw/s + bn, pw + bn + relu
        out = nn.Conv(branch_features, (1, 1), use_bias=False,
                      dtype=self.dtype, name='branch2_pw1')(x2)
        out = nn.relu(bn('branch2_pw1_bn')(out))
        out = nn.Conv(branch_features, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)),
                      feature_group_count=branch_features, use_bias=False,
                      dtype=self.dtype, name='branch2_dw')(out)
        out = bn('branch2_dw_bn')(out)
        out = nn.Conv(branch_features, (1, 1), use_bias=False,
                      dtype=self.dtype, name='branch2_pw2')(out)
        out = nn.relu(bn('branch2_pw2_bn')(out))

        merged = jnp.concatenate([x1, out], axis=-1)
        return channel_shuffle(merged, 2)


class ShuffleNetV2(nn.Module):
    """6-stage feature extractor: conv1, maxpool, stage2..4, conv5."""

    channels: Sequence[int] = SHUFFLENET_WIDTHS[1.0]
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    num_stages = 6

    @nn.compact
    def __call__(self, x, train: bool = False, max_stage: Optional[int] = None):
        last = self.num_stages - 1 if max_stage is None else max_stage
        stages = []

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                axis_name=self.axis_name if train else None,
                                dtype=self.dtype, name=name)

        x = nn.Conv(24, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(bn('conv1_bn')(x))
        stages.append(x)
        if last <= 0:
            return stages, {}
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages.append(x)
        if last <= 1:
            return stages, {}

        for i, (features, repeats) in enumerate(
                zip(self.channels[:3], _STAGE_REPEATS)):
            for j in range(repeats):
                x = ShuffleUnit(features, stride=2 if j == 0 else 1,
                                axis_name=self.axis_name, dtype=self.dtype,
                                name=f'stage{i + 2}_{j}')(x, train)
            stages.append(x)
            if last <= 2 + i:
                return stages, {}

        x = nn.Conv(self.channels[3], (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv5')(x)
        x = nn.relu(bn('conv5_bn')(x))
        stages.append(x)
        return stages, {}
