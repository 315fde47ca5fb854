"""Reusable conv blocks (flax.linen, NHWC, bf16-friendly).

Functional-parity targets: reference ``bf/modules/conv.py`` (Conv2dBn /
DepthwiseConv2dBn) and the TF-style asymmetric padding used by the custom
MobileNets (``bf/base/mobilenet_v2.py:52`` ``ZeroPad2d((0, 1, 0, 1))``).

TPU-first choices:
  * NHWC layout — XLA:TPU's native conv layout;
  * params in fp32, compute dtype configurable (bf16 by default in training);
  * BatchNorm with an optional ``axis_name`` so batch statistics are averaged
    across the data mesh axis (sync-BN == the reference's apex
    ``convert_syncbn_model``, init.py:85) at zero extra code.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# parity: the reference initializes every backbone conv with
# xavier_uniform + zero bias (mobilenet.py:131-137,
# mobilenet_v2.py:144-150); flax defaults to lecun_normal, which
# measurably changes short-run training trajectories
xavier_uniform = nn.initializers.glorot_uniform()

ACTIVATIONS = {
    'ReLU': nn.relu,
    'ReLU6': lambda x: jnp.minimum(nn.relu(x), 6.0),
    'LeakyReLU': nn.leaky_relu,
    'SiLU': nn.silu,
    'GELU': nn.gelu,
    'Sigmoid': nn.sigmoid,
    'Tanh': jnp.tanh,
    'Identity': lambda x: x,
}


def get_activation(params: Optional[dict]) -> Optional[Callable]:
    """Resolve a reference-style activation config dict to a function."""
    if params is None:
        return None
    return ACTIVATIONS[params['name']]


def get_initializer(params, default: Optional[Callable] = None) -> Optional[Callable]:
    """Resolve a reference-style initializer config dict to a flax initializer.

    The reference threads ``{'name': <torch nn.init fn>, 'args': {...}}``
    dicts through its neck/extras/predictor/heads configs
    (features.py:37, detector_builder.py:100,116, predictors.py:51) and
    applies them to conv weights (biases are zeroed — flax's default).
    Supported names mirror the ones its shipped samples and defaults use;
    the variance math matches torch's for conv kernels (both compute
    fan_in = in_channels/groups * k*k).
    """
    if params is None:
        return default
    name = params['name']
    args = dict(params.get('args', {}))
    if name == 'normal_':
        if args.pop('mean', 0) != 0:
            raise ValueError('normal_ initializer: only mean=0 is supported')
        return nn.initializers.normal(stddev=args.pop('std', 1.0))
    if name == 'constant_':
        return nn.initializers.constant(args.pop('val'))
    simple = {
        'xavier_normal_': nn.initializers.glorot_normal,
        'xavier_uniform_': nn.initializers.glorot_uniform,
        # torch defaults: nonlinearity='leaky_relu', a=0 -> gain sqrt(2),
        # identical to He init
        'kaiming_normal_': nn.initializers.he_normal,
        'kaiming_uniform_': nn.initializers.he_uniform,
        'zeros_': nn.initializers.zeros_init,
        'ones_': nn.initializers.ones_init,
    }
    if name not in simple:
        raise ValueError(f'Unsupported initializer {name!r} '
                         f'(supported: normal_, constant_, {", ".join(simple)})')
    if args:
        raise ValueError(f'{name}: unsupported args {sorted(args)}')
    return simple[name]()


def tf_same_pad(kernel_size: int, stride: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Padding used by the custom MobileNets: symmetric ``k // 2`` at stride 1,
    TF-style asymmetric ``(0, 1)`` at stride 2 (mobilenet_v2.py:17, :52)."""
    if stride == 2:
        return ((0, 1), (0, 1))
    p = kernel_size // 2
    return ((p, p), (p, p))


class ConvBn(nn.Module):
    """conv [+ BN] [+ activation] (parity: conv.py:4-36 ``Conv2dBn``)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: int = 1
    padding: Union[str, int, Sequence] = 0
    groups: int = 1
    use_bias: bool = False
    use_bn: bool = True
    activation: Optional[str] = 'ReLU'
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    kernel_init: Optional[Callable] = None  # None = flax default
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size, self.kernel_size)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        init_kw = ({'kernel_init': self.kernel_init}
                   if self.kernel_init is not None else {})
        x = nn.Conv(self.features, k, strides=(self.stride, self.stride),
                    padding=pad, feature_group_count=self.groups,
                    use_bias=self.use_bias, dtype=self.dtype, name='conv',
                    **init_kw)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                             axis_name=self.axis_name if train else None,
                             dtype=self.dtype, name='bn')(x)
        if self.activation is not None:
            x = ACTIVATIONS[self.activation](x)
        return x


class DepthwiseConvBn(nn.Module):
    """depthwise conv+BN+act, then pointwise conv+BN+act
    (parity: conv.py:39-85 ``DepthwiseConv2dBn``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Union[str, int, Sequence] = 0
    use_bias: bool = False
    use_bn: bool = True
    activation: Optional[str] = 'ReLU'
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    kernel_init: Optional[Callable] = None  # None = flax default
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        init_kw = ({'kernel_init': self.kernel_init}
                   if self.kernel_init is not None else {})
        x = nn.Conv(in_features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=in_features, use_bias=self.use_bias,
                    dtype=self.dtype, name='depthwise_conv', **init_kw)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                             axis_name=self.axis_name if train else None,
                             dtype=self.dtype, name='depthwise_bn')(x)
        if self.activation is not None:
            x = ACTIVATIONS[self.activation](x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name='pointwise_conv', **init_kw)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                             axis_name=self.axis_name if train else None,
                             dtype=self.dtype, name='pointwise_bn')(x)
        if self.activation is not None:
            x = ACTIVATIONS[self.activation](x)
        return x
