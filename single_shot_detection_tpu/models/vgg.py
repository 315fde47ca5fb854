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

import jax
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


def _pack_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Map a stride-1 SAME 3x3 conv kernel ``[3, 3, ci, co]`` onto the
    column-pair-packed layout ``[3, 3, 2ci, 2co]``.

    Packed tensors fold adjacent column pairs into channels
    (``x.reshape(B, H, W//2, 2C)``): even columns occupy channel half 0,
    odd columns half 1.  A packed-space SAME 3x3 conv with this kernel is
    EXACTLY the original conv (structured zeros carry the parity
    bookkeeping; packed column j-1/j/j+1 supply original columns
    2j-2..2j+2).  Built fresh from the live params each call, so
    gradients flow to the original ``[3, 3, ci, co]`` parameterization —
    checkpoints, imports and optimizer state are unchanged."""
    ci, co = k.shape[2], k.shape[3]
    kp = jnp.zeros((3, 3, 2 * ci, 2 * co), k.dtype)
    # output half 0 (even col 2j): col 2j-1 = packed j-1 half 1,
    # col 2j = packed j half 0, col 2j+1 = packed j half 1
    kp = kp.at[:, 0, ci:, :co].set(k[:, 0])
    kp = kp.at[:, 1, :ci, :co].set(k[:, 1])
    kp = kp.at[:, 1, ci:, :co].set(k[:, 2])
    # output half 1 (odd col 2j+1): cols 2j, 2j+1, 2j+2
    kp = kp.at[:, 1, :ci, co:].set(k[:, 0])
    kp = kp.at[:, 1, ci:, co:].set(k[:, 1])
    kp = kp.at[:, 2, :ci, co:].set(k[:, 2])
    return kp


class _PackedConv3x3(nn.Module):
    """3x3 SAME conv evaluated in the column-pair-packed layout.

    The parameter tree is IDENTICAL to the ``nn.Conv`` it replaces
    (``kernel [3, 3, ci, co]``, ``bias [co]``, same initializers), so
    packed and plain checkpoints interchange freely."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        ci = xp.shape[-1] // 2
        kernel = self.param('kernel', nn.linear.default_kernel_init,
                            (3, 3, ci, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        kp = _pack_kernel(kernel.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), kp, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + jnp.tile(bias.astype(self.dtype), 2)


class _PackedBN(nn.Module):
    """BatchNorm over the packed layout with flax-exact numerics.

    Channel c lives at packed positions c and c+C; statistics fold the
    two halves (mathematically the same mean/E[x^2] as the unpacked
    reduction, f32 like flax's forced-float32 stats).  Parameter and
    batch_stats trees match ``nn.BatchNorm`` exactly."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // 2
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xp.astype(jnp.float32)
            mu2c = jnp.mean(xf, axis=(0, 1, 2))           # [2C]
            sq2c = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            mean = (mu2c[:c] + mu2c[c:]) / 2
            var = jnp.maximum(0.0, (sq2c[:c] + sq2c[c:]) / 2
                              - jnp.square(mean))
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        mean2, var2 = jnp.tile(mean, 2), jnp.tile(var, 2)
        y = ((xp.astype(jnp.float32) - mean2)
             * jax.lax.rsqrt(var2 + self.epsilon) * jnp.tile(scale, 2)
             + jnp.tile(bias, 2))
        return y.astype(self.dtype)


class VGG(nn.Module):
    """``stages[i]`` mirrors ``torchvision vggN(_bn).features[i]`` output:
    each conv, bn, relu and maxpool is its own stage.

    ``packed_stem=True`` evaluates stage 1 (the convs before the first
    maxpool — C=64 at full input resolution, ~half the network's
    activation bytes) in a column-pair-packed layout ``[B, H, W/2, 128]``
    that fills the TPU's 128-wide lane tiles.  Measured on vgg300 b16
    (docs/PERF.md round-5): 485 vs 477 img/s — WITHIN RELAY NOISE, i.e.
    XLA's chosen layout does not in fact pay a 2x lane-padding tax on
    the C=64 stem; kept as an equivalence-tested opt-in for future
    re-measurement with a real profiler.  The first pool consumes the
    packing (its output is the plain layout), so nothing downstream
    changes; the parameter tree is identical either way.  Stem stages
    are stored packed — configs must not tap ``out_layers`` below the
    first pool (none do; guarded)."""

    config: Sequence[Union[int, str]] = VGG_CONFIGS[16]
    use_bn: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    width_overrides: Any = None  # {conv_idx: width} — pruning-materialize
    packed_stem: bool = False

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

        packed = (self.packed_stem and self.use_bn
                  and not self.width_overrides and x.shape[2] % 2 == 0)
        if packed:
            # stage 1 in the column-pair-packed layout (see class doc);
            # the first pool unpacks, so the loop below continues with the
            # plain layout and unchanged stage indices
            prefix = []
            for item in self.config:
                prefix.append(item)
                if item == 'M':
                    break
            n_prefix_stages = 3 * (len(prefix) - 1) + 1
            if last < n_prefix_stages:
                raise ValueError(
                    'packed_stem: out_layers must not tap stages inside '
                    f'the packed stem (stage {last} < {n_prefix_stages})')
            b, h, w, c0 = x.shape
            xp = x.reshape(b, h, w // 2, 2 * c0)
            for item in prefix:
                if item == 'M':
                    # 2x2/2 maxpool consumes the packing: vertical max on
                    # the row axis, horizontal max across the two channel
                    # halves — the result IS the plain layout
                    v = jnp.maximum(xp[:, 0::2], xp[:, 1::2])
                    half = v.shape[-1] // 2
                    x = jnp.maximum(v[..., :half], v[..., half:])
                    push(x)
                else:
                    xp = _PackedConv3x3(item, dtype=self.dtype,
                                        name=f'conv{conv_idx}')(xp)
                    conv_idx += 1
                    push(xp)
                    xp = _PackedBN(use_running_average=not train,
                                   dtype=self.dtype,
                                   name=f'bn{conv_idx - 1}')(xp)
                    push(xp)
                    xp = nn.relu(xp)
                    push(xp)

        remaining = (self.config[len(prefix):] if packed else self.config)
        for item in remaining:
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
