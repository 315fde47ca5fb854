"""BN-free normalization override: GroupNorm via a trace-time interceptor.

``train.group_norm`` (beyond-parity — the reference is BatchNorm-only,
bf/modules/conv.py:24-33) swaps every ``nn.BatchNorm`` application in the
zoo for GroupNorm (Wu & He, arXiv:1803.08494) without touching a single
model definition, using the same flax method-interceptor mechanism as the
int8/QAT paths (export/quantize.py).

Why it exists on TPU:

  * batch-size independence — BN statistics degrade at small per-device
    batches; GN normalizes per (sample, group) so accuracy doesn't couple
    to the data-parallel layout;
  * zero cross-device communication — no batch-stat reductions over the
    mesh (sync-BN collectives disappear from multi-host programs);
  * no train/eval divergence — the same program serves both (no running
    statistics to warm up, no frozen-BN fine-tune split).

Design choice: the interceptor PRESERVES BatchNorm's exact variable tree —
it binds the BN module's own ``scale``/``bias`` params and touches (never
writes) the ``batch_stats`` running mean/var.  Init therefore runs plain,
checkpoints are layout-compatible in both directions (a GN run restores a
BN checkpoint's affine params and vice versa), torch weight imports and
pruning masks work unchanged.  The running stats simply stay at their 0/1
init in GN runs (documented dead weight, ~2C floats per norm layer).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

DEFAULT_GROUPS = 8


def _num_groups(channels: int, groups: int) -> int:
    """Largest divisor of ``channels`` not exceeding ``groups`` (standard
    practice when a layer's width doesn't divide the configured group
    count; degrades to LayerNorm-over-channels at g=1)."""
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g


def make_group_norm_interceptor(groups: int = DEFAULT_GROUPS) -> Callable:
    """Trace-time interceptor replacing every BatchNorm application with
    GroupNorm over the same affine params."""

    def interceptor(next_fun, args, kwargs, context):
        bn = context.module
        if (not isinstance(bn, nn.BatchNorm)
                or context.method_name != '__call__'):
            return next_fun(*args, **kwargs)
        if bn.is_initializing():
            # create BN's normal variable tree (scale/bias + running
            # mean/var) so the state layout is identical to a BN run
            return next_fun(*args, **kwargs)

        x = args[0]
        c = x.shape[-1]
        g = _num_groups(c, groups)

        # touch (bind, never write) the running stats so a mutable
        # ['batch_stats'] apply returns the full collection unchanged —
        # the train step's state.replace(batch_stats=...) must keep the
        # pytree structure stable
        bn.variable('batch_stats', 'mean',
                    lambda: jnp.zeros((c,), jnp.float32))
        bn.variable('batch_stats', 'var',
                    lambda: jnp.ones((c,), jnp.float32))

        # per-(sample, group) moments over spatial + within-group channels,
        # computed in f32 like flax BN's forced-float32 stat reductions
        xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (g, c // g))
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = ((xf - mean) / jnp.sqrt(var + bn.epsilon)).reshape(x.shape)

        if bn.use_scale:
            scale = bn.param('scale', nn.initializers.ones, (c,),
                             bn.param_dtype)
            y = y * scale.astype(jnp.float32)
        if bn.use_bias:
            bias = bn.param('bias', nn.initializers.zeros, (c,),
                            bn.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(bn.dtype or x.dtype)

    return interceptor


def group_norm_apply(module, groups: int = DEFAULT_GROUPS) -> Callable:
    """``apply``-compatible callable running the module with every
    BatchNorm replaced by GroupNorm (engine wiring: ``train.group_norm``).
    Init runs plain — the variable tree is BN's."""
    interceptor = make_group_norm_interceptor(groups)

    def apply(variables, *args, **kwargs):
        with nn.intercept_methods(interceptor):
            return module.apply(variables, *args, **kwargs)

    return apply
