"""Pallas fused train-mode BatchNorm (stats + normalize + full VJP).

The vgg300 train step spends 35.8% of its time in XLA's convert+reduce
kernels for BN batch statistics and their gradients while sitting at 69%
of its own HBM roofline (docs/PERF.md round-4 profile).  This module
implements the BN train forward and backward as four streaming Pallas
kernels — each a single sequential-grid pass over the activation at full
VMEM tile occupancy, accumulating the channel statistics in f32 scratch:

  forward:   K1 stats   (reads x once -> per-channel sum, sum-of-squares)
             K2 apply   (reads x once -> writes z)
  backward:  K3 sums    (reads dz, x once -> d_gamma, d_beta)
             K4 dx      (reads dz, x once -> writes dx)

Byte traffic equals XLA's lowering (the BN recurrence fundamentally
needs two passes per direction); the bet was kernel efficiency — XLA's
reduce+convert kernels measurably run below streaming bandwidth.

MEASURED RESULT (round 5, docs/PERF.md): a LOSS — vgg300 b16 train
208 img/s fused vs 477 flax.  XLA keeps convnet activations in a tiled
``{3,0,2,1:T(8,128)}`` layout; a ``tpu_custom_call`` takes default-
layout operands, so every fused BN inserts full-tensor relayout copies
on both sides of all four kernels — far more than the reduce-kernel
inefficiency they recover.  Pallas cannot express XLA's custom layouts,
so this approach is structurally closed on TPU.  Kept as a tested
opt-in (``train.fused_bn``) for profiling and as the recorded negative;
the engine warns when it is enabled.

Semantics match flax ``nn.BatchNorm(use_running_average=False)`` exactly
(f32 statistics, fast variance E[x^2]-E[x]^2 clipped at 0, flax's
normalize-then-cast dtype rules) — pinned by tests/test_bn_pallas.py.

Single-device only: a ``pallas_call`` has no GSPMD partitioning rule, so
the engine gates ``train.fused_bn`` on an unsharded data axis
(engine.py); the multi-chip path keeps flax BN, whose sharded-batch
statistics GSPMD already handles (global-batch sync-BN).

Reference analog: the cuDNN batch-norm kernels behind
``/root/reference/bf/modules/conv.py:4-36`` (torch's fused BN training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return jax.default_backend() in ('tpu',) or _INTERPRET[0]


# tests flip this to run the kernels in interpreter mode on CPU
_INTERPRET = [False]


def _pick_rows(n: int, c: int, itemsize: int,
               budget_bytes: int = 256 << 10) -> int:
    """Largest row-block size that divides ``n``, is sublane-aligned and
    keeps a (rows, c) block under the VMEM budget."""
    align = 16  # bf16 sublane quantum; also fine for f32
    max_rows = max(budget_bytes // max(c * itemsize, 1), align)
    best = None
    r = align
    while r <= max_rows:
        if n % r == 0:
            best = r
        r += align
    return best or 0


def _stats_kernel(x_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = x_ref[...].astype(jnp.float32)
    acc_ref[0, :] += jnp.sum(xf, axis=0)
    acc_ref[1, :] += jnp.sum(xf * xf, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, out_ref):
    xf = x_ref[...].astype(jnp.float32)
    y = ((xf - mean_ref[0, :]) * rstd_ref[0, :] * scale_ref[0, :]
         + bias_ref[0, :])
    out_ref[...] = y.astype(out_ref.dtype)


def _grad_sums_kernel(dz_ref, x_ref, mean_ref, rstd_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = dz_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[0, :]) * rstd_ref[0, :]
    acc_ref[0, :] += jnp.sum(g, axis=0)
    acc_ref[1, :] += jnp.sum(g * xhat, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _dx_kernel(dz_ref, x_ref, mean_ref, rstd_ref, coef_ref, out_ref):
    # coef rows: 0 = r*gamma, 1 = d_beta/N, 2 = d_gamma/N
    g = dz_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[0, :]) * rstd_ref[0, :]
    dx = coef_ref[0, :] * (g - coef_ref[1, :] - xhat * coef_ref[2, :])
    out_ref[...] = dx.astype(out_ref.dtype)


try:  # pallas import is deferred so CPU-only installs still import us
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None


def _bn_stats(x2d):
    n, c = x2d.shape
    rows = _pick_rows(n, c, x2d.dtype.itemsize)
    if not rows:
        raise ValueError(f'bn_pallas: no aligned row block divides N={n}')
    call = pl.pallas_call(
        _stats_kernel,
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_INTERPRET[0],
    )
    sums = call(x2d)
    mean = sums[0] / n
    var = jnp.maximum(0.0, sums[1] / n - jnp.square(mean))
    return mean, var


def _bn_apply(x2d, mean, rstd, scale, bias, out_dtype):
    n, c = x2d.shape
    rows = _pick_rows(n, c, x2d.dtype.itemsize)
    chan = jnp.stack([jnp.broadcast_to(v, (c,)).astype(jnp.float32)
                      for v in (mean, rstd, scale, bias)])
    call = pl.pallas_call(
        _apply_kernel,
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
           for _ in range(4)],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype),
        interpret=_INTERPRET[0],
    )
    return call(x2d, chan[0:1], chan[1:2], chan[2:3], chan[3:4])


def _bn_grad_sums(dz2d, x2d, mean, rstd):
    n, c = x2d.shape
    rows = _pick_rows(n, c, x2d.dtype.itemsize, budget_bytes=128 << 10)
    call = pl.pallas_call(
        _grad_sums_kernel,
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        * 2,
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_INTERPRET[0],
    )
    return call(dz2d, x2d,
                mean.astype(jnp.float32).reshape(1, c),
                rstd.astype(jnp.float32).reshape(1, c))


def _bn_dx(dz2d, x2d, mean, rstd, coef, out_dtype):
    n, c = x2d.shape
    rows = _pick_rows(n, c, x2d.dtype.itemsize, budget_bytes=128 << 10)
    call = pl.pallas_call(
        _dx_kernel,
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        * 2
        + [pl.BlockSpec((3, c), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype),
        interpret=_INTERPRET[0],
    )
    return call(dz2d, x2d,
                mean.astype(jnp.float32).reshape(1, c),
                rstd.astype(jnp.float32).reshape(1, c), coef)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_bn_train(x, scale, bias, epsilon: float = 1e-5,
                   out_dtype=None):
    """Train-mode BN: returns ``(z, mean, var)`` with flax numerics.

    ``x`` is NHWC (any rank — every axis but the last reduces); ``scale``
    and ``bias`` are f32 ``[C]``; statistics are f32.  The VJP computes
    the full three-term BN backward in two Pallas passes.
    """
    z, mean, var, _ = _fused_bn_fwd_impl(x, scale, bias, epsilon, out_dtype)
    return z, mean, var


def _fused_bn_fwd_impl(x, scale, bias, epsilon, out_dtype):
    shape = x.shape
    c = shape[-1]
    n = int(np.prod(shape[:-1]))
    x2d = x.reshape(n, c)
    mean, var = _bn_stats(x2d)
    rstd = jax.lax.rsqrt(var + epsilon)
    dtype = out_dtype or x.dtype
    z = _bn_apply(x2d, mean, rstd, scale, bias, dtype).reshape(shape)
    return z, mean, var, rstd


def _fused_bn_fwd(x, scale, bias, epsilon, out_dtype):
    z, mean, var, rstd = _fused_bn_fwd_impl(x, scale, bias, epsilon,
                                            out_dtype)
    return (z, mean, var), (x, scale, mean, rstd)


def _fused_bn_bwd(epsilon, out_dtype, residuals, cotangents):
    x, scale, mean, rstd = residuals
    dz, _dmean, _dvar = cotangents  # stat cotangents are zero in practice
    shape = x.shape
    c = shape[-1]
    n = int(np.prod(shape[:-1]))
    x2d = x.reshape(n, c)
    dz2d = dz.reshape(n, c)
    sums = _bn_grad_sums(dz2d, x2d, mean, rstd)
    d_beta, d_gamma = sums[0], sums[1]
    coef = jnp.stack([
        rstd * scale.astype(jnp.float32),
        d_beta / n,
        d_gamma / n,
    ])
    dx = _bn_dx(dz2d, x2d, mean, rstd, coef, x.dtype).reshape(shape)
    return dx, d_gamma, d_beta


fused_bn_train.defvjp(_fused_bn_fwd, _fused_bn_bwd)


def make_fused_bn_interceptor():
    """flax method interceptor replacing every train-mode BatchNorm
    application with :func:`fused_bn_train` (same variable tree, same
    running-stat update rule).  Engine wiring: ``train.fused_bn``."""
    from flax import linen as nn

    def interceptor(next_fun, args, kwargs, context):
        bn = context.module
        if (not isinstance(bn, nn.BatchNorm)
                or context.method_name != '__call__'
                or bn.is_initializing()):
            return next_fun(*args, **kwargs)
        use_ra = kwargs.get('use_running_average', bn.use_running_average)
        if use_ra:  # eval/frozen path: flax's elementwise lowering is fine
            return next_fun(*args, **kwargs)
        x = args[0]
        c = x.shape[-1]
        ra_mean = bn.variable('batch_stats', 'mean',
                              lambda: jnp.zeros((c,), jnp.float32))
        ra_var = bn.variable('batch_stats', 'var',
                             lambda: jnp.ones((c,), jnp.float32))
        scale = (bn.param('scale', nn.initializers.ones_init(), (c,),
                          bn.param_dtype) if bn.use_scale
                 else jnp.ones((c,), jnp.float32))
        bias = (bn.param('bias', nn.initializers.zeros_init(), (c,),
                         bn.param_dtype) if bn.use_bias
                else jnp.zeros((c,), jnp.float32))
        dtype = bn.dtype or x.dtype
        z, mean, var = fused_bn_train(x, scale, bias, bn.epsilon, dtype)
        ra_mean.value = (bn.momentum * ra_mean.value
                         + (1 - bn.momentum) * mean)
        ra_var.value = bn.momentum * ra_var.value + (1 - bn.momentum) * var
        return z

    return interceptor


def fused_bn_apply(module):
    """``apply``-compatible callable running ``module`` with every
    train-mode BatchNorm fused through the Pallas kernels."""
    from flax import linen as nn
    interceptor = make_fused_bn_interceptor()

    def apply(variables, *args, **kwargs):
        with nn.intercept_methods(interceptor):
            return module.apply(variables, *args, **kwargs)

    return apply
