"""Post-training int8 quantization for TPU serving.

The reference's deployment story ends in OpenVINO IR export
(bf/utils/mo_exporter.py:15-47), where int8 calibration is the standard
inference-engine optimization.  The TPU-native analog implemented here:
convolution weights quantize to int8 per output channel and activations to
int8 per tensor (scales calibrated on sample batches), and every eligible
conv runs as s8 x s8 -> s32 on the MXU — which executes int8 at twice the
bf16 rate on v5e — while elementwise epilogues (dequant, bias, BN affine,
ReLU) stay in the float compute dtype and fuse into the conv as usual.

Zero-touch by design: no model rewrite, no quantized module zoo.  A flax
method interceptor (``nn.intercept_methods``) swaps every ``nn.Conv``
application for the quantized equivalent at trace time, so the same model
definition serves f32, bf16 and int8.  Symmetric quantization keeps the
zero point at 0, so XLA's implicit zero padding remains exact in the
quantized domain.

Depthwise convolutions (``feature_group_count == in_features``) stay in
the float path: they are VPU-bound, not MXU-bound, so int8 buys nothing
and costs accuracy.

Usage::

    amax = calibrate(module, variables, [batch1, batch2, ...])
    predict = make_quantized_predict_step(module, postprocessor, anchors,
                                          amax)
    detections, valid = predict(variables, images)
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

QMAX = 127.0


def _module_path(module) -> str:
    return '/'.join(str(p) for p in module.path)


def _canonical_padding(padding, kernel_size):
    """Reproduce flax ``nn.Conv`` padding semantics for the zoo's usage
    (strings, ints, pairs, and pair-of-pairs)."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * len(kernel_size)
    pads = []
    for p in padding:
        if isinstance(p, int):
            pads.append((p, p))
        else:
            pads.append(tuple(p))
    return tuple(pads)


def _supported(conv: nn.Conv) -> bool:
    """Only the plain dense-conv configuration the zoo uses is quantized;
    anything exotic falls back to the float path rather than risk a
    semantic mismatch."""
    if conv.feature_group_count != 1:
        return False  # depthwise / grouped: VPU-bound, skip
    for attr in ('kernel_dilation', 'input_dilation'):
        v = getattr(conv, attr, 1)
        if v is None or v == 1 or v == (1, 1):
            continue
        return False
    if getattr(conv, 'mask', None) is not None:
        return False
    return True


def calibrate(module,
              variables,
              batches: Iterable,
              apply_fn: Optional[Callable] = None) -> Dict[str, float]:
    """Record the per-conv input absolute maximum over calibration batches.

    Runs the float model eagerly with a recording interceptor; returns
    ``{conv_path: amax}``.  A handful of representative batches suffices
    (classic max-abs PTQ calibration).

    ``apply_fn(variables, images)`` overrides the default
    ``module.apply(variables, images, train=False)`` when the model's
    signature differs.
    """
    amax: Dict[str, float] = {}

    def recorder(next_fun, args, kwargs, context):
        if (isinstance(context.module, nn.Conv)
                and context.method_name == '__call__'
                and _supported(context.module)):
            path = _module_path(context.module)
            v = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            amax[path] = max(amax.get(path, 0.0), v)
        return next_fun(*args, **kwargs)

    for images in batches:
        with nn.intercept_methods(recorder):
            if apply_fn is not None:
                apply_fn(variables, images)
            else:
                module.apply(variables, images, train=False)
    return amax


def _quantized_conv(conv: nn.Conv, x, input_scale: float):
    """The int8 replacement for one ``nn.Conv`` application."""
    params = conv.variables['params']
    kernel = params['kernel'].astype(jnp.float32)  # HWIO

    # per-output-channel symmetric weight scales
    w_amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    w_scale = jnp.maximum(w_amax, 1e-12) / QMAX
    w_q = jnp.clip(jnp.round(kernel / w_scale), -QMAX, QMAX).astype(jnp.int8)

    # per-tensor symmetric activation scale (calibrated, baked constant)
    x_scale = max(input_scale, 1e-12) / QMAX
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -QMAX, QMAX)
    x_q = x_q.astype(jnp.int8)

    kernel_size = kernel.shape[:2]
    strides = conv.strides if conv.strides is not None else (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    y = jax.lax.conv_general_dilated(
        x_q, w_q,
        window_strides=tuple(strides),
        padding=_canonical_padding(conv.padding, kernel_size),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=1,
        preferred_element_type=jnp.int32)

    out = y.astype(jnp.float32) * (w_scale * x_scale)
    if conv.use_bias:
        out = out + params['bias'].astype(jnp.float32)
    out_dtype = conv.dtype if conv.dtype is not None else x.dtype
    return out.astype(out_dtype)


def make_interceptor(amax: Dict[str, float],
                     spatial_limit: Optional[int] = None) -> Callable:
    """Build the trace-time interceptor swapping calibrated convs to int8.

    ``spatial_limit``: leave convs whose input spatial extent exceeds this
    in the float path.  Int8 tensors tile as (32, 128) on TPU, so feeding
    a conv int8 forces a physical re-tiling copy of its input; on very
    large early activations (the 512-input configs' stems) those copies
    cost more than the MXU saves — measured on ssd_512_vgg16:
    full int8 265 img/s, ``spatial_limit=256`` 408, float 391
    (docs/PERF.md).  At 300-input scale full quantization wins; default
    is therefore None (quantize everything calibrated).
    """

    def interceptor(next_fun, args, kwargs, context):
        conv = context.module
        if (not isinstance(conv, nn.Conv)
                or context.method_name != '__call__'
                or not _supported(conv)):
            return next_fun(*args, **kwargs)
        x = args[0]
        if (spatial_limit is not None and x.ndim == 4
                and max(x.shape[1], x.shape[2]) > spatial_limit):
            return next_fun(*args, **kwargs)
        path = _module_path(conv)
        if path not in amax:
            return next_fun(*args, **kwargs)
        return _quantized_conv(conv, x, amax[path])

    return interceptor


def quantized_apply(module, amax: Dict[str, float],
                    spatial_limit: Optional[int] = None) -> Callable:
    """``apply``-compatible callable running calibrated convs in int8."""

    def apply(variables, *args, **kwargs):
        with nn.intercept_methods(make_interceptor(amax, spatial_limit)):
            return module.apply(variables, *args, **kwargs)

    return apply


def make_quantized_predict_step(module, postprocessor, anchors,
                                amax: Dict[str, float],
                                spatial_limit: Optional[int] = None
                                ) -> Callable:
    """Int8 twin of ``train.step.make_predict_step`` (serving path):
    quantized forward + decode + batched NMS in one XLA program."""
    from single_shot_detection_tpu.train.step import make_predict_step
    return make_predict_step(
        module, postprocessor, anchors,
        apply_fn=quantized_apply(module, amax, spatial_limit))
