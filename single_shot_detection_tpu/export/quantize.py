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

# SERVING.md's measured int8 regression points, encoded as an engine-level
# gate so --int8 cannot silently be a large loss:
#   * depthwise-dominated backbones (MobileNet/ShuffleNet) below batch 128:
#     the pointwise quantize passes cost more than they save (-42% measured
#     at mb2 b32); depthwise convs stay float by design so there is little
#     to win.
#   * >=512 inputs without a spatial_limit: int8's (32, 128) tiling inserts
#     re-tiling copies on the big stem activations (-21% measured on
#     vgg512); spatial_limit=256 keeps the stem float and wins (408 vs 391).
DEPTHWISE_BACKBONE_PREFIXES = ('mobilenet', 'shufflenet')
DEPTHWISE_MIN_BATCH = 128
SPATIAL_LIMIT_INPUT = 512
SPATIAL_LIMIT_DEFAULT = 256


def resolve_int8_opts(cfg, log=None, batch_size=None):
    """Apply the measured serving preset to a config's ``int8`` options.

    Returns ``(enabled, opts)``: ``enabled`` is False when the
    backbone/batch point was measured to REGRESS under int8 (the user can
    force it by setting an explicit ``int8 = {...}`` dict in the config —
    an explicit block is an opt-in); ``opts`` carries an auto-chosen
    ``spatial_limit`` for >=512 inputs unless the config pins one.
    """
    import logging as _logging
    log = log or _logging
    # ConfigWrapper defaults ANY missing attribute to {} — to tell an
    # explicit ``int8 = {}`` opt-in from an absent key, read the raw
    # config module underneath (wrapper.config)
    raw_cfg = getattr(cfg, 'config', cfg)
    int8_cfg = getattr(raw_cfg, 'int8', None)
    explicit = isinstance(int8_cfg, dict)
    # a QAT run (train.qat) trained FOR the int8 serving path — that is
    # an opt-in too; refusing --int8 there would discard the learned
    # scales and silently serve float
    if dict(getattr(cfg, 'train', None) or {}).get('qat'):
        explicit = True
    opts = dict(int8_cfg or {})
    model_cfg = dict(getattr(cfg, 'model', None) or {})
    backbone = str(dict(model_cfg.get('base', {})).get('name', '')).lower()
    batch = int(batch_size if batch_size is not None
                else getattr(cfg, 'batch_size', None) or 32)
    input_size = max(tuple(getattr(cfg, 'input_size', None) or (300, 300)))

    if (not explicit and batch < DEPTHWISE_MIN_BATCH
            and any(p in backbone for p in DEPTHWISE_BACKBONE_PREFIXES)):
        log.warning(
            f'WW --int8 disabled: {backbone!r} at batch {batch} was '
            f'measured to LOSE under int8 (depthwise-dominated; -42% at '
            f'mobilenet_v2 b32 — docs/SERVING.md). Set an explicit '
            f'``int8 = {{}}`` block in the config to force it.')
        return False, opts

    if input_size >= SPATIAL_LIMIT_INPUT and 'spatial_limit' not in opts:
        opts['spatial_limit'] = SPATIAL_LIMIT_DEFAULT
        log.info(
            f'II int8 preset: spatial_limit={SPATIAL_LIMIT_DEFAULT} for the '
            f'{input_size}-input config (keeps the stem float; int8 '
            f'(32,128) tiling re-tiles big activations — docs/SERVING.md)')
    return True, opts


# backbones where int8 PTQ was MEASURED to win (dense-conv stacks feed the
# MXU at 2x bf16 rate; docs/SERVING.md: vgg300 +27.5%)
INT8_WIN_BACKBONES = ('vgg',)


def preset_int8(cfg, batch_size=None, log=None):
    """Zero-flag serving preset: decide whether to serve THIS config int8.

    Unlike :func:`resolve_int8_opts` (a gate for an explicit ``--int8``),
    this auto-ENABLES int8 only for configs measured to win from it —
    VGG-family dense-conv stacks — and auto-disables everywhere else.
    Returns ``(use_int8, opts)``.
    """
    enabled, opts = resolve_int8_opts(cfg, log=log, batch_size=batch_size)
    if not enabled:
        return False, opts
    model_cfg = dict(getattr(cfg, 'model', None) or {})
    backbone = str(dict(model_cfg.get('base', {})).get('name', '')).lower()
    return any(p in backbone for p in INT8_WIN_BACKBONES), opts


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


# ---------------------------------------------------------------------------
# Quantization-aware training (beyond parity)
# ---------------------------------------------------------------------------
# Standard fake-quantization QAT: the forward pass models int8 rounding/
# clipping noise (weights per-output-channel, activations per-tensor) while
# gradients flow through the straight-through estimator, so the trained
# weights adapt to the quantized serving path.  TPU-first design decisions:
#
# - Activation scales are EMA running statistics (`act_amax`) living in the
#   ``batch_stats`` collection — they ride the train step's existing
#   mutable/donation/checkpoint/mesh-replication plumbing (exactly like BN
#   running stats), and updating them never retraces the step.
# - Compute stays in the run's float dtype (bf16/f32): QAT models the
#   NOISE of int8, it does not need int8 arithmetic — the MXU keeps its
#   usual layout and the step compiles once.
# - Serving hands off directly: ``amax_from_batch_stats`` extracts the
#   learned scales so ``--int8`` eval/export reuses them instead of
#   post-hoc calibration.

QAT_DECAY = 0.99


def _fake_quant(x, scale):
    """Quantize-dequantize with a straight-through-estimator gradient."""
    q = jnp.clip(jnp.round(x / scale), -QMAX, QMAX) * scale
    return x + jax.lax.stop_gradient(q - x)


def _fake_quant_conv(conv: nn.Conv, x, act_amax):
    """One ``nn.Conv`` application with fake-quantized weights and input.

    Mirrors ``_quantized_conv``'s scale construction exactly (per-channel
    symmetric weights, per-tensor symmetric activations) so the QAT noise
    matches the int8 serving path bit-for-bit in scale placement.
    """
    params = conv.variables['params']
    kernel = params['kernel'].astype(jnp.float32)  # HWIO

    w_amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    w_scale = jnp.maximum(w_amax, 1e-12) / QMAX
    k_fq = _fake_quant(kernel, w_scale)

    x_f32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(act_amax, 1e-12) / QMAX
    # bypass until the EMA has seen at least one batch (amax == 0)
    x_fq = jnp.where(act_amax > 0, _fake_quant(x_f32, x_scale), x_f32)

    compute_dtype = conv.dtype if conv.dtype is not None else x.dtype
    kernel_size = kernel.shape[:2]
    strides = conv.strides if conv.strides is not None else (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    y = jax.lax.conv_general_dilated(
        x_fq.astype(compute_dtype), k_fq.astype(compute_dtype),
        window_strides=tuple(strides),
        padding=_canonical_padding(conv.padding, kernel_size),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=1)
    if conv.use_bias:
        y = y + params['bias'].astype(y.dtype)
    return y.astype(compute_dtype)


def make_qat_interceptor(decay: float = QAT_DECAY,
                         spatial_limit: Optional[int] = None) -> Callable:
    """Trace-time interceptor applying fake-quant to every supported conv.

    Each conv owns an ``act_amax`` scalar in ``batch_stats`` (created at
    init, EMA-updated whenever the collection is mutable — i.e. inside the
    train step — and read-only in eval/predict).  ``spatial_limit``
    matches the serving-side knob: convs kept float at serving time must
    not see quantization noise in training either.
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
        var = conv.variable('batch_stats', 'act_amax',
                            lambda: jnp.zeros((), jnp.float32))
        if conv.is_initializing():
            return next_fun(*args, **kwargs)
        if conv.is_mutable_collection('batch_stats'):
            batch_amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
            var.value = jnp.where(
                var.value > 0,
                decay * var.value + (1.0 - decay) * batch_amax,
                batch_amax)
        return _fake_quant_conv(conv, x, var.value)

    return interceptor


def qat_apply(module, decay: float = QAT_DECAY,
              spatial_limit: Optional[int] = None) -> Callable:
    """``apply``-compatible callable running supported convs fake-quantized.

    Use for BOTH init and apply so the ``act_amax`` variables exist in the
    state (engine wiring: ``train.qat`` config)."""
    interceptor = make_qat_interceptor(decay, spatial_limit)

    def apply(variables, *args, **kwargs):
        with nn.intercept_methods(interceptor):
            return module.apply(variables, *args, **kwargs)

    return apply


def qat_init(module, init_fn, *args, **kwargs):
    """Run an init callable under the QAT interceptor so every supported
    conv creates its ``act_amax`` stat."""
    with nn.intercept_methods(make_qat_interceptor()):
        return init_fn(*args, **kwargs)


def amax_from_batch_stats(batch_stats) -> Dict[str, float]:
    """Extract QAT-learned activation scales as ``{conv_path: amax}`` —
    the direct handoff to the int8 serving path (``quantized_apply``),
    replacing post-hoc calibration."""
    out: Dict[str, float] = {}

    def walk(node, path):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if k == 'act_amax':
                val = float(jax.device_get(v))
                if val > 0:
                    out['/'.join(path)] = val
            else:
                walk(v, path + (str(k),))

    walk(jax.device_get(batch_stats), ())
    return out
