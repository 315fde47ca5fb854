"""Model export.

Functional-parity targets: reference ``bf/utils/onnx_exporter.py`` /
``jit_exporter.py`` / ``detector_wrapper.py:8-47`` (TorchScript trace with
baked anchors + scripted decode).

TPU-native equivalent: ``jax.export`` serializes the jitted inference
function — forward + softmax scores + box decode with anchors baked in as
constants — to a portable StableHLO artifact.  (The OpenVINO ``mo`` path,
mo_exporter.py, is CUDA-ecosystem-specific and out of scope per SURVEY §2.9.)
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _deploy_model(experiment):
    """(module, variables) to export: the physically-narrow rebuild when
    channels were pruned (train/materialize.py — the deploy-time analog of
    the reference's in-place surgery), else the trained model as-is."""
    # EMA shadow weights when train.ema is enabled (engine._eval_params)
    params = (experiment._eval_params()
              if hasattr(experiment, '_eval_params')
              else experiment.state.params)
    variables = {'params': params,
                 'batch_stats': experiment.state.batch_stats}
    if getattr(experiment, 'pruner', None) is not None and experiment.pruner.dead:
        bundle, variables = experiment.materialize_pruned()
        logging.info('>> exporting the materialized (narrow) pruned model')
        return bundle.module, variables
    return experiment.bundle.module, variables


def _calibration_images(experiment, n_batches: int = 2):
    """Pull eval batches through the eval pipeline for int8 calibration."""
    if not experiment.loaders:
        raise ValueError(
            'int8 calibration needs real batches but no dataset is '
            'configured for the active phases — include an eval (or train) '
            'dataset when using --int8')
    loader = (experiment.loaders.get('eval')
              or next(iter(experiment.loaders.values())))
    images = []
    for bidx, batch in enumerate(loader):
        raw = experiment._shard({'image': batch['image'],
                                 'boxes': batch['boxes'],
                                 'box_mask': batch['box_mask'],
                                 'ids': batch['ids']})
        images.append(experiment._augment(raw, train=False,
                                          salt=bidx)['image'])
        if bidx + 1 >= n_batches:
            break
    return images


def make_inference_fn(experiment, with_postprocess: bool = False,
                      int8: bool = False, with_preprocess: bool = False,
                      batch_size: Optional[int] = None):
    """Build the standalone inference function.

    Default (parity with onnx export, detector.py:68-72): returns softmaxed
    scores + decoded corner boxes.  ``with_postprocess=True`` additionally
    bakes NMS in (engine-side NMS, the mo_add_output analog).  ``int8``
    calibrates on eval batches and bakes the quantized convs + scales into
    the artifact (the OpenVINO int8-deployment analog).
    ``with_preprocess=True`` bakes the config's normalization
    (divisor/mean/std — the OpenVINO ``mean_values`` analog,
    mo_exporter.py:32) so the artifact accepts raw resized RGB images.
    """
    module, variables = _deploy_model(experiment)
    return _make_inference_fn_for(experiment, module, with_postprocess,
                                  variables=variables, int8=int8,
                                  with_preprocess=with_preprocess,
                                  batch_size=batch_size)


def _make_inference_fn_for(experiment, module, with_postprocess,
                           variables=None, int8=False,
                           with_preprocess=False, batch_size=None):
    anchors = jnp.asarray(experiment.anchors)
    coder = experiment.box_coder
    # serving preset: anchor-heavy configs get pre_nms_top_k baked unless
    # the config pins the key (engine.serving_postprocessor; SERVING.md)
    postprocessor = experiment.serving_postprocessor()
    apply_fn = module.apply
    gn_groups = getattr(experiment, 'gn_groups', None)
    if gn_groups:
        # GroupNorm-trained run (train.group_norm): the artifact must bake
        # the GN forward — plain module.apply would normalize with the
        # untouched BN running stats (models/norm.py)
        if int8:
            raise ValueError('int8 export does not compose with '
                             'train.group_norm (same trace-time override)')
        from single_shot_detection_tpu.models import norm as _norm
        apply_fn = _norm.group_norm_apply(module, gn_groups)
    if int8:
        from single_shot_detection_tpu.export import quantize
        # gate on the batch the ARTIFACT will serve (the measured
        # regression is a serving-batch property), falling back to the
        # config's training batch only when no serving batch is known
        enabled, opts = quantize.resolve_int8_opts(experiment.cfg,
                                                   batch_size=batch_size)
        if not enabled:
            gate_batch = (batch_size if batch_size is not None
                          else getattr(experiment.cfg, 'batch_size', None))
            # an export artifact silently falling back to float would ship
            # the wrong program — refuse with the recipe instead
            raise ValueError(
                f'int8 export refused: this backbone at batch {gate_batch} '
                f'{"(the config training batch — pass batch_size to gate on "
                   "the serving batch) " if batch_size is None else ""}'
                'was measured to regress under int8 (docs/SERVING.md). Set '
                'an explicit ``int8 = {...}`` config block to force it.')
        # an Experiment that already calibrated (--int8 eval before export)
        # holds valid per-conv amax for ITS OWN module at the CURRENT
        # weights; a materialized (pruned-narrow) module has different conv
        # shapes, and training since calibration stales the scales —
        # recalibrate in both cases
        amax = None
        if (module is experiment.bundle.module
                and getattr(experiment, '_int8_amax', None) is not None
                and getattr(experiment, '_int8_calib_step', None)
                == int(jax.device_get(experiment.state.step))):
            amax = experiment._int8_amax
            logging.info(f'>> int8 export: reusing the experiment\'s '
                         f'{len(amax)} calibrated conv scales')
        if (amax is None and module is experiment.bundle.module
                and getattr(experiment, 'qat_apply', None) is not None):
            # QAT run: activation scales were learned during training
            amax = quantize.amax_from_batch_stats(
                experiment.state.batch_stats) or None
            if amax:
                logging.info(f'>> int8 export: using {len(amax)} '
                             'QAT-learned conv scales')
        if amax is None:
            amax = quantize.calibrate(
                module, variables,
                _calibration_images(
                    experiment, int(opts.get('calibration_batches', 2))))
            logging.info(f'>> int8 export: calibrated {len(amax)} convs')
        apply_fn = quantize.quantized_apply(
            module, amax, spatial_limit=opts.get('spatial_limit'))

    pipe = experiment.eval_pipeline
    divisor = float(getattr(pipe, 'divisor', 1.0))
    norm_mean = getattr(pipe, 'mean', None)
    norm_std = getattr(pipe, 'std', None)

    def infer(variables, images):
        if with_preprocess:
            # config normalization baked in: the artifact accepts raw
            # resized RGB (0-255 floats), like an OpenVINO IR exported
            # with mean_values/scale
            images = images.astype(jnp.float32) / divisor
            if norm_mean is not None:
                images = ((images - jnp.asarray(norm_mean))
                          / jnp.asarray(norm_std))
        scores, locs = apply_fn(variables, images, train=False)
        scores = scores.astype(jnp.float32)
        locs = locs.astype(jnp.float32)
        if with_postprocess:
            return postprocessor(scores, locs, anchors)
        from single_shot_detection_tpu.ops import boxes as box_ops
        probs = jax.nn.softmax(scores, axis=-1)
        decoded = box_ops.to_corners(coder.decode(locs, anchors))
        return probs, decoded

    return infer


def export_model(experiment, path: str, with_postprocess: bool = False,
                 batch_size: int = 1, int8: bool = False,
                 with_preprocess: bool = False,
                 bake_variables: bool = False):
    """Serialize the inference function to StableHLO bytes at ``path``.

    Parity: main.py:128 export phase -> exported/model.onnx; here the
    artifact is ``<path>.stablehlo`` loadable via ``jax.export.deserialize``.
    ``int8`` bakes calibrated int8 convs into the artifact.

    ``bake_variables=True`` closes over the weights (the ONNX-artifact
    model: one self-contained file, call signature ``images ->
    detections``); default keeps ``(variables, images)`` so one artifact
    serves many checkpoints.  ``with_preprocess`` bakes normalization.
    A fully standalone artifact (raw resized images in, final boxes out):
    ``with_postprocess=True, with_preprocess=True, bake_variables=True``
    — the ``export = {'standalone': True}`` config shorthand
    (tools/infer_exported.py consumes these).
    """
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    if batch_size > 1 and batch_size % 8:
        # the artifact's batch is baked into the StableHLO program: a
        # misaligned one pads to the 8-wide sublane tile on EVERY
        # activation pass for the artifact's whole life (+29-31% measured
        # from aligning; docs/PERF.md).  batch 1 (latency serving) exempt.
        logging.warning(
            f'WW export batch_size {batch_size} is not a multiple of 8 — '
            f'TPU pads it to {batch_size + (-batch_size) % 8}; exporting '
            f'at the aligned batch is measured 29-31% faster per image '
            f'(docs/PERF.md)')
    module, variables = _deploy_model(experiment)
    infer = _make_inference_fn_for(experiment, module, with_postprocess,
                                   variables=variables, int8=int8,
                                   with_preprocess=with_preprocess,
                                   batch_size=batch_size)
    w, h = experiment.input_size
    images = jnp.zeros((batch_size, h, w, 3), jnp.float32)

    from jax import export as jax_export
    if bake_variables:
        exported = jax_export.export(
            jax.jit(lambda imgs: infer(variables, imgs)))(images)
    else:
        exported = jax_export.export(jax.jit(infer))(variables, images)
    blob = exported.serialize()
    out_path = path + '.stablehlo'
    with open(out_path, 'wb') as f:
        f.write(blob)
    logging.info(f'>> Exported StableHLO model to {out_path} '
                 f'({len(blob)} bytes)')
    return out_path


def load_exported(path: str):
    """Deserialize an exported model; returns a callable."""
    return load_exported_with_spec(path)[0]


def load_exported_with_spec(path: str):
    """Deserialize an exported model; returns ``(callable, in_avals)`` so a
    standalone consumer (tools/infer_exported.py) can discover the
    expected input shape from the artifact itself."""
    from jax import export as jax_export
    with open(path, 'rb') as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    return exported.call, exported.in_avals
