"""TPU device-step throughput for ALL FIVE BASELINE.md parity configs.

Each config is assembled from its real ``samples/*.py`` file at the
reference batch size (BASELINE.md table):

  ssd_mb2_voc            batch 32, 300x300
  ssd_300_vgg16_voc      batch 16, 300x300
  ssd_512_vgg16_coco     batch 12, 512x512
  retina_rn50_500_coco   batch 12, 500x500
  m2det_512_vgg16_coco   batch  8, 512x512

For each: the jitted train step on a pre-staged device batch (images/sec/
chip) and the fused inference step (forward + on-chip postprocess).  Run:

  python benchmarks/parity_bench.py [--dtype bf16|f32] [--steps N] [--configs a,b]

Prints one JSON line per config and a summary table.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from benchmarks._util import retry as _retry, synth_batch  # noqa: E402 (needs ROOT)

PARITY = [
    # (config file, reference batch size)
    ('ssd_mb2_voc.py', 32),
    ('ssd_300_vgg16_voc.py', 16),
    ('ssd_512_vgg16_coco.py', 12),
    ('retina_rn50_500_coco.py', 12),
    ('m2det_512_vgg16_coco.py', 8),
]

# The reference batch sizes are GPU-memory artifacts.  On TPU the activation
# layout tiles the batch dim into 8-wide sublanes, so a batch of 12 pads to
# 16 and wastes 25% of every activation pass; re-measuring the misaligned
# configs at the tile-aligned batch is the honest TPU number
# (measured: ssd_512_vgg16 122 -> 160 img/s, retina 180 -> 231; docs/PERF.md).
ALIGNED = {
    'ssd_512_vgg16_coco.py': 16,
    'retina_rn50_500_coco.py': 16,
}


def build_from_config(path, dtype, packed_stem=False):
    """Assemble bundle + criterion + assigner + tx + postprocessor from a
    sample config (the same calls Experiment.__init__ makes, engine.py:126-179,
    minus datasets/loaders)."""
    from single_shot_detection_tpu.models import builder
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    from single_shot_detection_tpu.ops.losses import MultiboxLoss
    from single_shot_detection_tpu.ops.matching import TargetAssigner
    from single_shot_detection_tpu.ops.postprocess import Postprocessor
    from single_shot_detection_tpu.ops.sampling import build_sampler
    from single_shot_detection_tpu.train import optimizers
    from single_shot_detection_tpu.utils.config import load_config
    from single_shot_detection_tpu.utils.misc import filter_kwargs

    cfg = load_config(path, phases=[])
    model_cfg = dict(cfg.model)
    detector_cfg = dict(model_cfg['detector'])
    base_cfg = dict(model_cfg['base'])
    if packed_stem:
        base_cfg['packed_stem'] = True
    bundle = builder.build(
        base=base_cfg,
        anchor_generator=model_cfg['anchor_generator'],
        input_size=tuple(cfg.input_size),
        dtype=dtype,
        **{k: v for k, v in detector_cfg.items()
           if k in ('num_classes', 'use_depthwise', 'features', 'extras',
                    'predictor', 'heads')})

    sampler_cfg = dict(cfg.sampler or {'name': 'naive_sampler'})
    sampler = build_sampler(sampler_cfg.pop('name'), **sampler_cfg)
    coder = filter_kwargs(BoxCoder)(**(cfg.box_coder or {}))
    criterion = filter_kwargs(MultiboxLoss)(
        sampler=sampler, box_coder=coder, **cfg.loss)
    assigner = filter_kwargs(TargetAssigner)(**(cfg.target_assigner or {}))
    postprocessor = filter_kwargs(Postprocessor)(
        box_coder=coder, **cfg.postprocess)

    opt_cfg = dict((cfg.train or {}).get('optimizer',
                                         {'name': 'SGD', 'lr': 1e-3}))
    opt_cfg = {k: v for k, v in opt_cfg.items()
               if not isinstance(v, str) or k == 'name'}  # skip uninterpolated
    tx = optimizers.create_optimizer(opt_cfg)
    return cfg, bundle, criterion, assigner, postprocessor, tx


def bench_config(name, batch, dtype, steps, frozen_bn=False, int8=False,
                 group_norm=False, pre_nms_top_k=None, approx_top_k=False,
                 recall_target=0.95, preset=False, infer_only=False,
                 packed_stem=False, fused_bn=False):
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step)
    from single_shot_detection_tpu.train.step import make_predict_step

    path = os.path.join(ROOT, 'samples', name)
    cfg, bundle, criterion, assigner, postprocessor, tx = build_from_config(
        path, dtype, packed_stem=packed_stem)
    anchors = bundle.anchors()
    input_size = tuple(cfg.input_size)
    print(f'--- {name}: input {input_size}, batch {batch}, '
          f'{anchors.shape[0]} anchors, compiling...', flush=True)

    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(state.params))
    int8_opts = {}
    if preset:
        # zero-hand-flags mode: the engine-level serving preset decides
        # everything from the config (engine.serving_postprocessor +
        # quantize.resolve_int8_opts; docs/SERVING.md recipes)
        from single_shot_detection_tpu.export import quantize
        from single_shot_detection_tpu.ops.postprocess import (
            Postprocessor as _PP)
        from single_shot_detection_tpu.utils.misc import filter_kwargs
        from single_shot_detection_tpu.ops.box_coder import BoxCoder
        pp_cfg = _PP.serving_preset(cfg.postprocess, anchors.shape[0])
        postprocessor = filter_kwargs(_PP)(
            box_coder=filter_kwargs(BoxCoder)(**(cfg.box_coder or {})),
            **pp_cfg)
        int8, int8_opts = quantize.preset_int8(cfg, batch_size=batch)
        print(f'    preset: pre_nms_top_k='
              f'{pp_cfg.get("pre_nms_top_k")}, int8={int8}'
              f'{" spatial_limit=%s" % int8_opts.get("spatial_limit") if int8_opts.get("spatial_limit") else ""}',
              flush=True)
    apply_fn = None
    if fused_bn:
        # train.fused_bn: Pallas fused train-mode BN (ops/bn_pallas.py);
        # only shapes the TRAIN column — the predict path keeps plain BN
        from single_shot_detection_tpu.ops import bn_pallas
        apply_fn = bn_pallas.fused_bn_apply(bundle.module)
    if group_norm:
        if int8 or frozen_bn:
            # same contract the engine enforces: the int8 predict path
            # ignores apply_fn (it would measure a plain-BN forward under
            # a 'group_norm' label), and frozen_bn is meaningless with GN
            raise ValueError('--group-norm does not compose with '
                             '--int8/--frozen-bn')
        from single_shot_detection_tpu.models.norm import group_norm_apply
        apply_fn = group_norm_apply(bundle.module)
    batch_data = synth_batch(batch, input_size, bundle.num_classes)
    compile_s = 0.0
    train_img_s = float('nan')
    if not infer_only:
        step = make_train_step(bundle.module, criterion, assigner, anchors,
                               tx, donate=True, frozen_bn=frozen_bn,
                               apply_fn=apply_fn)

        key = jax.random.PRNGKey(1)
        t_c0 = time.perf_counter()
        state, metrics = step(state, batch_data, key)
        jax.block_until_ready(metrics['loss'])
        compile_s = time.perf_counter() - t_c0

        elapsed = None
        for _ in range(2):  # first loop discarded (relay slow path)
            t0 = time.perf_counter()
            for i in range(steps):
                state, metrics = step(state, batch_data,
                                      jax.random.fold_in(key, i))
            jax.block_until_ready(metrics['loss'])
            elapsed = time.perf_counter() - t0
        train_img_s = batch * steps / elapsed

    # fused inference: forward + on-chip postprocess
    if pre_nms_top_k is not None:
        postprocessor.pre_nms_top_k = int(pre_nms_top_k)
        postprocessor.pre_nms_approx = bool(approx_top_k)
        postprocessor.pre_nms_recall = float(recall_target)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    if int8:
        from single_shot_detection_tpu.export import quantize
        amax = quantize.calibrate(bundle.module, variables,
                                  [batch_data['image']])
        predict = quantize.make_quantized_predict_step(
            bundle.module, postprocessor, anchors, amax,
            spatial_limit=int8_opts.get('spatial_limit'))
    else:
        predict = make_predict_step(bundle.module, postprocessor, anchors,
                                    apply_fn=apply_fn)
    out = predict(variables, batch_data['image'])
    jax.block_until_ready(out)
    elapsed = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = predict(variables, batch_data['image'])
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - t0
    infer_img_s = batch * steps / elapsed

    import math
    row = {
        'config': name.replace('.py', ''),
        'batch': batch,
        'input': list(input_size),
        'params_m': round(float(n_params) / 1e6, 2),
        'train_img_s': (None if math.isnan(train_img_s)
                        else round(train_img_s, 1)),
        'train_ms_per_step': (None if math.isnan(train_img_s)
                              else round(1000.0 * batch / train_img_s, 2)),
        'infer_img_s': round(infer_img_s, 1),
        'compile_s': round(compile_s, 1),
        'dtype': str(jnp.zeros((), dtype).dtype),
    }
    if preset:
        row['preset'] = True
        if int8_opts.get('spatial_limit'):
            row['spatial_limit'] = int8_opts['spatial_limit']
    if frozen_bn:
        row['frozen_bn'] = True
    if group_norm:
        row['group_norm'] = True
    if int8:
        row['int8_infer'] = True
    if pre_nms_top_k is not None:
        row['pre_nms_top_k'] = int(pre_nms_top_k)
        if approx_top_k:
            row['approx_top_k'] = True
    if packed_stem:
        row['packed_stem'] = True
    if fused_bn:
        row['fused_bn'] = True
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--configs', default=None,
                    help='comma-separated subset of config file names')
    ap.add_argument('--no-aligned', action='store_true',
                    help='skip the extra tile-aligned-batch rows (ALIGNED)')
    ap.add_argument('--group-norm', action='store_true',
                    help='run every BatchNorm as GroupNorm '
                         '(train.group_norm; models/norm.py)')
    ap.add_argument('--frozen-bn', action='store_true',
                    help='measure the frozen-BN fine-tune step (running-stat '
                         'normalization, no batch-stat reductions; '
                         'train.frozen_bn)')
    ap.add_argument('--batch', type=int, default=None,
                    help='override the reference batch size for every config')
    ap.add_argument('--int8', action='store_true',
                    help='run the inference column through the calibrated '
                         'int8 PTQ path (export/quantize.py)')
    ap.add_argument('--pre-nms-top-k', type=int, default=None,
                    help='candidate pre-selection budget for the inference '
                         'column (postprocess.pre_nms_top_k)')
    ap.add_argument('--approx-top-k', action='store_true',
                    help='use jax.lax.approx_max_k for the candidate '
                         'pre-selection (requires --pre-nms-top-k)')
    ap.add_argument('--recall-target', type=float, default=0.95)
    ap.add_argument('--preset', action='store_true',
                    help='zero-hand-flags serving preset: pre_nms_top_k and '
                         'int8/spatial_limit auto-chosen per config '
                         '(engine-level recipes, docs/SERVING.md)')
    ap.add_argument('--infer-only', action='store_true',
                    help='skip the train-step column (serving measurement)')
    ap.add_argument('--packed-stem', action='store_true',
                    help='evaluate VGG-family stems in the column-pair-'
                         'packed layout (models/vgg.py packed_stem — '
                         'full 128-lane tiles on the C=64 stem)')
    ap.add_argument('--fused-bn', action='store_true',
                    help='Pallas fused train-mode BatchNorm '
                         '(train.fused_bn; ops/bn_pallas.py)')
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32

    rows = []
    for name, batch in PARITY:
        if args.configs and name.replace('.py', '') not in args.configs:
            continue
        batch = args.batch or batch
        if args.infer_only and args.batch is None and batch % 8:
            # serving measurement with no explicit batch: the batch is OURS
            # to choose, and a misaligned one pads to the 8-wide sublane
            # tile and wastes the padding on every activation pass
            # (+29-31% measured on the b12 configs; docs/PERF.md) — align
            # it by default, like the rest of the serving preset
            aligned = batch + (-batch) % 8
            print(f'    [{name}] serving batch {batch} -> {aligned} '
                  f'(8-wide tile alignment; --batch to pin)', flush=True)
            batch = aligned
        pp_kw = dict(pre_nms_top_k=args.pre_nms_top_k,
                     approx_top_k=args.approx_top_k,
                     recall_target=args.recall_target)
        rows.append(_retry(bench_config, name, batch, dtype, args.steps,
                           frozen_bn=args.frozen_bn, int8=args.int8,
                           group_norm=args.group_norm, preset=args.preset,
                           infer_only=args.infer_only,
                           packed_stem=args.packed_stem,
                           fused_bn=args.fused_bn, **pp_kw))
        if (name in ALIGNED and not args.no_aligned and args.batch is None
                and not args.infer_only):
            rows.append(_retry(bench_config, name, ALIGNED[name], dtype,
                               args.steps, frozen_bn=args.frozen_bn,
                               group_norm=args.group_norm,
                               int8=args.int8, preset=args.preset,
                               infer_only=args.infer_only,
                               packed_stem=args.packed_stem,
                               fused_bn=args.fused_bn, **pp_kw))

    print('\nconfig                      batch  train img/s   ms/step  infer img/s')
    for r in rows:
        print(f"{r['config']:<27} {r['batch']:>5} "
              f"{str(r['train_img_s']):>12} "
              f"{str(r['train_ms_per_step']):>9} {r['infer_img_s']:>12}")


if __name__ == '__main__':
    main()
