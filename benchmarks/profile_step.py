"""Profile a parity config's jitted train step and aggregate device op time.

Captures a ``jax.profiler.trace`` of N steps, parses the Chrome-trace JSON
the TPU runtime emits (``trace.json.gz``), and aggregates device-stream op
durations by fusion family — the tooling behind docs/PERF.md's step
decompositions (the reference has no profiling integration at all,
SURVEY.md §5).

Usage:
  python benchmarks/profile_step.py --config ssd_300_vgg16_voc --batch 16
  python benchmarks/profile_step.py --config ssd_mb2_voc --batch 32 --top 25
  python benchmarks/profile_step.py --config retina_rn50_500_coco --batch 16 \
      --predict --pre-nms-top-k 1000      # fused inference step instead
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def capture(config, batch, dtype, steps, profile_dir, predict=False,
            pre_nms_top_k=None):
    from benchmarks.parity_bench import build_from_config
    from benchmarks._util import synth_batch
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step)

    path = os.path.join(ROOT, 'samples', config + '.py')
    cfg, bundle, criterion, assigner, postprocessor, tx = build_from_config(
        path, dtype)
    anchors = bundle.anchors()
    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    b = synth_batch(batch, tuple(cfg.input_size), bundle.num_classes)
    key = jax.random.PRNGKey(1)

    if predict:
        from single_shot_detection_tpu.train.step import make_predict_step
        if pre_nms_top_k is not None:
            postprocessor.pre_nms_top_k = int(pre_nms_top_k)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        step_fn = make_predict_step(bundle.module, postprocessor, anchors)
        out = step_fn(variables, b['image'])
        jax.block_until_ready(out)
        for _ in range(3):  # post-compile warmup (relay slow path)
            out = step_fn(variables, b['image'])
        jax.block_until_ready(out)
        with jax.profiler.trace(profile_dir):
            for _ in range(steps):
                out = step_fn(variables, b['image'])
            jax.block_until_ready(out)
        return

    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=True)

    state, m = step(state, b, key)
    jax.block_until_ready(m['loss'])
    for i in range(3):  # post-compile warmup (relay slow path)
        state, m = step(state, b, jax.random.fold_in(key, i))
    jax.block_until_ready(m['loss'])

    with jax.profiler.trace(profile_dir):
        for i in range(steps):
            state, m = step(state, b, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(m['loss'])


FAMILY_RULES = [
    ('convolution', 'convolution (MXU)'),
    ('convert_reduce', 'convert+reduce (BN/grad reductions)'),
    ('all-reduce', 'collective'),  # must precede the 'reduce' substring
    ('reduce', 'reduce'),
    ('multiply_add', 'multiply_add fusion (VPU)'),
    ('copy', 'copy / layout'),
    ('transpose', 'transpose'),
    ('sort', 'sort'),
    ('scatter', 'scatter'),
    ('gather', 'gather'),
    ('dynamic', 'dynamic slice/update'),
    ('dot', 'dot (MXU)'),
]


def family(name):
    base = name.split('.')[0]
    for pat, fam in FAMILY_RULES:
        if pat in base:
            return fam
    return 'fusion (other)'


def aggregate(profile_dir, steps, top):
    traces = glob.glob(os.path.join(profile_dir, 'plugins', 'profile', '*',
                                    '*trace.json.gz'))
    if not traces:
        raise SystemExit('no trace.json.gz captured under ' + profile_dir)
    with gzip.open(traces[0], 'rt') as f:
        data = json.load(f)

    # device lanes: pids whose process name mentions TPU / device XLA ops;
    # within them, only the leaf "XLA Ops" thread (module/step lanes nest
    # the same time again and would double count)
    pid_names, tid_names = {}, {}
    for ev in data.get('traceEvents', []):
        if ev.get('ph') != 'M':
            continue
        if ev.get('name') == 'process_name':
            pid_names[ev['pid']] = ev['args'].get('name', '')
        elif ev.get('name') == 'thread_name':
            tid_names[(ev['pid'], ev.get('tid'))] = ev['args'].get('name', '')

    device_pids = {pid for pid, n in pid_names.items()
                   if re.search(r'TPU|/device:|XLA Ops', n, re.I)}
    op_lanes = {key for key, n in tid_names.items()
                if key[0] in device_pids and re.search(r'XLA Ops', n, re.I)}
    if not op_lanes:
        raise SystemExit(
            'trace parsed but no device "XLA Ops" lane matched — profiler '
            'lane naming may have changed; refusing to report a 0-ms step. '
            f'process names seen: {sorted(set(pid_names.values()))[:10]}')

    by_op = collections.Counter()
    by_fam = collections.Counter()
    total = 0.0
    for ev in data.get('traceEvents', []):
        if ev.get('ph') != 'X':
            continue
        if (ev.get('pid'), ev.get('tid')) not in op_lanes:
            continue
        name = ev.get('name', '')
        dur = ev.get('dur', 0) / 1e3  # us -> ms
        # skip run/launch markers
        if not name or name.startswith(('ProgramExecute', 'RunExecutable')):
            continue
        by_op[name] += dur
        by_fam[family(name)] += dur
        total += dur

    print(f'\ndevice op time total: {total:.2f} ms over {steps} steps '
          f'({total / steps:.2f} ms/step)')
    print('\nby family (ms/step, share):')
    for fam, ms in by_fam.most_common():
        print(f'  {fam:<42} {ms / steps:7.3f}  {100 * ms / total:5.1f}%')
    print(f'\ntop {top} individual ops (ms/step):')
    for name, ms in by_op.most_common(top):
        print(f'  {ms / steps:8.3f}  {name[:110]}')
    return {fam: ms / steps for fam, ms in by_fam.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='ssd_mb2_voc')
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--steps', type=int, default=5)
    ap.add_argument('--top', type=int, default=15)
    ap.add_argument('--keep', action='store_true',
                    help='keep the profile dir and print its path')
    ap.add_argument('--predict', action='store_true',
                    help='profile the fused inference step (forward + '
                         'decode + NMS) instead of the train step')
    ap.add_argument('--pre-nms-top-k', type=int, default=None,
                    help='postprocess.pre_nms_top_k override (predict mode)')
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32

    ctx = tempfile.mkdtemp(prefix='profile_step_')
    try:
        capture(args.config, args.batch, dtype, args.steps, ctx,
                predict=args.predict, pre_nms_top_k=args.pre_nms_top_k)
        time.sleep(1)
        aggregate(ctx, args.steps, args.top)
    finally:
        if args.keep:
            print('\nprofile dir:', ctx)
        else:
            shutil.rmtree(ctx, ignore_errors=True)


if __name__ == '__main__':
    main()
