"""Paired-seed GroupNorm ablation on the low-variance parity protocol.

Measures what ``train.group_norm`` (every BatchNorm run as GroupNorm —
models/norm.py, engine.py) costs or buys in held-out mAP at IDENTICAL
hyperparameters: same staged 512-image synthetic dataset, same config,
same seeds as PARITY.md's decisive comparison, each seed trained twice
(BN / GN).  Note GN is a different training semantics tuned-for-BN
hyperparameters may under-serve; this pins the out-of-the-box swap.

Usage:
  python tools/gn_ablation.py [--workdir DIR] [--seeds 23 24 25]
                              [--groups 8] [--epochs 60]

Prints a markdown table + writes results.json under the workdir
(resumable); docs are updated by hand from it.
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools import parity_run  # noqa: E402  (staging + run helpers)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/gn_ablation')
    ap.add_argument('--seeds', type=int, nargs='+', default=[23, 24, 25])
    ap.add_argument('--groups', type=int, default=8)
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--train-n', type=int, default=512)
    ap.add_argument('--eval-n', type=int, default=64)
    ap.add_argument('--milestones', default='40,52')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    parity_run.TRAIN_N, parity_run.EVAL_N = args.train_n, args.eval_n
    os.makedirs(args.workdir, exist_ok=True)
    csvs = parity_run.stage_dataset(args.workdir)

    state_path = os.path.join(args.workdir, 'results.json')
    results = (json.load(open(state_path))
               if os.path.exists(state_path) else {})

    for seed in args.seeds:
        for arm in ('base', 'gn'):
            key = f'{arm}_{seed}'
            if key in results:
                continue
            arm_dir = os.path.join(args.workdir, key)
            os.makedirs(arm_dir, exist_ok=True)
            cfgs = parity_run.write_configs(arm_dir, csvs, args.epochs,
                                            seed, args.milestones)
            cfg_path = cfgs['ours']
            if arm == 'gn':
                with open(cfg_path, 'a') as f:
                    f.write(f"\ntrain['group_norm'] = {args.groups}\n")
            print(f'== {key}: training...', flush=True)
            out = parity_run.run_ours(arm_dir, cfg_path, cpu=args.cpu)
            results[key] = {'mAP': out['mAP'],
                            'minutes': round(out['minutes'], 1)}
            json.dump(results, open(state_path, 'w'), indent=2)
            print(json.dumps({key: results[key]}), flush=True)

    rows, deltas = [], []
    for seed in args.seeds:
        b = results.get(f'base_{seed}', {}).get('mAP')
        g = results.get(f'gn_{seed}', {}).get('mAP')
        if b is None or g is None:
            continue
        deltas.append(g - b)
        rows.append(f'| {seed} | {b:.3f} | {g:.3f} | {g - b:+.3f} |')
    print('\n| seed | BN | GN | delta |')
    print('|---|---|---|---|')
    print('\n'.join(rows))
    if deltas:
        import numpy as np
        print(f'| mean | | | {np.mean(deltas):+.3f} '
              f'(± {np.std(deltas):.3f}) |')


if __name__ == '__main__':
    main()
