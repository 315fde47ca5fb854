"""Aggregate cross-framework parity runs into mean / sd / 95% CI.

Collects ``results.json`` files produced by tools/parity_run.py (one
workdir per seed) plus optional inline rows, and prints per-framework
means with the normal-approximation 95% confidence interval on the mean
delta — the statistic PARITY.md reports for the full-augmentation-chain
protocol, where per-seed pairing is meaningless (augmentation RNG
streams cannot be matched across frameworks) and only the means compare.

Usage:
  python tools/parity_stats.py /tmp/p23 /tmp/p24 ... [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def collect(workdirs):
    rows = []
    for wd in workdirs:
        path = os.path.join(wd, 'results.json')
        if not os.path.exists(path):
            print(f'-- skipping {wd}: no results.json', file=sys.stderr)
            continue
        r = json.load(open(path))
        if 'reference' not in r or 'ours' not in r:
            print(f'-- skipping {wd}: incomplete run', file=sys.stderr)
            continue
        rows.append({
            'workdir': wd,
            'reference': float(r['reference']['mAP_by_our_metric']),
            'ours': float(r['ours']['mAP']),
        })
    return rows


def stats(values):
    n = len(values)
    mean = sum(values) / n
    var = sum((v - mean) ** 2 for v in values) / max(n - 1, 1)
    return mean, math.sqrt(var)


def summarize(rows):
    ref = [r['reference'] for r in rows]
    ours = [r['ours'] for r in rows]
    n = len(rows)
    ref_mean, ref_sd = stats(ref)
    ours_mean, ours_sd = stats(ours)
    delta = ours_mean - ref_mean
    # two-sample (Welch) standard error of the difference of means;
    # 1.96 = normal 95% (n >= 20 makes the t correction negligible)
    se = math.sqrt(ref_sd ** 2 / n + ours_sd ** 2 / n)
    return {
        'n': n,
        'reference_mean': round(ref_mean, 4),
        'reference_sd': round(ref_sd, 4),
        'ours_mean': round(ours_mean, 4),
        'ours_sd': round(ours_sd, 4),
        'delta_mean': round(delta, 4),
        'delta_ci95': round(1.96 * se, 4),
        'positive_deltas': sum(o > r for o, r in zip(ours, ref)),
        'negative_deltas': sum(o < r for o, r in zip(ours, ref)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('workdirs', nargs='*', default=[])
    ap.add_argument('--extra', action='append', default=[],
                    metavar='REF:OURS',
                    help='inline row, e.g. 0.712:0.221 (merges recorded '
                         'tables, e.g. PARITY.md round-4 seeds, with '
                         'fresh workdirs)')
    ap.add_argument('--json', action='store_true')
    args = ap.parse_args()
    rows = collect(args.workdirs)
    for spec in args.extra:
        ref, ours = spec.split(':')
        rows.append({'workdir': f'extra{len(rows)}',
                     'reference': float(ref), 'ours': float(ours)})
    if not rows:
        sys.exit('no complete runs found')
    s = summarize(rows)
    if args.json:
        print(json.dumps({'rows': rows, 'summary': s}, indent=2))
        return
    print(f'{"workdir":<12} {"reference":>10} {"ours":>10} {"delta":>8}')
    for r in rows:
        print(f'{os.path.basename(r["workdir"]):<12} '
              f'{r["reference"]:>10.3f} {r["ours"]:>10.3f} '
              f'{r["ours"] - r["reference"]:>+8.3f}')
    print(f'\nn={s["n"]}  reference {s["reference_mean"]} '
          f'(sd {s["reference_sd"]})  ours {s["ours_mean"]} '
          f'(sd {s["ours_sd"]})')
    print(f'mean delta {s["delta_mean"]:+.4f} ± {s["delta_ci95"]} '
          f'(95% CI); signs {s["positive_deltas"]}+ / '
          f'{s["negative_deltas"]}-')


if __name__ == '__main__':
    main()
