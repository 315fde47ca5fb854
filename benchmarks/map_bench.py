"""COCO-scale mAP benchmark: 5k images x 80 classes x 100 predictions.

Host-side eval-metric throughput (the reference computes mAP with a python
loop over every prediction, mean_average_precision.py:40-69 — ~500k
iterations at this volume; the vectorized path packs GT into a padded
per-group table and resolves greedy dedup with one global np.unique).

Usage: python benchmarks/map_bench.py [--loop]
"""

import argparse
import time

import numpy as np

from single_shot_detection_tpu.ops.metrics import (
    coco_mean_average_precision, mean_average_precision,
    mean_average_precision_loop)


def synth(n_img=5000, n_cls=80, preds_per=100, seed=0):
    rng = np.random.RandomState(seed)
    gts = []
    for _ in range(n_img):
        k = rng.randint(1, 15)
        xy = rng.rand(k, 2) * 400
        wh = rng.rand(k, 2) * 100 + 5
        cls = rng.randint(1, n_cls + 1, (k, 1)).astype(float)
        gts.append(np.concatenate(
            [xy, xy + wh, cls, np.ones((k, 1)),
             (rng.rand(k, 1) < 0.05).astype(float)], 1))
    preds = []
    for i in range(n_img):
        base = gts[i]
        k = preds_per
        idx = rng.randint(0, len(base), k)
        rows = np.zeros((k, 7))
        rows[:, 0] = i
        rows[:, 1:5] = base[idx, :4] + rng.randn(k, 4) * 8
        rows[:, 5] = np.where(rng.rand(k) < 0.9, base[idx, 4],
                              rng.randint(1, n_cls + 1, k))
        rows[:, 6] = rng.rand(k)
        preds.append(rows)
    return np.concatenate(preds), gts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--loop', action='store_true',
                    help='also time the reference-semantics loop oracle '
                         '(slow: minutes at full volume)')
    ap.add_argument('--images', type=int, default=5000)
    ap.add_argument('--coco', action='store_true',
                    help='also time the COCO-protocol sweep and the '
                         'extended scoreboard (area AP + AR@k)')
    args = ap.parse_args()

    preds, gts = synth(n_img=args.images)
    print(f'{len(preds)} predictions, {sum(len(g) for g in gts)} GT boxes')

    # warm numpy, then measure
    mean_average_precision(preds[:1000], gts[:10], {}, 0.5, verbose=False)
    t0 = time.time()
    m = mean_average_precision(preds, gts, {}, 0.5, verbose=False)
    dt = time.time() - t0
    print(f'vectorized: {dt:.2f}s  mAP={m:.4f}  '
          f'({len(preds) / dt / 1e3:.0f}k preds/s)')

    if args.coco:
        t0 = time.time()
        out = coco_mean_average_precision(preds, gts, verbose=False)
        dt_c = time.time() - t0
        print(f'COCO sweep (10 thr): {dt_c:.2f}s  '
              f'mAP@[.5:.95]={out["mAP@[.5:.95]"]:.4f}')
        t0 = time.time()
        out = coco_mean_average_precision(preds, gts, extended=True,
                                          verbose=False)
        dt_e = time.time() - t0
        print(f'COCO extended (areas + AR@k, 70 sweeps): {dt_e:.2f}s  '
              f'AR@100={out["AR@100"]:.4f}')

    if args.loop:
        t0 = time.time()
        m2 = mean_average_precision_loop(preds, gts, {}, 0.5, verbose=False)
        dt2 = time.time() - t0
        print(f'loop oracle: {dt2:.2f}s  mAP={m2:.4f}  ({dt2 / dt:.1f}x slower)')


if __name__ == '__main__':
    main()
