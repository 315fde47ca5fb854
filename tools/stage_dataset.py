#!/usr/bin/env python3
"""Prebuild the on-disk staging cache for a config's datasets.

The staging cache (single_shot_detection_tpu/data/cache.py) memoizes the
loader's deterministic host work — JPEG decode + staging resize (+ YUV420
packing) — so steady-state training never decodes.  It fills lazily during
the first epoch anyway; this tool front-loads that cost offline (e.g. on a
beefier CPU box before shipping the cache directory to the TPU host), the
spiritual sibling of tools/resize_to_smallest.py (reference
tools/resizeToSmallest.py: offline dataset preprocessing).

    PYTHONPATH=. python tools/stage_dataset.py \
        --config samples/ssd_mb2_voc.py --cache-dir /data/voc_staged

Then train with ``train.staging_cache = '/data/voc_staged'`` (or pass the
same path in the config).
"""

import argparse
import logging
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', required=True,
                        help='Config file whose datasets to stage')
    parser.add_argument('--cache-dir', required=True,
                        help='Cache directory (one subdir per phase)')
    parser.add_argument('--phases', nargs='+', default=['train', 'eval'],
                        choices=['train', 'eval'])
    parser.add_argument('--batch-size', type=int, default=64,
                        help='Decode batch size (throughput only)')
    parser.add_argument('--num-workers', type=int, default=4)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format='%(message)s')

    from single_shot_detection_tpu.data.loader import Loader
    from single_shot_detection_tpu.train.engine import create_datasets
    from single_shot_detection_tpu.utils.config import load_config

    cfg = load_config(args.config, phases=args.phases)
    datasets = create_datasets(dict(cfg.dataset), args.phases)
    if not datasets:
        logging.error('XX config has no datasets for the requested phases')
        sys.exit(1)

    train_cfg = dict(cfg.train or {})
    staging = tuple(train_cfg.get('staging_size', cfg.input_size))
    colorspace = str(train_cfg.get('staging_colorspace', 'rgb'))

    import os
    for phase, dataset in datasets.items():
        loader = Loader(dataset,
                        batch_size=args.batch_size,
                        staging_size=staging,
                        num_workers=args.num_workers,
                        staging_colorspace=colorspace,
                        cache_dir=os.path.join(args.cache_dir, phase))
        if loader.cache.complete:
            logging.info(f'== {phase}: cache already complete '
                         f'({loader.cache.n} images)')
            continue
        start = time.time()
        n = 0
        for batch in loader:
            n += int((batch['ids'] >= 0).sum())
            done = loader.cache.hit_count
            print(f'\r== {phase}: {done}/{loader.cache.n} staged', end='',
                  flush=True)
        loader.cache.flush()
        dt = time.time() - start
        print()
        logging.info(f'== {phase}: {loader.cache.hit_count}/{loader.cache.n} '
                     f'images staged in {dt:.1f}s ({n / max(dt, 1e-9):.0f} '
                     'img/s)')


if __name__ == '__main__':
    main()
