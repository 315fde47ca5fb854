#!/usr/bin/env python3
"""Host loader throughput: decode path vs the on-disk staging cache.

Measures full loader epochs (decode + stage + collate, threaded) over the
same VOC-scale synthetic JPEG dataset bench.py uses for its e2e phase:

  * ``decode``  — the C++ turbojpeg batch path (steady state without cache)
  * ``cache_fill`` — first epoch with ``cache_dir`` (decode + memmap write)
  * ``cached``  — later epochs (memmap read only; no decode anywhere)

Pure host benchmark — no accelerator involved; run it on the training host
to size ``num_workers`` / decide whether ``train.staging_cache`` pays.

    PYTHONPATH=/root/repo python benchmarks/loader_bench.py [--images 256]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def epoch_rate(loader, epochs=1):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += int((batch['ids'] >= 0).sum())
    return n / (time.perf_counter() - t0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--images', type=int, default=256)
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--staging', type=int, nargs=2, default=(300, 300))
    parser.add_argument('--colorspace', default='rgb',
                        choices=['rgb', 'yuv420'])
    args = parser.parse_args()

    import bench
    from single_shot_detection_tpu.data.datasets import Csv
    from single_shot_detection_tpu.data.loader import Loader

    bench.E2E_IMAGES = args.images
    with tempfile.TemporaryDirectory() as root:
        csv_path = bench.stage_jpeg_dataset(root)
        dataset = Csv(csv_path, labels=bench.VOC_LABELS)
        kw = dict(batch_size=args.batch, staging_size=tuple(args.staging),
                  num_workers=args.workers,
                  staging_colorspace=args.colorspace)

        plain = Loader(dataset, **kw)
        epoch_rate(plain)  # warm the page cache for the JPEG files
        decode = epoch_rate(plain, epochs=2)

        cached_loader = Loader(dataset, cache_dir=os.path.join(root, 'c'),
                               **kw)
        fill = epoch_rate(cached_loader)
        assert cached_loader.cache.complete
        cached = epoch_rate(cached_loader, epochs=4)

    print(json.dumps({
        'metric': 'loader_epoch_img_s',
        'images': args.images,
        'colorspace': args.colorspace,
        'decode': round(decode, 1),
        'cache_fill': round(fill, 1),
        'cached': round(cached, 1),
        'speedup': round(cached / decode, 2),
    }))


if __name__ == '__main__':
    main()
