"""A/B the eval loop's host-sync discipline (round-4 engine change).

``Experiment.evaluate`` used to pull ``float(metrics[k])`` x3 and the
detections every batch — each pull a host<->device sync that stalls the
dispatch pipeline (expensive through a relay-attached TPU; the train loop
was fixed in round 3, eval in round 4).  This bench times the CURRENT
evaluate() against a faithful reconstruction of the legacy per-batch-sync
loop built from the same compiled eval_step and the same batches, so the
delta isolates the sync discipline itself.

Usage: python benchmarks/eval_sync_bench.py [--images 256] [--rounds 3]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import jax
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=256)
    ap.add_argument('--rounds', type=int, default=3)
    args = ap.parse_args()

    import bench as bench_mod
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    bench_mod.E2E_IMAGES = args.images
    with tempfile.TemporaryDirectory() as root:
        csv_path = bench_mod.stage_jpeg_dataset(root)
        cfg = load_config(os.path.join(ROOT, 'samples', 'ssd_mb2_voc.py'))
        cfg.config.dataset = {
            'train': {'name': 'Csv', 'path': csv_path},
            'eval': {'name': 'Csv', 'path': csv_path},
            'labels': bench_mod.VOC_LABELS,
        }
        cfg.config.train['epochs'] = 0
        on_tpu = jax.devices()[0].platform != 'cpu'
        exp = Experiment(cfg, phases=['train', 'eval'], debug=True,
                         bf16=on_tpu)

        # warm both paths (compile + relay slow path)
        exp.evaluate()
        legacy_s = _legacy_eval(exp)

        new_times, legacy_times = [], []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            exp.evaluate()
            new_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _legacy_eval(exp)
            legacy_times.append(time.perf_counter() - t0)

    out = {
        'eval_images': args.images,
        'new_eval_s_median': round(sorted(new_times)[len(new_times) // 2], 2),
        'legacy_eval_s_median': round(
            sorted(legacy_times)[len(legacy_times) // 2], 2),
        'new_eval_s_best': round(min(new_times), 2),
        'legacy_eval_s_best': round(min(legacy_times), 2),
    }
    out['speedup_median'] = round(
        out['legacy_eval_s_median'] / out['new_eval_s_median'], 2)
    print()
    print(json.dumps(out), flush=True)


def _legacy_eval(exp):
    """The pre-round-4 evaluate loop: per-batch float() x3 + immediate
    device_get of the detections (engine.py history, round-3 tree)."""
    from single_shot_detection_tpu import parallel
    eval_state = exp.state.replace(params=exp._eval_params())
    loader = exp.loaders['eval']
    sums = {'loss': 0.0, 'class_loss': 0.0, 'loc_loss': 0.0}
    count = 0
    pulled = []
    for bidx, batch in enumerate(loader):
        raw = exp._shard({'image': batch['image'], 'boxes': batch['boxes'],
                          'box_mask': batch['box_mask'],
                          'ids': batch['ids']})
        device_batch, full_boxes = exp._augment(raw, train=False,
                                                salt=bidx, with_full=True)
        device_batch['image_valid'] = raw['ids'] >= 0
        metrics, dets, valid = exp.eval_step(eval_state, device_batch)
        count += 1
        for k in sums:
            sums[k] += float(metrics[k])  # <- the per-batch sync
        pulled.append({
            'dets': parallel.host_local_rows(dets),
            'valid': parallel.host_local_rows(valid),
            'mask': parallel.host_local_rows(device_batch['box_mask']),
            'gt': parallel.host_local_rows(full_boxes),
            'ids': np.asarray(batch['ids']),
        })
    return sums, count, pulled


if __name__ == '__main__':
    main()
