"""Benchmark: SSD300-MobileNetV2 (ssd_mb2_voc) training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Numbers measured (round-2 verdict: keep ALL, headline the chip):
  * ``value`` — images/sec/chip per BASELINE.json's stated metric: the jitted
    train step on a pre-staged device batch at the FLAGSHIP batch size 128.
    Batch 128 is the production single-chip configuration (round-3 roofline,
    docs/PERF.md): per-image HBM traffic halves vs batch 32 (274 MB vs
    554 MB per 128 images) and per-image efficiency is ~1.7x; the round-2
    verdict explicitly sanctioned promoting it.  The reference-batch-32 step
    is reported alongside as ``device_step_img_s_b32``.
  * ``end_to_end_img_s`` — a user's actual epoch through
    ``Experiment.train()`` — JPEG decode (native C++ batch decoder), host
    staging, fused on-device augmentation, jitted train step, metric
    accounting.  Measured on a staged synthetic VOC-scale JPEG dataset
    (500x375 JPEGs on disk, Csv annotations).  On THIS harness it is bound by
    the ~70 MB/s remote-TPU relay link (docs/PERF.md), so it is reported as
    context, not as the headline.

The reference publishes no numbers (BASELINE.md); ``REFERENCE_GPU_IMG_S`` is
a documented ESTIMATE for the reference PyTorch pipeline training
SSD300-MobileNetV2 (batch 32) on a contemporary single GPU — the reported
``vs_baseline`` ratio is against the >=5x north-star target and its basis is
labeled in the JSON (``baseline_basis``).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._util import retry as _retry, synth_batch as _synth_batch

REFERENCE_GPU_IMG_S = 120.0  # estimated reference GPU e2e throughput (see docstring)

BATCH = 32
BATCH_LARGE = 128  # the amortization point: ~1.7x per-image efficiency
IMG = 300
STEPS = 20
E2E_IMAGES = 256          # images per epoch in the staged dataset
E2E_EPOCHS = 3            # timed epochs (after one warmup/compile epoch)

VOC_LABELS = ['background'] + [f'class_{i}' for i in range(1, 21)]


def bench_device_step(dtype, batch_size=BATCH):
    """Jitted train step on a pre-staged device batch (round-1 metric)."""
    print(f'bench: device-step phase (batch {batch_size}; first compile '
          'through the relay can take minutes)...', flush=True)
    import __graft_entry__ as ge
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step)

    bundle = ge._flagship(img_size=IMG, dtype=dtype)
    anchors = bundle.anchors()
    _, criterion, assigner, tx = ge._training_pieces(bundle)

    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=True)

    batch = _synth_batch(batch_size, (IMG, IMG))

    key = jax.random.PRNGKey(1)
    # compile + warmup; the first post-compile timing loop is additionally
    # discarded (remote-TPU relays run a slow path right after compilation)
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics['loss'])

    elapsed = None
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(metrics['loss'])
        elapsed = time.perf_counter() - t0
    return batch_size * STEPS / elapsed


def stage_jpeg_dataset(root, images=None):
    """Write a VOC-scale synthetic JPEG dataset + Csv annotations."""
    from PIL import Image

    rng = np.random.RandomState(23)
    palette = np.random.RandomState(1234).randint(64, 255, size=(21, 3))
    rows = []
    w, h = 500, 375  # typical VOC image size
    for n in range(images if images is not None else E2E_IMAGES):
        img = rng.randint(0, 48, size=(h, w, 3), dtype=np.uint8)
        for _ in range(rng.randint(1, 6)):
            bw = rng.randint(w // 8, w // 2)
            bh = rng.randint(h // 8, h // 2)
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            cls = rng.randint(1, 21)
            img[y0:y0 + bh, x0:x0 + bw] = palette[cls]
            rows.append(f'{n:05d}.jpg,{x0},{y0},{x0 + bw - 1},{y0 + bh - 1},'
                        f'{VOC_LABELS[cls]}')
        Image.fromarray(img).save(os.path.join(root, f'{n:05d}.jpg'),
                                  quality=85)
    csv_path = os.path.join(root, 'annotations.csv')
    with open(csv_path, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    return csv_path


def bench_end_to_end(bf16, staging_colorspace='rgb', staging_cache=False,
                     device_cache=False, batch_size=BATCH,
                     images=E2E_IMAGES):
    """A user's epoch: main.py's Experiment on a staged JPEG dataset.

    ``staging_colorspace='yuv420'`` measures the packed-YUV staging path
    (1.5 B/px over the host->device link instead of 3 — the direct lever on
    the transfer-bandwidth term that bounds e2e on this relay harness).
    ``staging_cache`` measures with the on-disk staging cache
    (train.staging_cache): the warmup epoch fills it, so the timed epochs
    run decode-free — the steady state of a cache-enabled run.
    ``device_cache`` measures the HBM-resident dataset
    (train.device_cache): the warmup epoch fills HBM, so the timed epochs
    assemble batches with an on-device gather — no decode, no host->device
    pixel transfer at all (data/device_cache.py).
    """
    print(f'bench: end-to-end phase ({staging_colorspace}'
          f'{", cached" if staging_cache else ""}'
          f'{", device-cached" if device_cache else ""})...', flush=True)
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    with tempfile.TemporaryDirectory() as root:
        csv_path = stage_jpeg_dataset(root, images=images)
        cfg = load_config(os.path.join(os.path.dirname(__file__),
                                       'samples', 'ssd_mb2_voc.py'))
        cfg.config.dataset = {
            'train': {'name': 'Csv', 'path': csv_path},
            'labels': VOC_LABELS,
        }
        cfg.config.batch_size = batch_size
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 99
        cfg.config.train['staging_colorspace'] = staging_colorspace
        if staging_cache:
            cfg.config.train['staging_cache'] = os.path.join(root, 'stage')
        if device_cache:
            cfg.config.train['device_cache'] = True
        cfg.config.num_workers = 4

        exp = Experiment(cfg, phases=['train'], debug=True, bf16=bf16)
        exp.train()  # warmup epoch: compile + first-loop slow path
        if device_cache:
            # the warmup epoch FILLED the HBM cache; one more epoch pays
            # the gather compile + post-compile slow path, so the timed
            # epochs measure the steady state (as for the other variants)
            exp.train()

        per_epoch = []
        for _ in range(E2E_EPOCHS):
            t0 = time.perf_counter()
            exp.train()
            per_epoch.append(time.perf_counter() - t0)
    steps_per_epoch = images // batch_size
    images = steps_per_epoch * batch_size
    rates = sorted(images / t for t in per_epoch)
    # relay-attached TPUs have high between-epoch transfer-bandwidth
    # variance (docs/PERF.md): report the mean but also best/median
    return {
        'mean': images * len(per_epoch) / sum(per_epoch),
        'median': rates[len(rates) // 2],
        'best': rates[-1],
    }


def wait_for_backend(max_wait_s=None, probe_timeout_s=150):
    """Wait (bounded) for the remote-TPU relay to come back before running.

    The relay has multi-minute outages (docs/PERF.md); a bench run that
    starts during one would die on backend init and record nothing.  JAX
    caches a FAILED backend init for the life of the process, so the probe
    runs in fresh subprocesses; this process only touches the backend after
    a probe succeeds.  If the link never returns, fall through and let the
    real init raise (an honest failure beats silently benching on CPU).

    ``BENCH_BACKEND_WAIT_S`` overrides the wait window (0 = single probe).
    """
    if max_wait_s is None:
        max_wait_s = float(os.environ.get('BENCH_BACKEND_WAIT_S', 1500))
    deadline = time.time() + max_wait_s
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                capture_output=True, timeout=probe_timeout_s,
            )
            if probe.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass  # a hung init counts as unavailable
        if time.time() > deadline:
            print('bench: backend still unavailable after '
                  f'{max_wait_s} s; proceeding (init will raise)', flush=True)
            return
        print('bench: backend unavailable; retrying in 60 s', flush=True)
        time.sleep(60)


def main():
    wait_for_backend()
    # persistent compile cache: re-runs skip the minutes-long relay compiles
    from single_shot_detection_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform != 'cpu'
    # bf16 compute on TPU (replaces the reference's apex AMP, env.py:87-95)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    device_step = _retry(bench_device_step, dtype)
    device_step_b128 = _retry(bench_device_step, dtype,
                              batch_size=BATCH_LARGE)
    e2e = _retry(bench_end_to_end, bf16=on_tpu)
    e2e_yuv = _retry(bench_end_to_end, bf16=on_tpu,
                     staging_colorspace='yuv420')
    e2e_cached = _retry(bench_end_to_end, bf16=on_tpu,
                        staging_colorspace='yuv420', staging_cache=True)
    e2e_device = _retry(bench_end_to_end, bf16=on_tpu,
                        staging_colorspace='yuv420', device_cache=True)
    # the flagship-batch cached e2e: 1024-image epochs at b128 amortize
    # the per-epoch bookkeeping the 8-step b32 epochs cannot
    e2e_device_b128 = _retry(bench_end_to_end, bf16=on_tpu,
                             staging_colorspace='yuv420', device_cache=True,
                             batch_size=BATCH_LARGE, images=1024)

    # BASELINE.json's stated metric is images/sec/chip: the headline `value`
    # is the device train step at the flagship batch (128 — see module
    # docstring).  The end-to-end
    # fields report a user's actual Experiment.train() epoch on THIS harness,
    # which is relay-bandwidth bound (~70 MB/s host->device link through the
    # remote-TPU tunnel; see docs/PERF.md) — a harness property, not a
    # framework one.  The newline guarantees the JSON is alone on its line
    # (the engine's \r progress tail otherwise shares it).
    print(flush=True)
    print(json.dumps({
        'metric': 'train_images_per_sec_chip_ssd300_mb2_b128',
        'value': round(device_step_b128, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(device_step_b128 / REFERENCE_GPU_IMG_S, 3),
        'baseline_basis': 'estimate (reference publishes no numbers; '
                          'denominator is an END-TO-END GPU-pipeline '
                          'estimate while value is the device step — see '
                          'end_to_end_img_s for the like-for-like '
                          'this-harness number, which is relay-bound)',
        'flagship_batch': BATCH_LARGE,
        'device_step_img_s_b32': round(device_step, 2),
        'device_step_img_s_b128': round(device_step_b128, 2),
        'end_to_end_img_s': round(e2e['median'], 2),
        'end_to_end_img_s_mean': round(e2e['mean'], 2),
        'end_to_end_img_s_best': round(e2e['best'], 2),
        # packed-YUV420 staging (train.staging_colorspace): 1.5 B/px over
        # the host->device link instead of 3 — direct relief on the
        # transfer-bandwidth bound
        'end_to_end_img_s_yuv420': round(e2e_yuv['median'], 2),
        'end_to_end_img_s_yuv420_best': round(e2e_yuv['best'], 2),
        # + on-disk staging cache (train.staging_cache): steady-state epochs
        # are decode-free (14.9-24x host loader speedup, docs/PERF.md)
        'end_to_end_img_s_yuv420_cached': round(e2e_cached['median'], 2),
        # + HBM-resident dataset (train.device_cache): steady-state epochs
        # never touch the host — batches gather on-device
        # (data/device_cache.py); e2e converges toward the device step
        'end_to_end_img_s_device_cached': round(e2e_device['median'], 2),
        'end_to_end_img_s_device_cached_best': round(e2e_device['best'], 2),
        'end_to_end_img_s_device_cached_b128': round(
            e2e_device_b128['median'], 2),
        # like-for-like ratio: e2e pipeline vs the e2e GPU estimate
        'end_to_end_vs_baseline': round(e2e['median'] / REFERENCE_GPU_IMG_S,
                                        3),
        'end_to_end_note': 'relay-bandwidth bound on this harness (docs/PERF.md)',
        'host_cpu_cores': os.cpu_count(),
    }), flush=True)


if __name__ == '__main__':
    main()
