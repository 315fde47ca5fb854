"""Benchmark: SSD300-MobileNetV2 (ssd_mb2_voc) training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); ``REFERENCE_GPU_IMG_S`` is a
documented estimate for the reference PyTorch pipeline training
SSD300-MobileNetV2 (batch 32) on a contemporary single GPU — used only to
report the vs_baseline ratio against the >=5x north-star target.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_IMG_S = 120.0  # estimated reference GPU throughput (see module docstring)

BATCH = 32
IMG = 300
STEPS = 20


def main():
    import __graft_entry__ as ge
    from single_shot_detection_tpu.train import create_train_state, make_train_step

    # bf16 compute on TPU (replaces the reference's apex AMP, env.py:87-95)
    on_tpu = jax.devices()[0].platform != 'cpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    bundle = ge._flagship(img_size=IMG, dtype=dtype)
    anchors = bundle.anchors()
    _, criterion, assigner, tx = ge._training_pieces(bundle)

    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=True)

    rng = np.random.RandomState(0)
    boxes = np.zeros((BATCH, 8, 6), np.float32)
    mask = np.zeros((BATCH, 8), bool)
    for b in range(BATCH):
        n = rng.randint(1, 6)
        for i in range(n):
            cx, cy = rng.rand(2) * 200 + 50
            w, h = rng.rand(2) * 100 + 30
            boxes[b, i] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                           rng.randint(1, 21), 1.0]
            mask[b, i] = True
    batch = {'image': jnp.asarray(rng.rand(BATCH, IMG, IMG, 3).astype(np.float32)),
             'boxes': jnp.asarray(boxes), 'box_mask': jnp.asarray(mask)}

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

    img_per_s = BATCH * STEPS / elapsed
    print(json.dumps({
        'metric': 'train_images_per_sec_per_chip_ssd300_mb2',
        'value': round(img_per_s, 2),
        'unit': 'images/sec',
        'vs_baseline': round(img_per_s / REFERENCE_GPU_IMG_S, 3),
    }))


if __name__ == '__main__':
    main()
