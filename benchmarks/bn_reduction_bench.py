"""BN-reduction step-time experiment (round-2 verdict item 5).

The measured device trace (docs/PERF.md) attributes 51% of the flagship
train step to BN batch-stat + gradient reductions with f32<->bf16 converts.
flax's BatchNorm computes statistics in f32 by default
(``force_float32_reductions=True``).  This experiment measures the step
with bf16 stat reductions (class-default patch — experiment only) against
the baseline, at batch 32 and 128.

Run: python benchmarks/bn_reduction_bench.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STEPS = 20


def time_step(batch, dtype=jnp.bfloat16):
    import __graft_entry__ as ge
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step)

    bundle = ge._flagship(img_size=300, dtype=dtype)
    anchors = bundle.anchors()
    _, criterion, assigner, tx = ge._training_pieces(bundle)
    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=True)

    rng = np.random.RandomState(0)
    boxes = np.zeros((batch, 8, 6), np.float32)
    mask = np.zeros((batch, 8), bool)
    boxes[:, 0] = [30, 30, 200, 200, 1, 1.0]
    mask[:, 0] = True
    data = {'image': jnp.asarray(rng.rand(batch, 300, 300, 3).astype(np.float32)),
            'boxes': jnp.asarray(boxes), 'box_mask': jnp.asarray(mask)}

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, data, key)
    jax.block_until_ready(metrics['loss'])
    elapsed = None
    for _ in range(2):  # discard the first timing loop (relay slow path)
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = step(state, data, jax.random.fold_in(key, i))
        jax.block_until_ready(metrics['loss'])
        elapsed = time.perf_counter() - t0
    return batch * STEPS / elapsed


def main():
    from flax.linen import BatchNorm

    rows = []
    for label, patch in (('baseline_f32_stats', True),
                         ('bf16_stat_reductions', False)):
        BatchNorm.force_float32_reductions = patch
        for batch in (32, 128):
            img_s = time_step(batch)
            rows.append({'variant': label, 'batch': batch,
                         'img_s': round(img_s, 1),
                         'ms_per_step': round(1000.0 * batch / img_s, 2)})
            print(json.dumps(rows[-1]), flush=True)
    BatchNorm.force_float32_reductions = True

    print('\nvariant                      batch   img/s   ms/step')
    for r in rows:
        print(f"{r['variant']:<28} {r['batch']:>5} {r['img_s']:>7} "
              f"{r['ms_per_step']:>8}")


if __name__ == '__main__':
    main()
