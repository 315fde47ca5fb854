"""BN-reduction step-time experiment (round-2 verdict item 5).

The measured device trace (docs/PERF.md) attributes 51% of the flagship
train step to BN batch-stat + gradient reductions with f32<->bf16 converts.
flax's BatchNorm computes statistics in f32 by default
(``force_float32_reductions=True``).  This experiment measures the step
with bf16 stat reductions against the baseline, at batch 32 and 128.

NB: assigning ``BatchNorm.force_float32_reductions = False`` as a CLASS
attribute is a silent no-op (dataclass defaults bake into ``__init__``);
the experiment instead patches ``flax.linen.normalization._compute_stats``
and proves the patch is live with a bf16-rounding probe (docs/PERF.md).

Run: python benchmarks/bn_reduction_bench.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from benchmarks._util import synth_batch  # noqa: E402 (needs ROOT)

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

    data = synth_batch(batch, (300, 300))

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


def _patch_stat_reductions(force_f32: bool):
    """Force the stat-reduction dtype for every BatchNorm.

    NOTE: assigning ``BatchNorm.force_float32_reductions`` is a silent
    no-op — flax modules are dataclasses and the field default is baked
    into the generated ``__init__`` at class-creation time.  Patch the
    shared ``_compute_stats`` helper instead, and VERIFY the patch took.
    """
    from flax.linen import normalization as nm
    orig = nm.__dict__.get('_orig_compute_stats', nm._compute_stats)
    nm._orig_compute_stats = orig

    def patched(*args, **kw):
        kw.pop('force_float32_reductions', None)
        return orig(*args, **kw, force_float32_reductions=force_f32)

    nm._compute_stats = patched if not force_f32 else orig

    # prove the patch is live: [1, 2^-9] are both exactly representable in
    # bf16, but their MEAN is only exact under f32 accumulation — the bf16
    # reduction rounds 1 + 2^-9 back to 1.0
    x = jnp.asarray([1.0, 2.0 ** -9], jnp.bfloat16)
    mean, _ = nm._compute_stats(x, (0,), jnp.bfloat16)
    got_f32_path = abs(float(mean) - (1.0 + 2.0 ** -9) / 2.0) < 1e-6
    assert got_f32_path == force_f32, (
        f'stat-reduction patch ineffective: mean={float(mean)}')


def main():
    rows = []
    for label, force_f32 in (('baseline_f32_stats', True),
                             ('bf16_stat_reductions', False)):
        _patch_stat_reductions(force_f32)
        for batch in (32, 128):
            img_s = time_step(batch)
            rows.append({'variant': label, 'batch': batch,
                         'img_s': round(img_s, 1),
                         'ms_per_step': round(1000.0 * batch / img_s, 2)})
            print(json.dumps(rows[-1]), flush=True)
    _patch_stat_reductions(True)

    print('\nvariant                      batch   img/s   ms/step')
    for r in rows:
        print(f"{r['variant']:<28} {r['batch']:>5} {r['img_s']:>7} "
              f"{r['ms_per_step']:>8}")


if __name__ == '__main__':
    main()
