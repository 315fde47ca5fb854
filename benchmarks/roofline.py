"""Roofline analysis of the flagship train step via XLA's own cost model.

Compiles the exact bench.py device-step program (ssd_mb2_voc geometry,
batch 32/128, bf16) and pulls ``compiled.cost_analysis()`` — XLA's static
estimate of FLOPs and bytes accessed — to compare the measured step time
against the chip's compute and HBM-bandwidth rooflines.

Context: the reference has no analog (no profiling integration at all,
SURVEY.md §5); this is the honesty check behind docs/PERF.md's claim that
the MobileNet flagship step is reduction/bandwidth-bound rather than
compiler-limited.

Usage:  python benchmarks/roofline.py [--batch 32] [--f32]
Prints one human-readable table + one JSON line.
"""

import argparse
import json

import jax
import jax.numpy as jnp

# TPU v5e (one chip) datasheet peaks.
PEAK_BF16_FLOPS = 197e12   # bf16 MXU peak, FLOP/s
PEAK_HBM_BW = 819e9        # HBM bandwidth, B/s
# f32 matmul/conv on v5e is emulated with multi-pass bf16 (no native f32
# MXU path); half the bf16 peak is the optimistic single-extra-pass bound.
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 2


def build_step(batch_size, img=300, dtype=jnp.bfloat16, config=None,
               frozen_bn=False):
    from benchmarks._util import synth_batch
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step)

    if config:
        # any parity config by sample name (--config ssd_300_vgg16_voc)
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from benchmarks.parity_bench import build_from_config
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'samples', config + '.py')
        cfg, bundle, criterion, assigner, _, tx = build_from_config(
            path, dtype)
        img_size = tuple(cfg.input_size)
    else:
        import __graft_entry__ as ge
        bundle = ge._flagship(img_size=img, dtype=dtype)
        _, criterion, assigner, tx = ge._training_pieces(bundle)
        img_size = (img, img)
    anchors = bundle.anchors()
    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False, frozen_bn=frozen_bn)

    batch = synth_batch(batch_size, img_size,
                        bundle.num_classes if config else 21)
    return step, state, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--f32', action='store_true')
    ap.add_argument('--config', default=None,
                    help='parity sample config name (default: the flagship '
                         'ssd_mb2 geometry)')
    ap.add_argument('--frozen-bn', action='store_true',
                    help='analyze the frozen-BN fine-tune step')
    ap.add_argument('--time', action='store_true',
                    help='also time the step (needs a quiet host)')
    args = ap.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    step, state, batch = build_step(args.batch, dtype=dtype,
                                    config=args.config,
                                    frozen_bn=args.frozen_bn)
    key = jax.random.PRNGKey(1)

    lowered = step.lower(state, batch, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]

    flops = ca.get('flops', 0.0)
    bytes_acc = ca.get('bytes accessed', 0.0)
    peak = PEAK_F32_FLOPS if args.f32 else PEAK_BF16_FLOPS
    out = {
        'config': args.config or 'ssd_mb2_flagship',
        'frozen_bn': bool(args.frozen_bn),
        'batch': args.batch,
        'dtype': str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
        'compute_peak_flops': peak,
        'xla_flops_per_step': flops,
        'xla_bytes_per_step': bytes_acc,
        'roofline_compute_ms': flops / peak * 1e3,
        'roofline_hbm_ms': bytes_acc / PEAK_HBM_BW * 1e3,
        'arithmetic_intensity_flop_per_byte':
            flops / bytes_acc if bytes_acc else None,
    }
    # Memory analysis: what the program holds live.
    mem = compiled.memory_analysis()
    for name in ('temp_size_in_bytes', 'argument_size_in_bytes',
                 'output_size_in_bytes', 'generated_code_size_in_bytes'):
        v = getattr(mem, name, None)
        if v is not None:
            out[name] = v

    if args.time:
        import time
        st, m = step(state, batch, key)
        jax.block_until_ready(m['loss'])
        for _ in range(2):
            t0 = time.perf_counter()
            cur = state
            for i in range(20):
                cur, m = step(cur, batch, jax.random.fold_in(key, i))
            jax.block_until_ready(m['loss'])
            elapsed = time.perf_counter() - t0
        out['measured_ms_per_step'] = elapsed / 20 * 1e3
        out['img_per_s'] = args.batch * 20 / elapsed
        bound = max(out['roofline_compute_ms'], out['roofline_hbm_ms'])
        out['pct_of_roofline'] = 100.0 * bound / out['measured_ms_per_step']

    print()
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
