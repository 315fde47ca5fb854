"""Inference throughput + latency: forward + decode + batched NMS, one chip.

The north-star metric includes inference images/sec (BASELINE.md); this
measures the full fused inference program (the exported-model path) for
SSD300-MobileNetV2 at several batch sizes.  ``--int8`` benches the
calibrated int8 serving path (export/quantize.py) instead.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import __graft_entry__ as ge
    from single_shot_detection_tpu.ops.postprocess import Postprocessor

    ap = argparse.ArgumentParser()
    ap.add_argument('--int8', action='store_true',
                    help='bench the calibrated int8 PTQ serving path')
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != 'cpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    bundle = ge._flagship(img_size=300, dtype=dtype)
    anchors = jnp.asarray(bundle.anchors())
    coder, *_ = ge._training_pieces(bundle)
    pp = Postprocessor(coder, score_threshold=0.01, max_total=200,
                       nms={'max_per_class': 100, 'overlap_threshold': 0.45})
    variables = bundle.init(jax.random.PRNGKey(0))

    if args.int8:
        from single_shot_detection_tpu.export import quantize
        calib = jnp.asarray(
            np.random.RandomState(7).rand(8, 300, 300, 3).astype(np.float32))
        amax = quantize.calibrate(bundle.module, variables, [calib])
        infer = quantize.make_quantized_predict_step(
            bundle.module, pp, anchors, amax)
    else:
        @jax.jit
        def infer(variables, images):
            scores, locs = bundle.module.apply(variables, images, train=False)
            return pp(scores.astype(jnp.float32), locs.astype(jnp.float32),
                      anchors)

    results = {}
    rng = np.random.RandomState(0)
    for batch in (1, 8, 32, 128):
        images = jnp.asarray(rng.rand(batch, 300, 300, 3).astype(np.float32))
        out = infer(variables, images)
        jax.block_until_ready(out)

        # latency: synchronous round trips (includes host<->device transport)
        best = None
        for _ in range(3):
            times = []
            for _ in range(20):
                t0 = time.perf_counter()
                out = infer(variables, images)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            p50 = float(np.percentile(times, 50))
            best = p50 if best is None else min(best, p50)
        results[f'b{batch}_p50_ms'] = round(best * 1e3, 3)

        # throughput: pipelined async dispatch (the serving steady state)
        n = 30
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [infer(variables, images) for _ in range(n)]
            jax.block_until_ready(outs[-1])
            dt = time.perf_counter() - t0
        results[f'b{batch}_img_s'] = round(batch * n / dt, 1)

        # device latency: chain each call's input on the previous output
        # (no host readback between calls) — executions serialize on the
        # device while async dispatch hides the transport, so total/N is
        # the true per-call device latency, free of the ~28 ms relay RTT
        # that dominates the synchronous p50 above
        @jax.jit
        def infer_dep(variables, images, prev_dets):
            img = images + 0.0 * prev_dets.ravel()[0]
            return infer(variables, img)

        dets, valid = infer(variables, images)
        dets, valid = infer_dep(variables, images, dets)  # compile
        jax.block_until_ready(dets)
        best_dev = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                dets, valid = infer_dep(variables, images, dets)
            jax.block_until_ready(dets)
            dt = time.perf_counter() - t0
            best_dev = dt if best_dev is None else min(best_dev, dt)
        results[f'b{batch}_device_ms'] = round(best_dev / n * 1e3, 3)
    if args.int8:
        results['int8'] = True
    print(json.dumps(results))


if __name__ == '__main__':
    main()
