"""Batched NMS latency benchmark (north star: p50 < 2 ms on TPU).

COCO-scale problem: batch 12 x 80 classes x 100 candidates = 960 independent
NMS problems per device step.  Compares the Pallas kernel against the jnp
fori_loop implementation.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from single_shot_detection_tpu.ops import nms as nms_ops
from single_shot_detection_tpu.ops import nms_pallas


def make_problem(n, k, seed=0):
    rng = np.random.RandomState(seed)
    boxes = rng.rand(n, k, 4).astype(np.float32) * 500
    boxes[..., 2:] = boxes[..., :2] + rng.rand(n, k, 2).astype(np.float32) * 80 + 2
    scores = -np.sort(-rng.rand(n, k).astype(np.float32), axis=1)
    return jnp.asarray(boxes), jnp.asarray(scores)


def timeit(fn, *args, iters=30, trials=3):
    """Best-of-trials p50/p95 — robust against remote-tunnel interference."""
    out = fn(*args)
    jax.block_until_ready(out)
    p50s, p95s = [], []
    for _ in range(trials):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1e3)
        p50s.append(float(np.percentile(times, 50)))
        p95s.append(float(np.percentile(times, 95)))
    best = int(np.argmin(p50s))
    return p50s[best], p95s[best]


@functools.partial(jax.jit, static_argnames=('threshold',))
def jnp_nms(boxes, scores, threshold=0.45):
    return jax.vmap(lambda b, s: nms_ops.nms_mask(b, s, threshold))(boxes, scores)


def main():
    # NOTE: all timing happens before any device->host transfer of results —
    # interleaving readbacks with timing perturbs the remote-TPU relay.
    results = {}
    problems = {name: make_problem(n, k)
                for name, (n, k) in [('voc_b32', (32 * 20, 100)),
                                     ('coco_b12', (12 * 80, 100))]}
    fn = functools.partial(nms_pallas.nms_keep_batched,
                           overlap_threshold=0.45)
    for name, (boxes, scores) in problems.items():
        if nms_pallas.available():
            p50_p, p95_p = timeit(fn, boxes, scores)
            results[f'{name}_pallas_p50_ms'] = round(p50_p, 3)
            results[f'{name}_pallas_p95_ms'] = round(p95_p, 3)
        p50_j, _ = timeit(jnp_nms, boxes, scores)
        results[f'{name}_jnp_p50_ms'] = round(p50_j, 3)
    if nms_pallas.available():
        for name, (boxes, scores) in problems.items():
            kj = np.asarray(jnp_nms(boxes, scores))
            kp = np.asarray(fn(boxes, scores))
            results[f'{name}_match'] = bool((kj == kp).all())
    print(json.dumps(results))


if __name__ == '__main__':
    main()
