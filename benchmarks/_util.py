"""Shared benchmark helpers."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def synth_batch(batch, img_hw, num_classes=21, max_gt=8, seed=0):
    """The canonical synthetic device batch all benchmarks share:
    random image + [batch, max_gt, 6] padded corner-format GT with mask."""
    h, w = img_hw
    rng = np.random.RandomState(seed)
    boxes = np.zeros((batch, max_gt, 6), np.float32)
    mask = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        n = rng.randint(1, max_gt // 2 + 1)
        for i in range(n):
            cx, cy = rng.rand() * (w - 100) + 50, rng.rand() * (h - 100) + 50
            bw, bh = rng.rand(2) * 80 + 30
            boxes[b, i] = [cx - bw / 2, cy - bh / 2, cx + bw / 2,
                           cy + bh / 2, rng.randint(1, num_classes), 1.0]
            mask[b, i] = True
    return {'image': jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32)),
            'boxes': jnp.asarray(boxes), 'box_mask': jnp.asarray(mask)}


def retry(fn, *args, attempts=3, **kwargs):
    """The remote-TPU relay intermittently fails device transfers with
    retryable backend errors (docs/PERF.md); retry a transient failure
    instead of voiding the whole benchmark run."""
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except jax.errors.JaxRuntimeError as exc:
            if i == attempts - 1:
                raise
            print(f'transient backend error ({exc}); retrying', flush=True)
            time.sleep(5)
