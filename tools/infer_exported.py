"""Standalone inference on an exported ``.stablehlo`` artifact.

Consumer for ``export = {'standalone': True}`` artifacts (see
``single_shot_detection_tpu/export``): the artifact closes over the
weights, normalization, and NMS, so this tool needs only jax + PIL —
no config, no checkpoint, no framework model code.  It is the
deployment-side analog of running the reference's exported ONNX model
through an inference engine (reference bf/utils/onnx_exporter.py,
demo.py:24-44).

Usage:
    python tools/infer_exported.py exported/model.stablehlo img1.jpg ...
    python tools/infer_exported.py exported/model.stablehlo --synthetic

Input images are resized to the artifact's baked (H, W) and fed as raw
0-255 RGB floats; the artifact applies the training-time normalization
internally.  Output rows: x1 y1 x2 y2 class score (in resized-image
pixels, 1-based class ids), one block per image.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def load_artifact(path: str):
    """Returns (callable, (batch, height, width)) from the artifact alone."""
    from single_shot_detection_tpu.export import load_exported_with_spec
    call, in_avals = load_exported_with_spec(path)
    if len(in_avals) != 1:
        raise SystemExit(
            f'{path} takes {len(in_avals)} inputs — not a standalone '
            "artifact (re-export with export = {'standalone': True} or "
            'bake_variables=True)')
    b, h, w, c = in_avals[0].shape
    return call, (b, h, w)


def _load_images(paths, size_hw, batch):
    """Loads up to ``batch`` images into a zero-padded [batch,h,w,3] array."""
    from PIL import Image
    h, w = size_hw
    imgs = np.zeros((batch, h, w, 3), np.float32)
    for i, p in enumerate(paths[:batch]):
        with Image.open(p) as im:
            imgs[i] = np.asarray(
                im.convert('RGB').resize((w, h), Image.BILINEAR),
                np.float32)
    return imgs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('artifact', help='path to the exported .stablehlo file')
    ap.add_argument('images', nargs='*', help='image files (resized to fit)')
    ap.add_argument('--synthetic', action='store_true',
                    help='run on random data (artifact smoke test)')
    ap.add_argument('--min-score', type=float, default=0.3)
    args = ap.parse_args(argv)

    call, (batch, h, w) = load_artifact(args.artifact)
    print(f'>> artifact expects [{batch}, {h}, {w}, 3] raw RGB', flush=True)

    if args.synthetic:
        chunks = [[f'synthetic[{i}]' for i in range(batch)]]
        synth = (np.random.RandomState(0).rand(batch, h, w, 3) * 255
                 ).astype(np.float32)
    elif args.images:
        # the artifact's batch size is baked in: run ceil(N/batch) calls so
        # every image is processed (padding slots are zero-filled and their
        # outputs discarded, never printed)
        chunks = [args.images[i:i + batch]
                  for i in range(0, len(args.images), batch)]
        synth = None
    else:
        ap.error('give image files or --synthetic')

    total_ms = 0.0
    warm = False
    for names in chunks:
        imgs = synth if synth is not None else _load_images(
            names, (h, w), batch)
        if not warm:
            call(imgs)  # first call includes compile/load — not timed
            warm = True
        t0 = time.perf_counter()
        out = call(imgs)
        dets, valid = (np.asarray(out[0]), np.asarray(out[1]))
        total_ms += (time.perf_counter() - t0) * 1e3

        for i, name in enumerate(names):
            rows = dets[i][valid[i] & (dets[i][:, 5] >= args.min_score)]
            print(f'{name}: {len(rows)} detections')
            for x1, y1, x2, y2, cls, score in rows:
                print(f'  [{x1:8.2f} {y1:8.2f} {x2:8.2f} {y2:8.2f}] '
                      f'score={score:.3f} class={int(cls)}')
    n_calls = len(chunks)
    print(f'>> inference: {total_ms:.2f} ms for {n_calls} '
          f'call{"s" if n_calls != 1 else ""} of batch {batch}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
