"""Pure box math: format conversion, areas, IoU / GIoU.

Functional-parity target: reference ``bf/utils/box_utils.py:16-143``.  All
functions are pure jnp, shape-polymorphic over leading dims, and safe under
``jit`` / ``vmap`` / ``grad``.

Conventions:
  * "corners"   = ``[xmin, ymin, xmax, ymax]`` (minmax format)
  * "centroids" = ``[cx, cy, w, h]``
"""

from __future__ import annotations

import jax.numpy as jnp


def to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """Centroid ``[cx, cy, w, h]`` -> corner ``[x0, y0, x1, y1]``.

    Parity: box_utils.py:16 (``to_corners``).
    """
    xy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def to_centroids(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corner ``[x0, y0, x1, y1]`` -> centroid ``[cx, cy, w, h]``.

    Parity: box_utils.py:25 (``to_centroids``).
    """
    mins, maxs = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(mins + maxs) / 2, maxs - mins], axis=-1)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-format boxes, degenerate boxes clamp to 0.

    Parity: box_utils.py:38 (``area``).
    """
    w = jnp.clip(boxes[..., 2] - boxes[..., 0], min=0)
    h = jnp.clip(boxes[..., 3] - boxes[..., 1], min=0)
    return w * h


def intersection(a: jnp.ndarray, b: jnp.ndarray, cartesian: bool = True) -> jnp.ndarray:
    """Intersection *boxes* (corner format).

    ``cartesian=True``:  a ``[N, 4]`` x b ``[M, 4]`` -> ``[N, M, 4]``.
    ``cartesian=False``: elementwise over identical shapes.

    Parity: box_utils.py:48 (``intersection``; the ``zero_incorrect`` variant is
    not needed — ``area`` clamps degenerate boxes to 0).
    """
    if cartesian:
        mins = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
        maxs = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    else:
        mins = jnp.maximum(a[..., :2], b[..., :2])
        maxs = jnp.minimum(a[..., 2:], b[..., 2:])
    return jnp.concatenate([mins, maxs], axis=-1)


def iou(a: jnp.ndarray, b: jnp.ndarray, cartesian: bool = True) -> jnp.ndarray:
    """IoU of corner-format boxes; ``[N, M]`` if cartesian else elementwise.

    Parity: box_utils.py:82 (``iou``).
    """
    inter = area(intersection(a, b, cartesian=cartesian))
    area_a = area(a)
    area_b = area(b)
    if cartesian:
        area_a = area_a[..., :, None]
        area_b = area_b[..., None, :]
    return inter / (area_a + area_b - inter)


def generalized_iou(a: jnp.ndarray, b: jnp.ndarray, cartesian: bool = True) -> jnp.ndarray:
    """GIoU (arXiv 1902.09630) of corner-format boxes.

    Parity: box_utils.py:104 (``generalized_iou``).
    """
    inter = area(intersection(a, b, cartesian=cartesian))
    area_a = area(a)
    area_b = area(b)
    if cartesian:
        area_a = area_a[..., :, None]
        area_b = area_b[..., None, :]
        enc_mins = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
        enc_maxs = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    else:
        enc_mins = jnp.minimum(a[..., :2], b[..., :2])
        enc_maxs = jnp.maximum(a[..., 2:], b[..., 2:])
    union = area_a + area_b - inter
    enclosing = area(jnp.concatenate([enc_mins, enc_maxs], axis=-1))
    return inter / union - (enclosing - union) / enclosing
