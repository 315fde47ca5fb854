import numpy as np
import jax.numpy as jnp

from single_shot_detection_tpu.ops import boxes as box_ops


def brute_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            x0, y0 = max(x[0], y[0]), max(x[1], y[1])
            x1, y1 = min(x[2], y[2]), min(x[3], y[3])
            inter = max(x1 - x0, 0) * max(y1 - y0, 0)
            area_x = max(x[2] - x[0], 0) * max(x[3] - x[1], 0)
            area_y = max(y[2] - y[0], 0) * max(y[3] - y[1], 0)
            out[i, j] = inter / (area_x + area_y - inter)
    return out


def test_corner_centroid_roundtrip(rng):
    c = rng.rand(17, 4).astype(np.float32)
    c[:, 2:] += 0.1  # positive sizes
    corners = box_ops.to_corners(jnp.asarray(c))
    back = box_ops.to_centroids(corners)
    np.testing.assert_allclose(np.asarray(back), c, rtol=1e-5, atol=1e-6)


def test_to_corners_values():
    c = jnp.array([[10.0, 20.0, 4.0, 6.0]])
    out = np.asarray(box_ops.to_corners(c))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_area_clamps_degenerate():
    b = jnp.array([[0.0, 0.0, -1.0, 5.0], [0.0, 0.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(box_ops.area(b)), [0.0, 6.0])


def test_iou_vs_bruteforce(rng):
    a = rng.rand(13, 4) * 100
    b = rng.rand(9, 4) * 100
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2]) + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2]) + 1
    got = np.asarray(box_ops.iou(jnp.asarray(a, dtype=jnp.float32),
                                 jnp.asarray(b, dtype=jnp.float32)))
    np.testing.assert_allclose(got, brute_iou(a, b), rtol=1e-4, atol=1e-5)


def test_iou_elementwise_matches_diagonal(rng):
    a = rng.rand(7, 4) * 10
    a[:, 2:] += a[:, :2] + 1
    b = rng.rand(7, 4) * 10
    b[:, 2:] += b[:, :2] + 1
    a_j, b_j = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    cart = np.asarray(box_ops.iou(a_j, b_j))
    elem = np.asarray(box_ops.iou(a_j, b_j, cartesian=False))
    np.testing.assert_allclose(elem, np.diag(cart), rtol=1e-5)


def test_generalized_iou_bounds_and_identity(rng):
    a = rng.rand(11, 4) * 50
    a[:, 2:] += a[:, :2] + 1
    a_j = jnp.asarray(a, jnp.float32)
    g = np.asarray(box_ops.generalized_iou(a_j, a_j, cartesian=False))
    np.testing.assert_allclose(g, np.ones(11), rtol=1e-5)
    # disjoint boxes: giou < 0
    x = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    y = jnp.array([[5.0, 5.0, 6.0, 6.0]])
    assert float(box_ops.generalized_iou(x, y)[0, 0]) < 0
