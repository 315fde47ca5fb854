import numpy as np
import jax.numpy as jnp

from single_shot_detection_tpu.ops import nms as nms_ops


def greedy_nms_reference(boxes, scores, threshold):
    """Plain-python greedy NMS (torchvision semantics: suppress iou > thr)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if scores[j] > scores[i]:
                continue
            x0 = max(boxes[i, 0], boxes[j, 0]); y0 = max(boxes[i, 1], boxes[j, 1])
            x1 = min(boxes[i, 2], boxes[j, 2]); y1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x1 - x0, 0) * max(y1 - y0, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > threshold:
                suppressed[j] = True
    return sorted(keep)


def random_boxes(rng, n, span=100):
    boxes = rng.rand(n, 4).astype(np.float32) * span
    boxes[:, 2:] = boxes[:, :2] + rng.rand(n, 2).astype(np.float32) * 30 + 1
    return boxes


def test_nms_mask_vs_reference(rng):
    for _ in range(10):
        boxes = random_boxes(rng, 50)
        scores = rng.rand(50).astype(np.float32)
        keep = np.asarray(nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        expected = greedy_nms_reference(boxes, scores, 0.5)
        np.testing.assert_array_equal(sorted(np.nonzero(keep)[0].tolist()), expected)


def test_nms_mask_excludes_neginf_scores(rng):
    boxes = random_boxes(rng, 10)
    scores = rng.rand(10).astype(np.float32)
    scores[3] = -np.inf
    keep = np.asarray(nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert not keep[3]


def test_nms_identical_boxes_keeps_one():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    keep = np.asarray(nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.sum() == 1 and keep[0]


def test_nms_topk_wrapper(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.rand(30).astype(np.float32)
    out_boxes, out_scores, valid = nms_ops.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                               0.5, max_output=10)
    assert out_boxes.shape == (10, 4)
    s = np.asarray(out_scores)
    assert (np.diff(s[np.asarray(valid)]) <= 0).all()


def test_soft_nms_decays_overlapping():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.85, 0.8], np.float32)
    picked = np.asarray(nms_ops.soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                         score_threshold=0.5, sigma=0.5))
    assert picked[0] and picked[2]
