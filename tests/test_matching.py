import numpy as np
import jax.numpy as jnp

from single_shot_detection_tpu.ops import matching


def reference_match(weights, matched_threshold, unmatched_threshold, force=True):
    """Literal numpy replay of the torch matcher semantics (matcher.py:33-56)."""
    overlap = weights.max(axis=0)
    box_idx = weights.argmax(axis=0).astype(np.int64)
    below_matched = overlap < matched_threshold
    below_unmatched = overlap < unmatched_threshold
    box_idx[below_unmatched] = matching.NOT_MATCHED
    box_idx[below_matched & ~below_unmatched] = matching.IGNORE
    if force:
        anchor_idx = weights.argmax(axis=1)
        for g, a in enumerate(anchor_idx):  # sequential scatter: later g wins
            box_idx[a] = g
    return box_idx


def test_match_vs_reference_random(rng):
    for _ in range(10):
        weights = rng.rand(6, 40).astype(np.float32)
        expected = reference_match(weights.copy(), 0.5, 0.3)
        got = np.asarray(matching.match_per_prediction(
            jnp.asarray(weights), jnp.ones(6, dtype=bool), 0.5, 0.3))
        np.testing.assert_array_equal(got, expected)


def test_force_match_conflict_higher_gt_wins():
    # Both GTs' best anchor is anchor 2 -> torch scatter keeps the later (g=1).
    weights = np.zeros((2, 4), dtype=np.float32)
    weights[0, 2] = 0.9
    weights[1, 2] = 0.8
    got = np.asarray(matching.match_per_prediction(
        jnp.asarray(weights), jnp.ones(2, dtype=bool), 0.5))
    assert got[2] == 1
    expected = reference_match(weights.copy(), 0.5, 0.5)
    np.testing.assert_array_equal(got, expected)


def test_padded_gt_rows_ignored():
    weights = np.zeros((3, 5), dtype=np.float32)
    weights[0, 1] = 0.9
    weights[2, 3] = 0.95  # padded row — must not match anything
    mask = jnp.array([True, True, False])
    got = np.asarray(matching.match_per_prediction(jnp.asarray(weights), mask, 0.5))
    assert got[1] == 0
    assert got[3] != 2  # padded row cannot claim its anchor


def test_ignore_band():
    weights = np.array([[0.4]], dtype=np.float32)
    got = np.asarray(matching.match_per_prediction(
        jnp.asarray(weights), jnp.ones(1, dtype=bool), 0.5, 0.3,
        force_match_for_each_target=False))
    assert got[0] == matching.IGNORE


def test_assigner_end_to_end():
    anchors = jnp.array([  # centroid
        [10.0, 10.0, 20.0, 20.0],
        [50.0, 50.0, 20.0, 20.0],
        [90.0, 90.0, 20.0, 20.0],
    ])
    # one GT exactly over anchor 0 (corners 0..20), class 7, score 1
    gt = jnp.array([[[0.0, 0.0, 20.0, 20.0, 7.0, 1.0],
                     [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]])
    gt_mask = jnp.array([[True, False]])
    assigner = matching.TargetAssigner(0.5, 0.5)
    target = np.asarray(assigner(gt, gt_mask, anchors))
    assert target.shape == (1, 3, 6)
    np.testing.assert_allclose(target[0, 0, :4], [0, 0, 20, 20])
    assert target[0, 0, 4] == 7.0 and target[0, 0, 5] == 1.0
    # unmatched anchors: negative class 0, score 1
    assert target[0, 1, 4] == 0.0 and target[0, 1, 5] == 1.0
    assert target[0, 2, 4] == 0.0


def test_assigner_empty_image_all_negative():
    anchors = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    gt = jnp.zeros((1, 3, 6))
    gt_mask = jnp.zeros((1, 3), dtype=bool)
    assigner = matching.TargetAssigner(0.5)
    target = np.asarray(assigner(gt, gt_mask, anchors))
    assert (target[..., 4] == 0).all()
    assert (target[..., 5] == 1).all()
