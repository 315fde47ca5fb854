import numpy as np
import jax.numpy as jnp

from single_shot_detection_tpu.ops import sampling


def reference_hard_negative_mining(scores, tc, ratio, min_per_image):
    """Numpy replay of sampler.py:12-25."""
    e = np.exp(scores - scores.max(axis=-1, keepdims=True))
    log_softmax = np.log(e / e.sum(axis=-1, keepdims=True))
    loss = -log_softmax[:, :, 0]

    negative = tc == 0
    positive = (tc != 0) & (tc != -1)
    num_neg = negative.sum(axis=1, keepdims=True)
    num_pos = positive.sum(axis=1, keepdims=True)
    wanted = np.minimum(np.clip(num_pos * ratio, min_per_image, None), num_neg)

    loss = np.where(negative, loss, -np.inf)
    rank = np.argsort(np.argsort(-loss, axis=1, kind='stable'), axis=1, kind='stable')
    return positive | (rank < wanted)


def test_hard_negative_mining_vs_reference(rng):
    scores = rng.randn(4, 30, 5).astype(np.float32)
    tc = rng.randint(-1, 5, size=(4, 30)).astype(np.int32)
    got = np.asarray(sampling.hard_negative_mining(
        jnp.asarray(scores), jnp.asarray(tc), 3, 5))
    expected = reference_hard_negative_mining(scores, tc, 3, 5)
    # positives always kept, ignores never sampled, counts match
    np.testing.assert_array_equal(got.sum(axis=1), expected.sum(axis=1))
    positive = (tc != 0) & (tc != -1)
    assert got[positive].all()
    assert not got[tc == -1].any()
    # the actual hard negatives picked should be the highest-loss negatives
    np.testing.assert_array_equal(got, expected)


def test_min_negative_per_image_applies_with_no_positives(rng):
    scores = rng.randn(1, 20, 5).astype(np.float32)
    tc = np.zeros((1, 20), dtype=np.int32)  # all negatives
    got = np.asarray(sampling.hard_negative_mining(
        jnp.asarray(scores), jnp.asarray(tc), 3, 5))
    assert got.sum() == 5


def test_naive_sampler():
    tc = jnp.array([[0, 1, -1, 3]])
    got = np.asarray(sampling.naive_sampler(None, tc))
    np.testing.assert_array_equal(got, [[False, True, False, True]])
