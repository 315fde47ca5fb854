import numpy as np
import jax.numpy as jnp

from single_shot_detection_tpu.ops.box_coder import BoxCoder
from single_shot_detection_tpu.ops.postprocess import Postprocessor


def make_postprocessor(**overrides):
    cfg = dict(score_threshold=0.01, max_total=20,
               nms={'max_per_class': 10, 'overlap_threshold': 0.45},
               score_converter='SOFTMAX')
    cfg.update(overrides)
    return Postprocessor(BoxCoder(10.0, 5.0), **cfg)


def test_postprocess_shapes_and_ordering(rng):
    batch, anchors, classes = 3, 50, 6  # 5 fg classes + background
    scores = jnp.asarray(rng.randn(batch, anchors, classes).astype(np.float32))
    locs = jnp.asarray(rng.randn(batch, anchors, 4).astype(np.float32) * 0.1)
    priors = np.abs(rng.rand(anchors, 4).astype(np.float32)) * 100 + 20
    pp = make_postprocessor()
    dets, valid = pp(scores, locs, jnp.asarray(priors))
    assert dets.shape == (batch, 20, 6)
    assert valid.shape == (batch, 20)
    s = np.asarray(dets[..., 5])
    v = np.asarray(valid)
    for b in range(batch):
        vs = s[b][v[b]]
        assert (np.diff(vs) <= 0).all()  # sorted by score desc
    # classes are 1-based
    assert (np.asarray(dets[..., 4])[v] >= 1).all()


def test_postprocess_decodes_exact_box():
    # one anchor, one confident class; zero codes decode to the prior itself
    priors = jnp.array([[50.0, 50.0, 20.0, 10.0]])
    scores = jnp.array([[[-10.0, 10.0, -10.0]]])  # class 1 wins softmax
    locs = jnp.zeros((1, 1, 4))
    pp = make_postprocessor(max_total=5)
    dets, valid = pp(scores, locs, priors)
    d = np.asarray(dets)[0, 0]
    assert np.asarray(valid)[0, 0]
    np.testing.assert_allclose(d[:4], [40, 45, 60, 55], rtol=1e-5)
    assert d[4] == 1.0
    assert d[5] > 0.99


def test_postprocess_score_threshold_filters():
    priors = jnp.array([[50.0, 50.0, 20.0, 10.0]])
    scores = jnp.array([[[0.0, 0.0, 0.0]]])  # uniform -> prob 1/3 each fg class
    locs = jnp.zeros((1, 1, 4))
    pp = make_postprocessor(score_threshold=0.9)
    dets, valid = pp(scores, locs, priors)
    assert not np.asarray(valid).any()


def test_postprocess_sigmoid_converter():
    priors = jnp.array([[50.0, 50.0, 20.0, 10.0]])
    scores = jnp.array([[[5.0, -5.0]]])  # 2 fg classes, sigmoid mode
    locs = jnp.zeros((1, 1, 4))
    pp = make_postprocessor(score_converter='SIGMOID', max_total=5)
    dets, valid = pp(scores, locs, priors)
    v = np.asarray(valid)[0]
    d = np.asarray(dets)[0]
    assert v[0] and d[0, 4] == 1.0 and d[0, 5] > 0.99


def test_postprocess_nms_suppresses_duplicates():
    # two anchors at the same location predicting the same class
    priors = jnp.array([[50.0, 50.0, 20.0, 10.0], [50.0, 50.0, 20.0, 10.0]])
    scores = jnp.array([[[-5.0, 5.0], [-5.0, 4.0]]])
    locs = jnp.zeros((1, 2, 4))
    pp = make_postprocessor(max_total=5)
    dets, valid = pp(scores, locs, priors)
    assert np.asarray(valid)[0].sum() == 1


def test_pre_nms_top_k_equivalence():
    """With pre_nms_top_k >= the number of anchors carrying real scores the
    candidate pre-selection is lossless: identical detections/validity."""
    import jax
    import jax.numpy as jnp

    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    from single_shot_detection_tpu.ops.postprocess import Postprocessor

    rng = np.random.RandomState(7)
    B, A, C = 2, 400, 6
    anchors = np.stack([rng.uniform(20, 280, A), rng.uniform(20, 280, A),
                        rng.uniform(20, 60, A), rng.uniform(20, 60, A)],
                       axis=-1).astype(np.float32)
    # few strong detections, everything else far below threshold
    scores = np.full((B, A, C), -9.0, np.float32)
    for b in range(B):
        for a in rng.choice(A, 24, replace=False):
            scores[b, a, rng.randint(1, C)] = rng.uniform(1.0, 6.0)
    locs = rng.randn(B, A, 4).astype(np.float32) * 0.1

    coder = BoxCoder(10.0, 5.0)
    kw = dict(box_coder=coder, score_threshold=0.1,
              nms={'max_per_class': 10, 'overlap_threshold': 0.5},
              score_converter='SOFTMAX', max_total=20, use_pallas=False)
    exact = Postprocessor(**kw)
    fast = Postprocessor(pre_nms_top_k=64, **kw)

    d0, v0 = exact(jnp.asarray(scores), jnp.asarray(locs), jnp.asarray(anchors))
    d1, v1 = fast(jnp.asarray(scores), jnp.asarray(locs), jnp.asarray(anchors))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d0)[np.asarray(v0)],
                               np.asarray(d1)[np.asarray(v1)], atol=1e-5)


def test_pre_nms_top_k_approx_candidate_selection(rng):
    """Dict-form pre_nms_top_k with approx=True (jax.lax.approx_max_k
    candidate pre-selection) recovers the real detections when the
    candidate budget comfortably exceeds the scoring anchors."""
    import jax.numpy as jnp
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    from single_shot_detection_tpu.ops.postprocess import Postprocessor

    rs = np.random.RandomState(13)
    B, A, C = 2, 512, 6
    anchors = np.stack([rs.uniform(20, 280, A), rs.uniform(20, 280, A),
                        rs.uniform(20, 60, A), rs.uniform(20, 60, A)],
                       axis=-1).astype(np.float32)
    scores = np.full((B, A, C), -9.0, np.float32)
    for b in range(B):
        for a in rs.choice(A, 16, replace=False):
            scores[b, a, rs.randint(1, C)] = rs.uniform(2.0, 6.0)
    locs = rs.randn(B, A, 4).astype(np.float32) * 0.1

    coder = BoxCoder(10.0, 5.0)
    kw = dict(box_coder=coder, score_threshold=0.1,
              nms={'max_per_class': 10, 'overlap_threshold': 0.5},
              score_converter='SOFTMAX', max_total=20, use_pallas=False)
    exact = Postprocessor(pre_nms_top_k=128, **kw)
    approx = Postprocessor(pre_nms_top_k={'k': 128, 'approx': True,
                                          'recall_target': 0.95}, **kw)
    assert approx.pre_nms_approx and approx.pre_nms_top_k == 128

    d0, v0 = exact(jnp.asarray(scores), jnp.asarray(locs),
                   jnp.asarray(anchors))
    d1, v1 = approx(jnp.asarray(scores), jnp.asarray(locs),
                    jnp.asarray(anchors))
    # the 16 true detections sit far above the noise floor; a 128-candidate
    # approx selection must recover (nearly) all of them.  Compare the
    # top-scoring detection sets by (class, score) rows.
    got = {(int(c), round(float(s), 4))
           for *_, c, s in np.asarray(d1)[np.asarray(v1)]}
    want = {(int(c), round(float(s), 4))
            for *_, c, s in np.asarray(d0)[np.asarray(v0)]}
    missing = want - got
    assert len(missing) <= max(1, int(0.1 * len(want))), (missing, want)
