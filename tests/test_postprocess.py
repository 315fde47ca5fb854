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
