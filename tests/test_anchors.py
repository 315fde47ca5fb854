import math

import numpy as np

from single_shot_detection_tpu.ops import anchors as anchor_ops


SSD_MB2_CFG = dict(
    type='ssd',
    num_scales=6,
    min_scale=0.1,
    max_scale=1.05,
    aspect_ratios=[[1.0, 2.0]] + [[1.0, 2.0, 3.0]] * 3 + [[1.0, 2.0]] * 2,
)
SSD_MB2_FMS = [(19, 19), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]


def test_ssd_mb2_voc_config_anchor_counts():
    gens = anchor_ops.build_anchor_generators(**SSD_MB2_CFG)
    assert [g.num_boxes for g in gens] == [4, 6, 6, 6, 4, 4]
    anchors = anchor_ops.generate_anchors(gens, (300, 300), SSD_MB2_FMS)
    expected = 19 * 19 * 4 + 10 * 10 * 6 + 5 * 5 * 6 + 3 * 3 * 6 + 2 * 2 * 4 + 1 * 4
    assert anchors.shape == (expected, 4)
    assert np.isfinite(anchors).all()


def test_ssd_anchor_first_scale_values():
    gens = anchor_ops.build_anchor_generators(**SSD_MB2_CFG)
    g = gens[0]
    boxes = g((300, 300), (19, 19))
    assert boxes.shape == (19, 19, 4, 4)
    scales = np.linspace(0.1, 1.05, 7)
    min_size = scales[0] * 300      # 30
    max_size = scales[1] * 300
    step = 300 / 19
    # first cell center at offset*step
    np.testing.assert_allclose(boxes[0, 0, 0, :2], [0.5 * step, 0.5 * step], rtol=1e-5)
    # box 0: ratio 1 -> (min, min)
    np.testing.assert_allclose(boxes[0, 0, 0, 2:], [min_size, min_size], rtol=1e-5)
    # box 1: ratio 2 -> (min*sqrt2, min/sqrt2); box 2: ratio .5 flipped
    np.testing.assert_allclose(boxes[0, 0, 1, 2:],
                               [min_size * math.sqrt(2), min_size / math.sqrt(2)], rtol=1e-5)
    np.testing.assert_allclose(boxes[0, 0, 2, 2:],
                               [min_size * math.sqrt(0.5), min_size / math.sqrt(0.5)], rtol=1e-5)
    # box 3: extra sqrt(min*max) box
    np.testing.assert_allclose(boxes[0, 0, 3, 2:],
                               [math.sqrt(min_size * max_size)] * 2, rtol=1e-5)
    # last cell center
    np.testing.assert_allclose(boxes[18, 18, 0, :2], [18.5 * step, 18.5 * step], rtol=1e-5)


def test_ssd_sizes_mode():
    gens = anchor_ops.build_anchor_generators(
        type='ssd', num_scales=2, sizes=[30, 60, 111],
        aspect_ratios=[[1.0, 2.0], [1.0, 2.0]])
    boxes = gens[0]((300, 300), (38, 38))
    np.testing.assert_allclose(boxes[0, 0, 0, 2:], [30, 30], rtol=1e-6)
    np.testing.assert_allclose(boxes[0, 0, 3, 2:], [math.sqrt(30 * 60)] * 2, rtol=1e-6)


def test_retina_anchor_generator():
    gens = anchor_ops.build_anchor_generators(
        type='retina_net', aspect_ratios=[0.5, 1.0, 2.0],
        min_level=3, max_level=7, scale=4, scales_per_level=3)
    assert len(gens) == 5
    assert gens[0].num_boxes == 9
    boxes = gens[0]((512, 512), (64, 64))
    assert boxes.shape == (64, 64, 9, 4)
    # level 3, first scale branch: size = 4 * 2^3 = 32; ar 0.5
    np.testing.assert_allclose(boxes[0, 0, 0, 2:],
                               [32 * math.sqrt(0.5), 32 / math.sqrt(0.5)], rtol=1e-5)
    # second branch: size = 4 * 2^(3 + 1/3)
    expected = 4 * 2 ** (3 + 1 / 3)
    np.testing.assert_allclose(boxes[0, 0, 3, 2:],
                               [expected * math.sqrt(0.5), expected / math.sqrt(0.5)], rtol=1e-5)


def test_step_and_clip_options():
    g = anchor_ops.SsdAnchorGenerator([1.0], min_scale=0.9, max_scale=1.2,
                                      step=100, clip=True)
    boxes = g((300, 300), (3, 3))
    np.testing.assert_allclose(boxes[0, 0, 0, :2], [50, 50], rtol=1e-6)
    assert boxes[..., 2].max() <= 299
