import jax
import jax.numpy as jnp
import numpy as np

from single_shot_detection_tpu.data.transforms import (Pipeline, _hsv_to_rgb,
                                                       _rgb_to_hsv,
                                                       adjust_brightness,
                                                       adjust_contrast,
                                                       crop_op, expand_op,
                                                       hflip_op,
                                                       identity_state,
                                                       sample_view)


PREPROCESSING = [
    {'name': 'ToFloatTensor', 'args': {'normalize': True}},
    {'name': 'Normalize', 'args': {'mean': [0.485, 0.456, 0.406],
                                   'std': [0.229, 0.224, 0.225]}},
]


def test_identity_pipeline_is_normalize(rng):
    pipe = Pipeline(augmentations=[], preprocessing=PREPROCESSING,
                    input_size=(32, 32), train=False)
    img = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    boxes = np.zeros((2, 3, 7), np.float32)
    boxes[:, 0] = [2, 3, 10, 12, 1, 1, 0]
    mask = np.zeros((2, 3), bool)
    mask[:, 0] = True
    out, out_boxes, out_mask = pipe(jax.random.PRNGKey(0),
                                    jnp.asarray(img), jnp.asarray(boxes),
                                    jnp.asarray(mask))
    expected = (img.astype(np.float32) / 255.0 -
                np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_boxes)[:, 0, :4], boxes[:, 0, :4],
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_mask), mask)


def test_hsv_roundtrip(rng):
    rgb = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                               rtol=1e-4, atol=1e-4)


def test_brightness_and_contrast_bounds(rng):
    img = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32) * 255)
    out = adjust_brightness(jax.random.PRNGKey(0), img, 0.5, p=1.0)
    assert float(out.min()) >= 0 and float(out.max()) <= 255
    out = adjust_contrast(jax.random.PRNGKey(1), img, (0.5, 1.5), p=1.0)
    assert float(out.min()) >= 0 and float(out.max()) <= 255


def test_hflip_op_reference_semantics():
    # reference: x0', x2' = w-1-x2, w-1-x0 (functional/box.py:21-24)
    state = (jnp.float32(100), jnp.float32(50), jnp.eye(2), jnp.zeros(2),
             jnp.asarray([0.0, 0, 99, 49]),
             jnp.asarray([[10.0, 5, 30, 25, 1, 1, 0]]), jnp.asarray([True]))
    _, _, D, t, _, boxes, _ = hflip_op(jax.random.PRNGKey(0), state, p=1.0)
    np.testing.assert_allclose(np.asarray(boxes)[0, :4], [69, 5, 89, 25])
    # window map mirrors: frame x -> staged 99 - x
    np.testing.assert_allclose(np.asarray(D)[0], [-1, 0])
    np.testing.assert_allclose(float(t[0]), 99)


def test_expand_op_grows_and_offsets_boxes():
    boxes = jnp.asarray([[10.0, 10, 30, 30, 1, 1, 0]])
    state = identity_state(100, 100, boxes, jnp.asarray([True]))
    w, h, D, t, _, out_boxes, _ = expand_op(jax.random.PRNGKey(0), state,
                                         (0.5, 2.0), (2.0, 4.0), p=1.0)
    assert float(w) >= 100 and float(h) >= 100
    # box offset equals window origin shift (D = identity here)
    np.testing.assert_allclose(float(out_boxes[0, 0]) - 10.0, -float(t[0]))
    np.testing.assert_allclose(float(out_boxes[0, 1]) - 10.0, -float(t[1]))


def test_crop_op_keeps_center_boxes():
    # one big box covering the middle: any accepted crop must keep it
    boxes = jnp.asarray([[30.0, 30, 70, 70, 2, 1, 0]])
    state = identity_state(100, 100, boxes, jnp.asarray([True]))
    accepted_any = False
    for i in range(5):
        w, h, D, t, _, out_boxes, out_mask = crop_op(
            jax.random.PRNGKey(i), state, min_iou=0.0,
            area_range=(0.5, 1.0), p=1.0)
        if float(w) < 100 or float(h) < 100:
            accepted_any = True
            assert bool(out_mask[0])
            b = np.asarray(out_boxes[0, :4])
            assert (b[:2] >= 0).all()
            assert b[2] <= float(w) - 1 and b[3] <= float(h) - 1
    assert accepted_any


def test_crop_op_empty_target_accepts():
    boxes = jnp.zeros((2, 7))
    state = identity_state(100, 100, boxes, jnp.zeros((2,), bool))
    w, h, *_ = crop_op(jax.random.PRNGKey(0), state, min_iou=0.5, p=1.0)
    assert float(w) <= 100 and float(h) <= 100  # crop applied


def _window(cur_w, cur_h, D=None, t=(0.0, 0.0), valid=None):
    D = jnp.eye(2) if D is None else jnp.asarray(D, jnp.float32)
    if valid is None:
        valid = (-1e9, -1e9, 1e9, 1e9)
    return (jnp.float32(cur_w), jnp.float32(cur_h), D,
            jnp.asarray(t, jnp.float32), jnp.asarray(valid, jnp.float32))


def test_sample_view_identity():
    img = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    out = sample_view(img, _window(4, 4), (4, 4), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_sample_view_oob_fill():
    img = jnp.ones((4, 4, 3), jnp.float32) * 100
    fill = jnp.asarray([7.0, 8.0, 9.0])
    # window entirely left of the image
    out = sample_view(img, _window(4, 4, t=(-10.0, 0.0)), (4, 4), fill)
    np.testing.assert_allclose(np.asarray(out)[0, 0], [7, 8, 9])


def test_sample_view_hflip():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    img = jnp.tile(img, (1, 1, 3))
    out = sample_view(img, _window(4, 4, D=[[-1, 0], [0, 1]], t=(3.0, 0.0)),
                      (4, 4), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out)[:, :, 0],
                               np.asarray(img)[:, ::-1, 0], atol=1e-5)


def test_sample_view_rot90():
    """An anti-diagonal window map reproduces jnp.rot90 exactly."""
    img = jnp.asarray(np.random.RandomState(0).rand(6, 6, 3).astype(np.float32))
    # one rotation step from identity: D = ROT, t = [s-1, 0]
    out = sample_view(img, _window(6, 6, D=[[0, -1], [1, 0]], t=(5.0, 0.0)),
                      (6, 6), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), np.rot90(np.asarray(img), 1),
                               atol=1e-5)


def test_full_train_pipeline_runs(rng):
    augmentations = [
        {'name': 'RandomAdjustHueSaturation',
         'args': {'max_hue_delta': .1, 'saturation_delta_range': (.5, 1.5)}},
        {'name': 'ToFloat'},
        {'name': 'RandomAdjustBrightness', 'args': {'max_brightness_delta': .15}},
        {'name': 'RandomAdjustContrast', 'args': {'contrast_delta_range': (.5, 1.5)}},
        {'name': 'RandomExpand',
         'args': {'aspect_ratio_range': (0.5, 2.0), 'area_range': (1.0, 16.0)}},
        {'name': 'OneOf', 'args': {'transforms': [
            {'name': 'Identity'},
            {'name': 'RandomCrop', 'args': {'min_iou': .0}},
            {'name': 'RandomCrop', 'args': {'min_iou': .5}},
        ]}},
        {'name': 'RandomHorizontalFlip'},
    ]
    pipe = Pipeline(augmentations=augmentations, preprocessing=PREPROCESSING,
                    input_size=(64, 64), train=True)
    img = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    boxes = np.zeros((4, 5, 7), np.float32)
    mask = np.zeros((4, 5), bool)
    for b in range(4):
        boxes[b, 0] = [10, 10, 50, 50, 1, 1, 0]
        mask[b, 0] = True
    outs = []
    for i in range(3):
        out, out_boxes, out_mask = pipe(jax.random.PRNGKey(i),
                                        jnp.asarray(img), jnp.asarray(boxes),
                                        jnp.asarray(mask))
        assert out.shape == (4, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()
        ob = np.asarray(out_boxes)
        assert (ob[..., :4] >= 0).all() and (ob[..., :4] <= 63).all()
        # class/score columns pass through untouched
        valid = np.asarray(out_mask)
        assert (ob[..., 4][valid & mask] >= 0).all()
        outs.append(np.asarray(out))
    # different seeds produce different augmentations
    assert not np.allclose(outs[0], outs[1])


def test_random_rotate_consistency(rng):
    """Rotated boxes still frame the rotated content."""
    from single_shot_detection_tpu.data.transforms import rot90_op
    img = np.zeros((32, 32, 3), np.float32)
    img[4:12, 20:30] = 255.0  # patch at rows 4..11, cols 20..29
    boxes = jnp.asarray([[20.0, 4, 29, 11, 1, 1, 0]])
    mask = jnp.asarray([True])
    rotated = 0
    for seed in range(8):
        state = identity_state(32, 32, boxes, mask)
        w, h, D, t, v, out_boxes, _ = rot90_op(jax.random.PRNGKey(seed), state)
        out_img = sample_view(jnp.asarray(img), (w, h, D, t, v), (32, 32),
                              jnp.zeros(3))
        if not np.allclose(np.asarray(D), np.eye(2)):
            rotated += 1
        b = np.asarray(out_boxes[0, :4]).astype(int)
        oi = np.asarray(out_img)
        inside = oi[b[1]:b[3] + 1, b[0]:b[2] + 1]
        assert inside.mean() > 200  # the patch is inside the rotated box
        total_bright = (oi > 200).sum()
        assert total_bright == (img > 200).sum()  # nothing lost
    assert rotated >= 3  # k != 0 actually occurs


def test_random_rotate_pipeline():
    import jax
    pipe = Pipeline(augmentations=[{'name': 'RandomRotate'},
                                   {'name': 'RandomHorizontalFlip'}],
                    preprocessing=PREPROCESSING, input_size=(32, 32))
    img = np.random.RandomState(0).randint(0, 255, (2, 32, 32, 3), np.uint8)
    boxes = np.zeros((2, 2, 7), np.float32)
    boxes[:, 0] = [4, 4, 20, 20, 1, 1, 0]
    mask = np.zeros((2, 2), bool)
    mask[:, 0] = True
    out, ob, om = pipe(jax.random.PRNGKey(1), jnp.asarray(img),
                       jnp.asarray(boxes), jnp.asarray(mask))
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(ob)[..., :4] <= 31).all()


def test_match_bipartite():
    import jax.numpy as jnp
    from single_shot_detection_tpu.ops.matching import match_bipartite
    w = jnp.asarray([[0.9, 0.1, 0.2],
                     [0.8, 0.7, 0.3]])
    idx = np.asarray(match_bipartite(w, jnp.asarray([True, True])))
    assert idx[0] == 0   # global best
    assert idx[1] == 1   # column 0 consumed


_EXPAND = {'name': 'RandomExpand',
           'args': {'aspect_ratio_range': (0.5, 2.0), 'area_range': (1.0, 9.0)}}
_CROP_ONEOF = {'name': 'OneOf', 'args': {'transforms': [
    {'name': 'Identity'},
    {'name': 'RandomCrop', 'args': {'min_iou': .1}},
    {'name': 'RandomCrop', 'args': {'min_iou': .5}},
]}}
_HFLIP = {'name': 'RandomHorizontalFlip'}
_VFLIP = {'name': 'RandomVerticalFlip'}
_ROTATE = {'name': 'RandomRotate'}
_BRIGHT = {'name': 'RandomAdjustBrightness',
           'args': {'max_brightness_delta': .05}}
# geometric transforms must compose in ANY config order (the reference
# applies them sequentially on materialized images, transforms.py:13-17);
# flips/rotations BEFORE expand/crop exercise the window-map composition.
_ORDERINGS = [
    [_BRIGHT, _EXPAND, _CROP_ONEOF, _HFLIP],        # shipped-config order
    [_HFLIP, _EXPAND, _CROP_ONEOF],                 # flip first
    [_VFLIP, _HFLIP, _CROP_ONEOF, _EXPAND],         # flips first, expand last
    [_EXPAND, _HFLIP, _CROP_ONEOF, _VFLIP],         # flip between expand/crop
    [_ROTATE, _EXPAND, _CROP_ONEOF, _HFLIP],        # rotate then geometry
    [{'name': 'OneOf', 'args': {'transforms': [    # OneOf over mixed kinds
        _HFLIP, _EXPAND, {'name': 'RandomCrop', 'args': {'min_iou': .1}},
        {'name': 'Identity'}]}},
     _HFLIP],
    [{'name': 'OneOf', 'args': {'transforms': [    # NESTED OneOf
        {'name': 'OneOf', 'args': {'transforms': [_HFLIP, _VFLIP]}},
        _CROP_ONEOF,
        _BRIGHT,
        {'name': 'Identity'}]}},
     _EXPAND],
]


def _track_content(augmentations, n_seeds=12, min_checked=6):
    """A bright patch framed by a GT box must stay inside the transformed
    box through the whole chain — for any transform ordering."""
    pipe = Pipeline(augmentations=augmentations,
                    preprocessing=[{'name': 'ToFloatTensor',
                                    'args': {'normalize': True}}],
                    input_size=(64, 64), train=True)
    img = np.zeros((1, 64, 64, 3), np.uint8)
    img[0, 20:36, 12:32] = 255  # rows 20..35, cols 12..31
    boxes = np.zeros((1, 2, 7), np.float32)
    boxes[0, 0] = [12, 20, 31, 35, 1, 1, 0]
    mask = np.zeros((1, 2), bool)
    mask[0, 0] = True

    checked = 0
    for seed in range(n_seeds):
        out, ob, om = pipe(jax.random.PRNGKey(seed), jnp.asarray(img),
                           jnp.asarray(boxes), jnp.asarray(mask))
        if not bool(om[0, 0]):
            continue  # crop dropped the box
        b = np.asarray(ob[0, 0, :4])
        oi = np.asarray(out[0]).sum(-1)  # bright pixels >> dark/fill
        bright = oi > oi.mean() + 2 * oi.std() if oi.std() > 0 else oi > 0.5
        ys, xs = np.nonzero(bright)
        if len(xs) < 6:
            continue
        checked += 1
        # 80th-percentile extent of the bright patch must fall inside the
        # (slightly padded) transformed box — bilinear edges bleed ~1px
        x_lo, x_hi = np.percentile(xs, [10, 90])
        y_lo, y_hi = np.percentile(ys, [10, 90])
        assert b[0] - 2 <= x_lo and x_hi <= b[2] + 2, (seed, b, (x_lo, x_hi))
        assert b[1] - 2 <= y_lo and y_hi <= b[3] + 2, (seed, b, (y_lo, y_hi))
    assert checked >= min_checked


def test_boxes_track_content_through_full_pipeline(rng):
    _track_content(_ORDERINGS[0])


def test_boxes_track_content_any_transform_order(rng):
    for order in _ORDERINGS[1:]:
        _track_content(order)


def test_contrast_after_geometric_warns():
    """Contrast after a geometric transform deviates from the reference
    (mean anchored on the full staged image, not the cropped view) — the
    pipeline must say so at build time instead of silently diverging."""
    import pytest as _pytest
    spec = {'name': 'RandomAdjustContrast',
            'args': {'contrast_delta_range': (.5, 1.5)}}
    crop = {'name': 'RandomCrop', 'args': {'min_iou': .0}}
    with _pytest.warns(UserWarning, match='mean anchor'):
        Pipeline(augmentations=[crop, spec], input_size=(16, 16), train=True)
    # ...including when the contrast hides under a OneOf
    with _pytest.warns(UserWarning, match='mean anchor'):
        Pipeline(augmentations=[crop, {'name': 'OneOf', 'args': {
            'transforms': [spec, {'name': 'Identity'}]}}],
            input_size=(16, 16), train=True)
    # reference order (photometric first) stays silent
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        Pipeline(augmentations=[spec, crop], input_size=(16, 16), train=True)
    # contrast and geometric in the SAME OneOf: only one branch applies,
    # so contrast can never follow a geometric op — stays silent
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        Pipeline(augmentations=[{'name': 'OneOf', 'args': {
            'transforms': [spec, crop]}}], input_size=(16, 16), train=True)
    # flips/rot90 preserve the pixel multiset — the contrast mean is
    # identical either way, so contrast after them stays silent
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        Pipeline(augmentations=[{'name': 'RandomHorizontalFlip'},
                                {'name': 'RandomRotate'}, spec],
                 input_size=(16, 16), train=True)


def test_oneof_photometric_branches():
    """OneOf over a photometric branch (reference transforms.py:19-25 allows
    any transform under OneOf): the output must equal exactly one branch's
    own result — here a DETERMINISTIC contrast (delta_range pinned to 2.0,
    p=1) vs Identity — and both branches must occur across seeds."""
    pipe = Pipeline(
        augmentations=[{'name': 'OneOf', 'args': {'transforms': [
            {'name': 'RandomAdjustContrast',
             'args': {'contrast_delta_range': (2.0, 2.0), 'p': 1.0}},
            {'name': 'Identity'},
        ]}}],
        preprocessing=[{'name': 'ToFloatTensor', 'args': {'normalize': True}}],
        input_size=(16, 16), train=True)

    img = np.random.RandomState(3).randint(40, 200, (1, 16, 16, 3), np.uint8)
    imgf = img[0].astype(np.float32)
    mean = imgf.reshape(-1, 3).mean(0)
    contrasted = np.clip(mean + 2.0 * (imgf - mean), 0, 255) / 255.0
    identity = imgf / 255.0
    boxes = np.zeros((1, 1, 7), np.float32)
    boxes[0, 0] = [2, 2, 10, 10, 1, 1, 0]
    mask = np.ones((1, 1), bool)

    hits = {'contrast': 0, 'identity': 0}
    for seed in range(10):
        out, ob, om = pipe(jax.random.PRNGKey(seed), jnp.asarray(img),
                           jnp.asarray(boxes), jnp.asarray(mask))
        o = np.asarray(out[0])
        if np.allclose(o, contrasted, atol=1e-4):
            hits['contrast'] += 1
        elif np.allclose(o, identity, atol=1e-4):
            hits['identity'] += 1
        else:
            raise AssertionError(f'seed {seed}: output matches neither branch')
        # photometric branches never move boxes
        np.testing.assert_allclose(np.asarray(ob), boxes, atol=1e-5)
    assert hits['contrast'] > 0 and hits['identity'] > 0, hits


def test_oneof_mixed_photometric_geometric():
    """OneOf over {photometric, geometric} branches: output is exactly one of
    {contrast(img) with unmoved boxes, hflip(img) with mirrored boxes}."""
    pipe = Pipeline(
        augmentations=[{'name': 'OneOf', 'args': {'transforms': [
            {'name': 'RandomAdjustContrast',
             'args': {'contrast_delta_range': (2.0, 2.0), 'p': 1.0}},
            {'name': 'RandomHorizontalFlip', 'args': {'p': 1.0}},
        ]}}],
        preprocessing=[{'name': 'ToFloatTensor', 'args': {'normalize': True}}],
        input_size=(16, 16), train=True)

    img = np.random.RandomState(7).randint(40, 200, (1, 16, 16, 3), np.uint8)
    imgf = img[0].astype(np.float32)
    mean = imgf.reshape(-1, 3).mean(0)
    contrasted = np.clip(mean + 2.0 * (imgf - mean), 0, 255) / 255.0
    flipped = imgf[:, ::-1] / 255.0
    boxes = np.zeros((1, 1, 7), np.float32)
    boxes[0, 0] = [2, 4, 10, 12, 1, 1, 0]
    mirrored = boxes.copy()
    mirrored[0, 0, 0] = 15 - 10
    mirrored[0, 0, 2] = 15 - 2
    mask = np.ones((1, 1), bool)

    hits = {'contrast': 0, 'flip': 0}
    for seed in range(10):
        out, ob, om = pipe(jax.random.PRNGKey(seed), jnp.asarray(img),
                           jnp.asarray(boxes), jnp.asarray(mask))
        o = np.asarray(out[0])
        if np.allclose(o, contrasted, atol=1e-4):
            hits['contrast'] += 1
            np.testing.assert_allclose(np.asarray(ob), boxes, atol=1e-5)
        elif np.allclose(o, flipped, atol=1e-4):
            hits['flip'] += 1
            np.testing.assert_allclose(np.asarray(ob), mirrored, atol=1e-5)
        else:
            raise AssertionError(f'seed {seed}: output matches neither branch')
    assert hits['contrast'] > 0 and hits['flip'] > 0, hits
