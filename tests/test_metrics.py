import numpy as np

from single_shot_detection_tpu.ops.metrics import mean_average_precision


LABELS = {1: 'a', 2: 'b'}


def test_perfect_predictions_map_one():
    gts = [np.array([[0, 0, 10, 10, 1, 1.0]]),
           np.array([[5, 5, 20, 20, 2, 1.0]])]
    preds = np.array([
        [0, 0, 0, 10, 10, 1, 0.9],
        [1, 5, 5, 20, 20, 2, 0.8],
    ])
    assert mean_average_precision(preds, gts, LABELS, 0.5, verbose=False) == 1.0


def test_miss_and_false_positive():
    gts = [np.array([[0, 0, 10, 10, 1, 1.0],
                     [50, 50, 60, 60, 1, 1.0]])]
    preds = np.array([
        [0, 0, 0, 10, 10, 1, 0.9],       # TP
        [0, 80, 80, 90, 90, 1, 0.8],     # FP
    ])
    # continuous AP: precision envelope over recall [0, .5]: p=1 at recall .5
    ap = mean_average_precision(preds, gts, LABELS, 0.5, verbose=False)
    np.testing.assert_allclose(ap, 0.5)


def test_duplicate_detection_is_false_positive():
    gts = [np.array([[0, 0, 10, 10, 1, 1.0]])]
    preds = np.array([
        [0, 0, 0, 10, 10, 1, 0.9],
        [0, 0, 0, 10, 10, 1, 0.8],  # duplicate -> FP
    ])
    ap = mean_average_precision(preds, gts, LABELS, 0.5, verbose=False)
    np.testing.assert_allclose(ap, 1.0)  # envelope keeps precision 1 at recall 1


def test_difficult_gt_excluded():
    gts = [np.array([[0, 0, 10, 10, 1, 1.0, 1.0],     # difficult
                     [50, 50, 60, 60, 1, 1.0, 0.0]])]
    preds = np.array([[0, 50, 50, 60, 60, 1, 0.9]])
    ap = mean_average_precision(preds, gts, LABELS, 0.5, verbose=False)
    np.testing.assert_allclose(ap, 1.0)


def test_voc_11_point():
    gts = [np.array([[0, 0, 10, 10, 1, 1.0]])]
    preds = np.array([[0, 0, 0, 10, 10, 1, 0.9]])
    ap = mean_average_precision(preds, gts, LABELS, 0.5, voc=True, verbose=False)
    np.testing.assert_allclose(ap, 1.0)


def test_low_iou_is_false_positive():
    gts = [np.array([[0, 0, 10, 10, 1, 1.0]])]
    preds = np.array([[0, 8, 8, 18, 18, 1, 0.9]])  # iou ~ 0.02
    ap = mean_average_precision(preds, gts, LABELS, 0.5, verbose=False)
    np.testing.assert_allclose(ap, 0.0)


def test_vectorized_matches_loop_implementation():
    from single_shot_detection_tpu.ops.metrics import (
        mean_average_precision_loop)
    rng = np.random.RandomState(7)
    for trial in range(10):
        num_images = rng.randint(2, 6)
        gts = []
        for _ in range(num_images):
            n = rng.randint(1, 6)
            rows = np.zeros((n, 7))
            for i in range(n):
                x, y = rng.rand(2) * 80
                w, h = rng.rand(2) * 30 + 5
                rows[i] = [x, y, x + w, y + h, rng.randint(1, 4), 1.0,
                           rng.rand() < 0.2]
            gts.append(rows)
        preds = []
        for img_id, gt in enumerate(gts):
            for row in gt:
                if rng.rand() < 0.8:  # near-hit
                    jitter = rng.randn(4) * 3
                    preds.append([img_id, *(row[:4] + jitter),
                                  row[4] if rng.rand() < 0.9
                                  else rng.randint(1, 4), rng.rand()])
            for _ in range(rng.randint(0, 4)):  # noise
                x, y = rng.rand(2) * 80
                preds.append([img_id, x, y, x + 10, y + 10,
                              rng.randint(1, 4), rng.rand()])
        preds = np.asarray(preds)
        fast = mean_average_precision(preds, gts, {}, 0.5, verbose=False)
        slow = mean_average_precision_loop(preds, gts, {}, 0.5, verbose=False)
        np.testing.assert_allclose(fast, slow, atol=1e-9,
                                   err_msg=f'trial {trial}')
        fast_voc = mean_average_precision(preds, gts, {}, 0.5, voc=True,
                                          verbose=False)
        slow_voc = mean_average_precision_loop(preds, gts, {}, 0.5, voc=True,
                                               verbose=False)
        np.testing.assert_allclose(fast_voc, slow_voc, atol=1e-9)


def test_difficult_first_prediction_stays_finite():
    """Reference divergence (documented): when the top-scored prediction of a
    class matches a difficult GT, the reference's cumulative 0/0 yields NaN;
    the vectorized path drops ignored rows and stays finite."""
    gts = [np.array([[10, 10, 50, 50, 1, 1, 1],      # difficult
                     [60, 60, 90, 90, 1, 1, 0]])]
    preds = np.array([
        [0, 10, 10, 50, 50, 1, 0.9],   # matches the difficult box -> ignored
        [0, 60, 60, 90, 90, 1, 0.8],   # true positive
    ])
    ap = mean_average_precision(preds, gts, LABELS, 0.5, verbose=False)
    assert np.isfinite(ap)
    assert ap == 1.0


def test_no_gt_at_all_returns_zero():
    preds = np.array([[0, 10, 10, 50, 50, 1, 0.9]])
    gts = [np.zeros((0, 7))]
    assert mean_average_precision(preds, gts, LABELS, 0.5, verbose=False) == 0.0


def test_larger_fuzz_matches_loop_oracle():
    """Volume fuzz (no difficult boxes — see the NaN divergence note)."""
    from single_shot_detection_tpu.ops.metrics import \
        mean_average_precision_loop
    rng = np.random.RandomState(7)
    n_img, n_cls = 40, 12
    gts = []
    for _ in range(n_img):
        k = rng.randint(0, 8)
        xy = rng.rand(k, 2) * 200
        wh = rng.rand(k, 2) * 60 + 4
        cls = rng.randint(1, n_cls + 1, (k, 1)).astype(float)
        gts.append(np.concatenate([xy, xy + wh, cls, np.ones((k, 1)),
                                   np.zeros((k, 1))], 1))
    rows = []
    for i in range(n_img):
        for _ in range(rng.randint(0, 30)):
            if len(gts[i]) and rng.rand() < 0.7:
                base = gts[i][rng.randint(len(gts[i]))]
                box = base[:4] + rng.randn(4) * 6
                c = base[4] if rng.rand() < 0.8 else rng.randint(1, n_cls + 1)
            else:
                xy = rng.rand(2) * 200
                box = np.concatenate([xy, xy + rng.rand(2) * 60 + 4])
                c = rng.randint(1, n_cls + 1)
            rows.append([i, *box, c, rng.rand()])
    preds = np.asarray(rows)
    for voc in (False, True):
        fast = mean_average_precision(preds, gts, {}, 0.5, voc=voc,
                                      verbose=False)
        slow = mean_average_precision_loop(preds, gts, {}, 0.5, voc=voc,
                                           verbose=False)
        assert abs(fast - slow) < 1e-9, (voc, fast, slow)


def test_coco_sweep_matches_per_threshold_loop_oracle():
    """COCO-protocol sweep (one matching pass, many thresholds) must equal
    running the loop-oracle metric independently at every threshold."""
    from single_shot_detection_tpu.ops.metrics import (
        COCO_THRESHOLDS, coco_mean_average_precision,
        mean_average_precision_loop)
    rng = np.random.RandomState(11)
    n_img, n_cls = 12, 5
    gts = []
    for _ in range(n_img):
        k = rng.randint(1, 6)
        xy = rng.rand(k, 2) * 150
        wh = rng.rand(k, 2) * 50 + 5
        cls = rng.randint(1, n_cls + 1, (k, 1)).astype(float)
        gts.append(np.concatenate([xy, xy + wh, cls, np.ones((k, 1)),
                                   np.zeros((k, 1))], 1))
    rows = []
    for i in range(n_img):
        for _ in range(rng.randint(2, 15)):
            if rng.rand() < 0.7:
                base = gts[i][rng.randint(len(gts[i]))]
                box = base[:4] + rng.randn(4) * 4
                c = base[4]
            else:
                xy = rng.rand(2) * 150
                box = np.concatenate([xy, xy + rng.rand(2) * 50 + 5])
                c = rng.randint(1, n_cls + 1)
            rows.append([i, *box, c, rng.rand()])
    preds = np.asarray(rows)

    got = coco_mean_average_precision(preds, gts, verbose=False)
    per_thr = [mean_average_precision_loop(preds, gts, {}, float(t),
                                           voc=False, verbose=False)
               for t in COCO_THRESHOLDS]
    np.testing.assert_allclose(got['mAP@[.5:.95]'],
                               float(np.mean(per_thr)), atol=1e-9)
    np.testing.assert_allclose(got['mAP@.50'], per_thr[0], atol=1e-9)
    # threshold 0.75 is index 5 in .50:.05:.95
    np.testing.assert_allclose(got['mAP@.75'], per_thr[5], atol=1e-9)
    # monotone: stricter IoU can only lower the metric
    assert got['mAP@.50'] >= got['mAP@.75'] >= 0.0


def test_coco_sweep_empty_inputs():
    from single_shot_detection_tpu.ops.metrics import \
        coco_mean_average_precision
    out = coco_mean_average_precision(np.zeros((0, 7)), [], verbose=False)
    assert out['mAP@[.5:.95]'] == 0.0


def test_coco_extended_area_and_recall():
    """Extended COCO scoreboard: area-banded AP and AR@k behave sanely."""
    from single_shot_detection_tpu.ops.metrics import \
        coco_mean_average_precision

    # image 0: one small GT (20x20=400 px^2 < 32^2) detected perfectly;
    # image 1: one large GT (200x200 px^2 > 96^2) missed entirely
    gts = [np.array([[10., 10., 30., 30., 1., 1., 0.]]),
           np.array([[0., 0., 200., 200., 1., 1., 0.]])]
    # the FP outscores the TP so it lowers small-band precision at recall 1
    preds = np.array([[0, 10., 10., 30., 30., 1., 0.9],
                      [1, 300., 300., 310., 310., 1., 0.95]])  # small FP
    out = coco_mean_average_precision(preds, gts, extended=True,
                                      verbose=False)
    # the small band sees the detected small GT plus the small unmatched FP
    assert abs(out['mAP-small'] - 0.5) < 1e-9
    assert out['AR-small'] == 1.0
    # the large band only sees the missed large GT; the small FP is ignored
    # there (out-of-range unmatched detection)
    assert out['mAP-large'] == 0.0 and out['AR-large'] == 0.0
    # no medium GT anywhere -> band excluded, reported as 0
    assert out['mAP-medium'] == 0.0
    # overall recall: 1 of 2 GT found
    assert abs(out['AR@100'] - 0.5) < 1e-9


def test_coco_extended_max_dets_cap():
    """AR@1 considers only each image's best-scored detection."""
    from single_shot_detection_tpu.ops.metrics import \
        coco_mean_average_precision

    gts = [np.array([[10., 10., 50., 50., 1., 1., 0.],
                     [100., 100., 140., 140., 1., 1., 0.]])]
    # best-scored detection hits GT#0; second detection hits GT#1
    preds = np.array([[0, 10., 10., 50., 50., 1., 0.9],
                      [0, 100., 100., 140., 140., 1., 0.8]])
    out = coco_mean_average_precision(preds, gts, extended=True,
                                      verbose=False)
    assert abs(out['AR@1'] - 0.5) < 1e-9
    assert abs(out['AR@10'] - 1.0) < 1e-9
    assert abs(out['AR@100'] - 1.0) < 1e-9


def test_coco_extended_consistent_with_base():
    """extended=True must not change the base keys."""
    from single_shot_detection_tpu.ops.metrics import \
        coco_mean_average_precision
    rng = np.random.RandomState(3)
    gts = []
    for _ in range(6):
        k = rng.randint(1, 4)
        xy = rng.rand(k, 2) * 100
        wh = rng.rand(k, 2) * 80 + 5
        cls = rng.randint(1, 4, (k, 1)).astype(float)
        gts.append(np.concatenate([xy, xy + wh, cls, np.ones((k, 1)),
                                   np.zeros((k, 1))], 1))
    rows = []
    for i in range(6):
        for _ in range(rng.randint(2, 8)):
            base = gts[i][rng.randint(len(gts[i]))]
            rows.append([i, *(base[:4] + rng.randn(4) * 5), base[4],
                         rng.rand()])
    preds = np.asarray(rows)
    base = coco_mean_average_precision(preds, gts, verbose=False)
    ext = coco_mean_average_precision(preds, gts, extended=True,
                                      verbose=False)
    for k, v in base.items():
        np.testing.assert_allclose(ext[k], v, atol=1e-12)
    for k in ('mAP-small', 'mAP-medium', 'mAP-large',
              'AR@1', 'AR@10', 'AR@100',
              'AR-small', 'AR-medium', 'AR-large'):
        assert k in ext and 0.0 <= ext[k] <= 1.0
