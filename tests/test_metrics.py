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
