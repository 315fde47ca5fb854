"""Detection metrics: mean average precision (host-side numpy).

Functional-parity target: reference
``detection/metrics/mean_average_precision.py`` — greedy TP/FP assignment over
score-sorted predictions with per-GT dedup, VOC ``difficult`` exclusion, a
monotone precision envelope, and VOC 11-point or continuous AP integration.

This runs on the host over the (small) final detections, so plain numpy is the
right tool; the heavy work (NMS, decoding) already happened on-chip.
"""

from __future__ import annotations

from collections import defaultdict
import logging

import numpy as np

LOC_INDEX_START = 0
LOC_INDEX_END = 4
CLASS_INDEX = 4
SCORE_INDEX = 5
DIFFICULT_INDEX = 6


def _iou_one_to_many(box: np.ndarray, others: np.ndarray) -> np.ndarray:
    """IoU of one corner box against ``[N, 4]`` corner boxes."""
    mins = np.maximum(box[:2], others[:, :2])
    maxs = np.minimum(box[2:], others[:, 2:])
    inter = np.clip(maxs[:, 0] - mins[:, 0], 0, None) * np.clip(maxs[:, 1] - mins[:, 1], 0, None)
    area_a = max(box[2] - box[0], 0) * max(box[3] - box[1], 0)
    area_b = (np.clip(others[:, 2] - others[:, 0], 0, None)
              * np.clip(others[:, 3] - others[:, 1], 0, None))
    return inter / (area_a + area_b - inter)


def mean_average_precision(predictions,
                           gts,
                           class_labels,
                           iou_threshold: float,
                           voc: bool = False,
                           verbose: bool = True) -> float:
    """Vectorized mAP with the reference's exact greedy semantics.

    Groups predictions by (image, class); within a group the greedy
    per-GT-dedup assignment reduces to "the highest-scored prediction whose
    argmax-IoU GT is g wins g" (grouped ``np.unique``), which matches the
    reference's sequential loop because matching never crosses image/class
    boundaries.  Predictions matched to ``difficult`` GT are ignored (neither
    TP nor FP), exactly as mean_average_precision.py:62-69.
    """
    predictions = np.asarray(predictions, dtype=np.float64)
    if predictions.ndim != 2 or predictions.size == 0:
        predictions = predictions.reshape(0, 7)
    gts = [np.asarray(g, dtype=np.float64).reshape(
        -1, np.asarray(g).shape[-1] if np.asarray(g).size else 5)
        for g in gts]

    ignore_difficult = len(gts) > 0 and gts[0].shape[1] > DIFFICULT_INDEX
    total_positive = defaultdict(int)
    gt_grouped = {}
    for img_id, gt in enumerate(gts):
        for class_index in np.unique(gt[:, CLASS_INDEX]).astype(int):
            rows = gt[gt[:, CLASS_INDEX] == class_index]
            gt_grouped[(img_id, class_index)] = rows
            if ignore_difficult:
                total_positive[class_index] += int((rows[:, DIFFICULT_INDEX] == 0).sum())
            else:
                total_positive[class_index] += len(rows)

    # global score order (stable, matching torch argsort descending)
    order = np.argsort(-predictions[:, 6], kind='stable')
    predictions = predictions[order]

    n = len(predictions)
    tp_flag = np.zeros(n, bool)
    fp_flag = np.zeros(n, bool)
    pred_img = predictions[:, 0].astype(int)
    pred_cls = predictions[:, 5].astype(int)

    # group rows by (image, class) preserving score order within groups
    group_keys = pred_img.astype(np.int64) * (pred_cls.max() + 1 if n else 1) \
        + pred_cls if n else np.zeros(0, np.int64)
    for key in np.unique(group_keys):
        sel = np.nonzero(group_keys == key)[0]
        img_id = pred_img[sel[0]]
        class_index = pred_cls[sel[0]]
        candidates = gt_grouped.get((img_id, class_index))
        if candidates is None:
            fp_flag[sel] = True
            continue
        boxes = predictions[sel, 1:5]
        g = candidates[:, LOC_INDEX_START:LOC_INDEX_END]
        mins = np.maximum(boxes[:, None, :2], g[None, :, :2])
        maxs = np.minimum(boxes[:, None, 2:], g[None, :, 2:])
        inter = (np.clip(maxs[..., 0] - mins[..., 0], 0, None)
                 * np.clip(maxs[..., 1] - mins[..., 1], 0, None))
        area_p = (np.clip(boxes[:, 2] - boxes[:, 0], 0, None)
                  * np.clip(boxes[:, 3] - boxes[:, 1], 0, None))
        area_g = (np.clip(g[:, 2] - g[:, 0], 0, None)
                  * np.clip(g[:, 3] - g[:, 1], 0, None))
        iou = inter / (area_p[:, None] + area_g[None, :] - inter)

        best = iou.argmax(axis=1)
        best_iou = iou[np.arange(len(sel)), best]
        above = best_iou > iou_threshold
        if ignore_difficult:
            is_difficult = candidates[best, DIFFICULT_INDEX] != 0
        else:
            is_difficult = np.zeros(len(sel), bool)
        # first prediction (score order) per matched GT wins
        first_winner = np.zeros(len(sel), bool)
        seen = set()
        for i in range(len(sel)):
            if above[i] and not is_difficult[i] and best[i] not in seen:
                first_winner[i] = True
                seen.add(int(best[i]))
        tp_flag[sel] = first_winner
        # matched-to-difficult predictions are ignored entirely
        fp_flag[sel] = ~first_winner & ~(above & is_difficult)

    average_precision = {c: 0.0 for c in total_positive}
    if verbose:
        logging.info('Mean Average Precision results:')

    for class_index in sorted(total_positive.keys()):
        sel = pred_cls == class_index
        # drop ignored predictions (difficult matches): duplicate cumulative
        # points contribute nothing to the envelope/integral
        counted = tp_flag[sel] | fp_flag[sel]
        tp = np.cumsum(tp_flag[sel][counted]).astype(np.float64)
        fp = np.cumsum(fp_flag[sel][counted]).astype(np.float64)
        if len(tp) == 0:
            tp = np.array([0.0])
            fp = np.array([1.0])

        precision = tp / (tp + fp)
        precision = np.concatenate([precision, [0.0]])
        precision = np.maximum.accumulate(precision[::-1])[::-1]
        recall = tp / total_positive[class_index]

        if voc:
            recall = np.concatenate([recall, [1.0]])
            points = np.arange(0, 1.1, 0.1)
            indexes = (points[None, :] > recall[:, None]).sum(axis=0)
            average_precision[class_index] = float(precision[indexes].mean())
        else:
            recall = np.concatenate([[0.0], recall, [1.0]])
            average_precision[class_index] = float(
                np.dot(recall[1:] - recall[:-1], precision))

        if verbose:
            name = (class_labels.get(class_index, str(class_index))
                    if class_labels else str(class_index))
            logging.info(f'{name}: {average_precision[class_index]:6f}')

    if not average_precision:
        return 0.0
    map_value = sum(average_precision.values()) / len(average_precision)
    if verbose:
        logging.info(f'Total mean: {map_value:6f}')
    return map_value


def mean_average_precision_loop(predictions,
                                gts,
                                class_labels,
                                iou_threshold: float,
                                voc: bool = False,
                                verbose: bool = True) -> float:
    """Compute mAP (parity: mean_average_precision.py:10-116).

    Args:
      predictions: ``[N, 7]`` rows ``[image_id, x0, y0, x1, y1, class, score]``.
      gts: list over images of ``[Ni, >=5]`` rows ``[x0, y0, x1, y1, class,
        (score), (difficult)]``.
      class_labels: dict class_id -> name (for logging).
      iou_threshold: TP IoU threshold.
      voc: 11-point interpolation when True, continuous integration otherwise.
    """
    predictions = np.asarray(predictions, dtype=np.float64)
    gts = [np.asarray(g, dtype=np.float64).reshape(-1, max(np.asarray(g).shape[-1] if np.asarray(g).size else 5, 5))
           for g in gts]

    ignore_difficult = len(gts) > 0 and gts[0].shape[1] > DIFFICULT_INDEX
    total_positive = defaultdict(int)
    gt_grouped = []

    for gt in gts:
        by_class = defaultdict(list)
        for row in gt:
            class_index = int(row[CLASS_INDEX])
            by_class[class_index].append(row)
            if not ignore_difficult or row[DIFFICULT_INDEX] == 0:
                total_positive[class_index] += 1
        gt_grouped.append({c: np.stack(rows) for c, rows in by_class.items()})

    if predictions.size:
        predictions = predictions[np.argsort(-predictions[:, 6], kind='stable')]

    true_positive = defaultdict(list)
    false_positive = defaultdict(list)
    matched = defaultdict(lambda: defaultdict(set))

    for pred in predictions:
        image_id = int(pred[0])
        class_index = int(pred[5])
        box = pred[1:5]

        tp = true_positive[class_index]
        fp = false_positive[class_index]
        tp.append(0 if not tp else tp[-1])
        fp.append(0 if not fp else fp[-1])

        if class_index not in gt_grouped[image_id]:
            fp[-1] += 1
            continue

        candidates = gt_grouped[image_id][class_index]
        ious = _iou_one_to_many(box, candidates[:, LOC_INDEX_START:LOC_INDEX_END])
        index = int(np.argmax(ious))
        if ious[index] > iou_threshold:
            if not ignore_difficult or candidates[index, DIFFICULT_INDEX] == 0:
                if index not in matched[image_id][class_index]:
                    tp[-1] += 1
                    matched[image_id][class_index].add(index)
                else:
                    fp[-1] += 1
        else:
            fp[-1] += 1

    average_precision = {c: 0.0 for c in total_positive}
    if verbose:
        logging.info('Mean Average Precision results:')

    for class_index in sorted(total_positive.keys()):
        tp = np.asarray(true_positive.get(class_index, [0]), dtype=np.float64)
        fp = np.asarray(false_positive.get(class_index, [1]), dtype=np.float64)

        precision = tp / (tp + fp)
        precision = np.concatenate([precision, [0.0]])
        # monotone envelope (mean_average_precision.py:98-100)
        precision = np.maximum.accumulate(precision[::-1])[::-1]

        recall = tp / total_positive[class_index]

        if voc:
            recall = np.concatenate([recall, [1.0]])
            # 11-point interpolation: for each r in {0, .1, ..., 1.0} find the
            # first index with recall >= r (mean_average_precision.py:101-105)
            points = np.arange(0, 1.1, 0.1)
            indexes = (points[None, :] > recall[:, None]).sum(axis=0)
            average_precision[class_index] = float(precision[indexes].mean())
        else:
            recall = np.concatenate([[0.0], recall, [1.0]])
            average_precision[class_index] = float(np.dot(recall[1:] - recall[:-1], precision))

        if verbose:
            name = class_labels.get(class_index, str(class_index)) if class_labels else str(class_index)
            logging.info(f'{name}: {average_precision[class_index]:6f}')

    if not average_precision:
        return 0.0
    map_value = sum(average_precision.values()) / len(average_precision)
    if verbose:
        logging.info(f'Total mean: {map_value:6f}')
    return map_value


METRICS = {
    'mean_average_precision': mean_average_precision,
}
