"""Host-side visualization helpers (parity: bf/utils/image_utils.py)."""

from __future__ import annotations

import numpy as np

_COLORS = [(220, 20, 60), (0, 128, 0), (0, 0, 255), (255, 165, 0),
           (128, 0, 128), (0, 255, 255), (255, 0, 255), (128, 128, 0)]


def draw_boxes(img: np.ndarray, boxes: np.ndarray,
               class_labels=None) -> np.ndarray:
    """Draw colored box outlines (+ optional labels/scores) on a copy of
    ``img`` (parity: image_utils.py:10-35, cv2-optional)."""
    out = np.ascontiguousarray(img).copy()
    try:
        import cv2
    except ImportError:
        cv2 = None
    for row in np.asarray(boxes):
        x0, y0, x1, y1 = [int(v) for v in row[:4]]
        cls = int(row[4]) if len(row) > 4 else 0
        color = _COLORS[cls % len(_COLORS)]
        if cv2 is not None:
            cv2.rectangle(out, (x0, y0), (x1, y1), color, 2)
            if class_labels and cls < len(class_labels):
                text = class_labels[cls]
                if len(row) > 5:
                    text += f' {row[5]:.2f}'
                cv2.putText(out, text, (x0, max(y0 - 4, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        else:
            out[y0:y1 + 1, x0:x0 + 2] = color
            out[y0:y1 + 1, max(x1 - 1, 0):x1 + 1] = color
            out[y0:y0 + 2, x0:x1 + 1] = color
            out[max(y1 - 1, 0):y1 + 1, x0:x1 + 1] = color
    return out


def display(img: np.ndarray, boxes: np.ndarray, class_labels=None,
            window: str = 'detections'):
    """imshow wrapper; falls back to saving a PNG when headless."""
    out = draw_boxes(img, boxes, class_labels)
    try:
        import cv2
        cv2.imshow(window, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        cv2.waitKey(1)
    except Exception:
        from PIL import Image
        Image.fromarray(out).save('/tmp/ssd_tpu_display.png')
