"""Live inference viewer over a video file or image directory.

Functional-parity target: reference ``bf/utils/video_viewer.py:16-55`` —
frame -> predict -> draw -> show, with q/Q to quit.
"""

from __future__ import annotations

import glob
import logging
import os

import numpy as np

from single_shot_detection_tpu.utils.image_utils import draw_boxes


class VideoViewer:
    def __init__(self, path: str, experiment):
        self.path = path
        self.experiment = experiment

    def _frames(self):
        try:
            import cv2
        except ImportError:
            cv2 = None
        if self.path and os.path.isdir(self.path):
            patterns = ('*.jpg', '*.jpeg', '*.png')
            files = sorted(f for p in patterns for f in glob.glob(
                os.path.join(self.path, '**', p), recursive=True))
            from PIL import Image
            for f in files:
                with Image.open(f) as im:
                    yield np.asarray(im.convert('RGB'))
        elif self.path and cv2 is not None:
            cap = cv2.VideoCapture(self.path)
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            cap.release()
        else:
            logging.error(f'XX cannot open {self.path}')

    def run(self):
        import os
        try:
            import cv2
            # cv2.imshow aborts (C-level) without a display — never try
            # interactive mode headless
            interactive = bool(os.environ.get('DISPLAY')
                               or os.environ.get('WAYLAND_DISPLAY'))
        except ImportError:
            cv2 = None
            interactive = False
        labels = None
        if getattr(self.experiment, 'datasets', None):
            ds = (self.experiment.datasets.get('eval')
                  or self.experiment.datasets.get('train'))
            labels = ds.class_labels if ds else None
        for i, frame in enumerate(self._frames()):
            dets = self.experiment.predict(frame)
            out = draw_boxes(frame, dets, labels)
            if interactive:
                cv2.imshow('detections', cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
                key = cv2.waitKey(1) & 0xFF
                if key in (ord('q'), ord('Q')):
                    break
            else:
                from PIL import Image
                os.makedirs('/tmp/ssd_tpu_frames', exist_ok=True)
                Image.fromarray(out).save(f'/tmp/ssd_tpu_frames/{i:05d}.png')
