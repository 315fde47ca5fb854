"""Model layer: backbones, feature necks, detector assembly (flax, NHWC)."""

from single_shot_detection_tpu.models import backbones  # noqa: F401
from single_shot_detection_tpu.models import builder  # noqa: F401
from single_shot_detection_tpu.models.builder import DetectorBundle, build  # noqa: F401
from single_shot_detection_tpu.models.detector import Detector  # noqa: F401
