"""Pure on-device detection math: boxes, coding, anchors, matching, sampling,
losses, NMS, postprocessing — all fixed-shape, jit/vmap-safe jnp ops."""

from single_shot_detection_tpu.ops import anchors  # noqa: F401
from single_shot_detection_tpu.ops import boxes  # noqa: F401
from single_shot_detection_tpu.ops import losses  # noqa: F401
from single_shot_detection_tpu.ops import matching  # noqa: F401
from single_shot_detection_tpu.ops import metrics  # noqa: F401
from single_shot_detection_tpu.ops import nms  # noqa: F401
from single_shot_detection_tpu.ops import postprocess  # noqa: F401
from single_shot_detection_tpu.ops import sampling  # noqa: F401
from single_shot_detection_tpu.ops.box_coder import BoxCoder  # noqa: F401
