from single_shot_detection_tpu.utils import misc  # noqa: F401
