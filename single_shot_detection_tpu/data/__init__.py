from single_shot_detection_tpu.data import datasets  # noqa: F401
from single_shot_detection_tpu.data import loader  # noqa: F401
from single_shot_detection_tpu.data import transforms  # noqa: F401
from single_shot_detection_tpu.data.datasets import DATASETS  # noqa: F401
from single_shot_detection_tpu.data.loader import Loader, create_loaders  # noqa: F401
from single_shot_detection_tpu.data.transforms import Pipeline  # noqa: F401
