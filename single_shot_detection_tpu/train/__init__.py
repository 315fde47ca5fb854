from single_shot_detection_tpu.train import optimizers  # noqa: F401
from single_shot_detection_tpu.train import schedulers  # noqa: F401
from single_shot_detection_tpu.train.state import TrainState, create_train_state  # noqa: F401
from single_shot_detection_tpu.train.step import (apply_mixup,  # noqa: F401
                                                  make_eval_step,
                                                  make_fused_train_step,
                                                  make_predict_step,
                                                  make_train_step)
