"""single_shot_detection_tpu — a TPU-native single-shot object detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch framework georgymironov/single_shot_detection: declarative-config
training/eval/export pipelines for single-shot detectors (SSD, RetinaNet,
M2Det) over VOC/COCO/custom datasets.

Design stance (TPU-first, not a port):
  * functional core — params / optimizer state / batch stats are pytrees; one
    jitted ``train_step(state, batch) -> (state, metrics)``;
  * everything per-batch and on-chip — target assignment, loss sampling and
    NMS are fixed-shape, vmapped ops (the reference runs them per-image on
    CPU);
  * fixed shapes everywhere — variable-length ground truth becomes padded
    ``[B, max_gt, 6]`` arrays with validity masks;
  * data parallelism via ``jax.sharding.Mesh`` + jit shardings with gradient
    ``pmean`` compiled into the step (the reference uses NCCL/apex DDP);
  * bf16 compute by default (the reference uses apex AMP loss scaling).
"""

__version__ = "0.1.0"

from single_shot_detection_tpu import ops  # noqa: F401
