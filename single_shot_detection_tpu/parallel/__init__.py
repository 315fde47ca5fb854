from single_shot_detection_tpu.parallel.mesh import (DATA_AXIS,  # noqa: F401
                                                     MODEL_AXIS,
                                                     batch_sharding,
                                                     create_mesh,
                                                     initialize_distributed,
                                                     replicated, shard_batch)
