from single_shot_detection_tpu.parallel.mesh import (DATA_AXIS,  # noqa: F401
                                                     MODEL_AXIS,
                                                     all_gather_host,
                                                     batch_sharding,
                                                     batch_shardings,
                                                     create_mesh,
                                                     host_local_rows,
                                                     initialize_distributed,
                                                     make_global_batch,
                                                     replicated, shard_batch,
                                                     tensor_state_sharding,
                                                     zero_state_sharding)
from single_shot_detection_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_apply)
