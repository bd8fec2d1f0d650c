from seg2eye_tpu.parallel.sharding import (make_mesh, shard_batch,  # noqa: F401
                                           replicate_state, param_shardings)
