from srgan_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, jit_data_parallel,
    shard_batch,
)
from srgan_tpu.parallel.tp import (
    make_mesh_2d, jit_data_model_parallel, state_shardings, place_state,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "jit_data_parallel", "shard_batch",
           "make_mesh_2d", "jit_data_model_parallel", "state_shardings",
           "place_state"]
