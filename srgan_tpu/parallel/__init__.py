from srgan_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, jit_data_parallel,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "jit_data_parallel", "shard_batch"]
