from multitalent_tpu.parallel.mesh import (  # noqa: F401
    get_data_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
    distribute_batch_size,
)
