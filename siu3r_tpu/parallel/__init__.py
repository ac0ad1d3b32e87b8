from siu3r_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicate,
    replicated,
    shard_batch,
)
