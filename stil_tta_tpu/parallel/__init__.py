from stil_tta_tpu.parallel.mesh import (
    create_mesh,
    create_hybrid_mesh,
    hierarchical_batch_sharding,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
