from viettts_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    mesh_for_batch,
    shard_batch,
    shard_params_fsdp,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "batch_sharding",
    "replicated_sharding",
    "mesh_for_batch",
    "shard_batch",
    "replicate",
    "shard_params_fsdp",
]
