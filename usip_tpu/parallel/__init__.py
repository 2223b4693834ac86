from usip_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    jit_train_step,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "jit_train_step",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
