from anomalyclip_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    replicated_sharding,
    shard_train_batch,
    usable_data_devices,
)

__all__ = [
    "batch_sharding",
    "data_mesh",
    "replicated_sharding",
    "shard_train_batch",
    "usable_data_devices",
]
