"""Device mesh + sharding helpers: the TPU-native replacement for DDP.

The reference scales with Lightning DDP over 4 GPUs + NCCL allreduce
(reference: configs/trainer/ddp.yaml:3-8). Here the same data parallelism is a 1-D
``data`` mesh: the batch (its abnormal and normal halves independently, preserving
the abnormal-first order convention) is sharded over the axis, parameters are
replicated, and XLA inserts the gradient/batch-stat collectives over ICI — there is
no hand-written communication. The selector's global-batch BatchNorm statistics come
out synchronized for free (sync_batchnorm: True equivalent), because jnp reductions
over a sharded axis are global.

The model is small (frozen ViT-B/16 + <10M trainable), so tensor/pipeline/sequence
parallelism buys nothing (SURVEY.md §2.5); scaling is pure DP, and long videos are
handled algorithmically by grid chunking (see eval/evaluator.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def usable_data_devices(half_batch: int, devices: Optional[Sequence] = None) -> list:
    """Largest prefix of devices that evenly divides the per-half batch size.

    Each batch half (abnormal/normal) shards independently, so the constraint is
    ``half_batch % n_devices == 0``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and half_batch % n != 0:
        n -= 1
    return devices[:n]


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_train_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with its leading axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
