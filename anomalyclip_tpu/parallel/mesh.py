"""Device mesh + sharding helpers: the TPU-native replacement for DDP.

The reference scales with Lightning DDP over 4 GPUs + NCCL allreduce
(reference: configs/trainer/ddp.yaml:3-8). Here the same data parallelism is a 1-D
``data`` mesh: the batch (its abnormal and normal halves independently, preserving
the abnormal-first order convention) is sharded over the axis, parameters are
replicated, and XLA inserts the gradient/batch-stat collectives over ICI — there is
no hand-written communication. The selector's global-batch BatchNorm statistics come
out synchronized for free (sync_batchnorm: True equivalent), because jnp reductions
over a sharded axis are global.

The model is small (frozen ViT-B/16 + <10M trainable), so *training* scales as
pure DP (SURVEY.md §2.5), and long videos are handled algorithmically by grid
chunking (see eval/evaluator.py). For big-tower serving (ViT-L/14@336 and up),
parallel/tp.py adds Megatron-style tensor parallelism over a 2-D (data, model)
mesh on top of this module's data axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"

_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when coordinator
    env vars are present, so ``jax.devices()`` spans every process's chips and the
    1-D data mesh (and its psum/BN collectives) rides the full slice.

    Triggers on either the explicit JAX env contract
    (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``]) or a
    TPU-pod environment where JAX auto-discovers its coordinates
    (``MEGASCALE_COORDINATOR_ADDRESS``/``TPU_WORKER_HOSTNAMES`` with >1 worker).
    Single-process runs (the common case, and every test) skip initialization
    entirely. Idempotent. This is the comm-backend row of SURVEY.md §2.5 — the
    reference's analogue is Lightning spawning one NCCL rank per GPU
    (configs/trainer/ddp.yaml:3-8).
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    import os

    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    pod_workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    megascale = os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if megascale and len(pod_workers) <= 1:
        # multi-slice runtime without the per-slice worker list: let JAX
        # auto-discover its coordinates
        jax.distributed.initialize()
        _DISTRIBUTED_INITIALIZED = True
        return True
    if coordinator:
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            # multi-process CPU (the test/simulation path) needs gloo collectives
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        kwargs = {"coordinator_address": coordinator}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
    elif len(pod_workers) > 1:
        jax.distributed.initialize()  # TPU pod: coordinates auto-discovered
    else:
        return False
    _DISTRIBUTED_INITIALIZED = True
    return True


def usable_data_devices(half_batch: int, devices: Optional[Sequence] = None) -> list:
    """Largest prefix of devices that evenly divides the per-half batch size.

    Each batch half (abnormal/normal) shards independently, so the constraint is
    ``half_batch % n_devices == 0``.

    Multi-host: the mesh must span EVERY process's devices (all processes
    participate in the SPMD train step, and the per-rank loader contributes
    one batch block per process), so shrinking to a prefix is not available —
    the batch either divides the full slice or the run fails loudly here.
    """
    devices = list(devices if devices is not None else jax.devices())
    if jax.process_count() > 1:
        if half_batch % len(devices) != 0 or half_batch % jax.process_count() != 0:
            raise ValueError(
                f"multi-host run: per-half batch {half_batch} must divide the "
                f"{len(devices)}-device slice ({jax.process_count()} processes); "
                "adjust data.batch_size"
            )
        return devices
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
    """Place a batch pytree into the data-sharded global layout.

    Single process: plain ``device_put`` of the full array (each device takes
    its slice). Multi-host: each process holds only ITS contiguous block of
    the global batch (the per-rank loader contract, data/loader.py
    DualStreamTrainLoader) and contributes it via
    ``jax.make_array_from_process_local_data`` — the DistributedSampler-style
    ingest of the reference's DDP path (configs/trainer/ddp.yaml), with host
    IO scaling 1/P instead of every host decoding the full global batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
