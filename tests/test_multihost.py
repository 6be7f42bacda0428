"""Multi-host initialization: 2-process CPU smoke test.

The TPU-world analogue of the reference's multi-node comm backend (Lightning DDP +
NCCL, reference: configs/trainer/ddp.yaml): ``maybe_initialize_distributed`` brings
up ``jax.distributed`` from coordinator env vars so the data mesh spans every
process's devices. Here two CPU processes (gloo collectives) each contribute one
device and a global reduction over the 2-device mesh must see both shards.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.path.insert(0, os.environ["REPO_ROOT"])
    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed, data_mesh, DATA_AXIS
    assert maybe_initialize_distributed(), "env vars set but initialize skipped"
    import jax, jax.numpy as jnp, numpy as np
    from jax.sharding import NamedSharding, PartitionSpec
    assert jax.device_count() == 2, jax.device_count()
    mesh = data_mesh()
    pid = jax.process_index()
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec(DATA_AXIS)),
        np.ones((1,), np.float32) * (pid + 1),
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, PartitionSpec())
    )(x)
    assert float(total) == 3.0, float(total)
    print(f"proc {pid}: ok total=3.0")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_distributed(tmp_path):
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")
    }
    env_base.update(
        {
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "REPO_ROOT": str(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        }
    )
    procs = []
    try:
        for pid in range(2):
            env = dict(env_base, JAX_PROCESS_ID=str(pid))
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", _WORKER],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        outs = [p.communicate(timeout=180)[0] for p in procs]
    finally:
        # a worker stuck waiting for its dead peer must not outlive the test
        # (it would hold the coordinator port and hang later runs)
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok" in out, out


def test_single_process_skips_initialize(monkeypatch):
    """Without coordinator env vars the helper is a no-op (the common case)."""
    import anomalyclip_tpu.parallel.mesh as mesh_mod

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
    assert mesh_mod.maybe_initialize_distributed() is False
