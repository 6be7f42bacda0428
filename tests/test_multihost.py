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


_TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.path.insert(0, os.environ["REPO_ROOT"])
    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed, data_mesh
    assert maybe_initialize_distributed()
    import jax, jax.numpy as jnp, numpy as np, optax
    from jax.sharding import NamedSharding, PartitionSpec
    import __graft_entry__ as g
    from anomalyclip_tpu.data.loader import TrainBatch
    from anomalyclip_tpu.models.losses import LossConfig, compute_loss
    from anomalyclip_tpu.train.module import TrainState
    from anomalyclip_tpu.train.optim import build_optimizer

    assert jax.device_count() == 2
    mesh = data_mesh()
    batch_sh = NamedSharding(mesh, PartitionSpec("data"))
    repl = NamedSharding(mesh, PartitionSpec())
    pid = jax.process_index()

    model, frozen, trainable, bn_state = g._build_tiny()
    n, l, d = 8, 4, model.embedding_dim
    half = 2  # one video per device per half, global

    tx = build_optimizer(
        {"lr": 1e-4}, {"weight_decay": 0.2}, {"warmup_epochs": 1, "total_epoch": 2}, 1
    )
    loss_cfg = LossConfig(normal_id=2, num_topk=2, frames_per_segment=l, num_segments=n)
    state = TrainState(
        trainable=trainable, opt_state=tx.init(trainable),
        bn_state=bn_state, step=jnp.zeros((), jnp.int32),
    )

    def train_step(frozen_, state_, batch, ncentroid, key):
        feats = jnp.concatenate([batch.abnormal_features, batch.normal_features], 0)
        labels = jnp.concatenate([batch.abnormal_labels, batch.normal_labels], 0)
        def loss_fn(tr):
            out, new_bn = model.forward_train(
                frozen_, tr, state_.bn_state, feats, labels, ncentroid, key
            )
            terms = compute_loss(
                out.logits, out.logits_topk, labels, out.scores,
                out.idx_topk_abn, out.idx_topk_nor, out.idx_bottomk_abn, loss_cfg,
            )
            return terms.total, new_bn
        (loss, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(state_.trainable)
        return loss

    # the same global batch dryrun_multichip(2) builds (seeded rng(0)); each
    # process contributes its local row of the data-sharded arrays
    rng = np.random.default_rng(0)
    a_feats = rng.standard_normal((half, n * l, d)).astype(np.float32)
    a_labels = np.resize(np.array([0, 1, 3], np.int32), half)
    n_feats = rng.standard_normal((half, n * l, d)).astype(np.float32)
    n_labels = np.full(half, 2, np.int32)
    shard = lambda x: jax.make_array_from_process_local_data(batch_sh, x[pid : pid + 1])
    batch = TrainBatch(
        abnormal_features=shard(a_feats), abnormal_labels=shard(a_labels),
        normal_features=shard(n_feats), normal_labels=shard(n_labels),
    )
    put_repl = lambda x: jax.device_put(jnp.asarray(x), repl)
    frozen_r = jax.tree_util.tree_map(put_repl, frozen)
    state_r = jax.tree_util.tree_map(put_repl, state)
    ncentroid = put_repl(rng.standard_normal(d).astype(np.float32))
    key = put_repl(jax.random.PRNGKey(0))

    loss = float(jax.jit(train_step)(frozen_r, state_r, batch, ncentroid, key))
    print(f"proc {pid}: loss={loss:.6f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    """The full sharded train step across 2 real processes (gloo) produces the
    same loss as dryrun_multichip's single-process 2-virtual-device run — the
    gradient psum and sync-BN reductions are process-boundary-invariant."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # single-process oracle: 2 virtual devices, same seeded batch
    env1 = dict(os.environ)
    env1.pop("PALLAS_AXON_POOL_IPS", None)
    env1["JAX_PLATFORMS"] = "cpu"
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        env=env1, cwd=repo_root, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # dryrun output: "... ok, loss=<x>, tp(...) encode parity ok"
    single_loss = float(r.stdout.rsplit("loss=", 1)[1].split(",")[0])

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            REPO_ROOT=repo_root,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _TRAIN_WORKER],
                env=env, cwd=repo_root,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    try:
        outs = [p.communicate(timeout=420) for p in procs]
    finally:
        # a crashed peer leaves the other blocked in the coordinator barrier;
        # an orphan would hold the port and hang later runs
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    losses = [
        float(out.strip().rsplit("loss=", 1)[1])
        for out, _ in outs
    ]
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    # dryrun prints loss with 4 decimals; compare at that precision
    assert losses[0] == pytest.approx(single_loss, abs=6e-5), (losses, single_loss)


_GATHER_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.path.insert(0, os.environ["REPO_ROOT"])
    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed
    assert maybe_initialize_distributed()
    import jax
    import numpy as np
    from anomalyclip_tpu.eval.evaluator import _gather_process_outputs

    pid = jax.process_index()

    # deliberately skewed global corpus: one host owns a single short video,
    # the other owns several long ones (the XD-Violence shape). Lengths are
    # NOT multiples of the 64-frame gather chunk, so round tails are padded.
    lengths = [37, 411, 96, 250, 133]
    C = 3
    def video(i):
        rng = np.random.default_rng(1000 + i)
        t = lengths[i]
        return (
            rng.random(t, dtype=np.float32),
            rng.integers(0, 5, size=t).astype(np.float32),
            rng.random((t, C), dtype=np.float32),
        )

    mine = list(range(pid, len(lengths), 2))  # stride shard (loader contract)
    per_video = [video(i) for i in mine]
    got = _gather_process_outputs(per_video, mine, stopped=False)

    allv = [video(i) for i in range(len(lengths))]
    want_scores = np.concatenate([v[0] for v in allv])
    want_labels = np.concatenate([v[1] for v in allv]).astype(np.int64)
    want_probs = np.concatenate([v[2] for v in allv])
    np.testing.assert_array_equal(got["abnormal_scores"], want_scores)
    np.testing.assert_array_equal(got["labels"], want_labels)
    np.testing.assert_array_equal(got["class_probs"], want_probs)

    # the preempted path must also clear the chunked protocol symmetrically
    got_stop = _gather_process_outputs(per_video, mine, stopped=(pid == 1))
    assert got_stop == {}
    print(f"proc {pid}: gather ok ({sum(lengths)} frames)", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_skewed_shard_gather(tmp_path):
    """The chunked eval gather across 2 real processes with deliberately skewed
    shard sizes: outputs are bit-identical to the global concatenation on BOTH
    hosts, while every collective round carries a fixed small payload per host
    (ANOMALYCLIP_GATHER_CHUNK) — peak gather memory is independent of the
    longest shard. The two hosts are deliberately given DIFFERENT chunk env
    values (64 vs 96): the protocol must agree on the global minimum instead
    of desyncing the collective round count into a hang."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("XLA_FLAGS", None)
        env.update(
            REPO_ROOT=repo_root,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            # force many rounds + padded tails; hosts disagree on purpose —
            # the gather must settle on min(64, 96) rather than hang
            ANOMALYCLIP_GATHER_CHUNK=str(64 + 32 * pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _GATHER_WORKER],
                env=env, cwd=repo_root,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    try:
        outs = [p.communicate(timeout=300) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{err[-2000:]}"
        assert f"proc {pid}: gather ok" in out, out
