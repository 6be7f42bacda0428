"""Production fit()/test() across REAL processes with per-rank data sharding.

test_multihost.py proves bring-up + a hand-built train step across 2 processes;
this module drives the PRODUCTION path end-to-end the way a pod would run it
(the reference's analogue: Lightning ddp_spawn CPU-sim through the real
Trainer.fit, reference tests/test_train.py:51-60 — which Lightning backs with a
DistributedSampler so each rank loads only its share):

  - AnomalyCLIPTrainModule.fit() on 2 processes x 2 virtual CPU devices each
    (4-device global data mesh): per-rank loader blocks ->
    make_array_from_process_local_data assembly -> jitted SPMD train step ->
    multi-host-sharded validation (stride-sharded videos, allgathered outputs)
    -> Orbax save under is_host_zero -> module.test() on the saved checkpoint;
  - loss and validation/test metrics must match the single-process run of the
    SAME corpus/seed on a 4-virtual-device mesh (the per-rank blocks assemble
    to the bit-identical global batch; collectives are process-boundary
    invariant up to reduction rounding);
  - each rank touches only its half of the train items (per-rank IO actually
    scales — asserted via a dataset read counter inside the workers).

The pure data-side contract (rank blocks concatenate to the single-process
batch, bit-exact) is pinned without processes in test_data.py.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# Runs fit + test in one process; prints one JSON result line. Used for both
# the 2-process workers (distributed env set) and the single-process oracle.
_FIT_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.path.insert(0, os.environ["REPO_ROOT"])

    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()

    import jax
    import numpy as np

    # count per-rank train-item reads: per-rank ingest must scale ~1/P
    from anomalyclip_tpu.data import dataset as ds_mod
    reads = {"train_items": 0}
    _orig = ds_mod.VideoDataset.train_item
    def counted(self, idx, rng):
        reads["train_items"] += 1
        return _orig(self, idx, rng)
    ds_mod.VideoDataset.train_item = counted

    from tests.helpers.synthetic_run import synthetic_cfg
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    from pathlib import Path
    run_dir = Path(os.environ["RUN_DIR"])
    cfg = synthetic_cfg(
        Path(os.environ["CORPUS_DIR"]),
        f"paths.output_dir={run_dir}",
        f"model.save_dir={run_dir}",
        "trainer.max_epochs=2",
        "data.batch_size=8",
        "data.num_workers=2",
        "model.net.select_idx_dropout_topk=0.0",
        "model.net.select_idx_dropout_bottomk=0.0",
        "logger=csv",
    )
    module = AnomalyCLIPTrainModule(cfg)
    val = module.fit()

    last = module.ckpt.ckpt_dir / "last"
    assert last.is_dir() or last.is_symlink(), f"no last checkpoint at {last}"
    test_metrics = module.test(ckpt_path=str(last))

    # loss history from the csv logger (host-zero writes it)
    result = {
        "process_index": jax.process_index(),
        "val": {k: val[k] for k in ("auc_roc", "auc_pr") if k in val},
        "test": {
            k: test_metrics[k]
            for k in ("auc_roc", "auc_pr", "mean_mc_auroc", "mean_mc_aupr")
            if k in test_metrics
        },
        "train_item_reads": reads["train_items"],
        "ckpts": sorted(p.name for p in module.ckpt.ckpt_dir.glob("epoch_*")),
    }
    print("RESULT " + json.dumps(result), flush=True)
    """
)


def _run_single(tmp_path, corpus_dir) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        REPO_ROOT=REPO_ROOT,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        RUN_DIR=str(tmp_path / "single_run"),
        CORPUS_DIR=str(corpus_dir),
    )
    r = subprocess.run(
        [sys.executable, "-c", _FIT_WORKER],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"single-process run failed:\n{r.stderr[-3000:]}"
    return json.loads(r.stdout.rsplit("RESULT ", 1)[1])


def _run_two_processes(tmp_path, corpus_dir) -> list:
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            REPO_ROOT=REPO_ROOT,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            RUN_DIR=str(tmp_path / "multi_run"),  # shared run dir (= shared FS)
            CORPUS_DIR=str(corpus_dir),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _FIT_WORKER],
                env=env, cwd=REPO_ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    try:
        outs = [p.communicate(timeout=600) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{err[-3000:]}\n{out[-1000:]}"
        results.append(json.loads(out.rsplit("RESULT ", 1)[1]))
    return results


@pytest.mark.slow
def test_production_fit_two_processes_matches_single(tmp_path):
    corpus_dir = tmp_path / "corpus"  # shared synthetic corpus (lock-guarded gen)

    single = _run_single(tmp_path, corpus_dir)
    multi = _run_two_processes(tmp_path, corpus_dir)

    # validation + test metrics identical across ranks and vs single-process
    # (per-rank blocks assemble the bit-identical global batch; eval outputs
    # are allgathered to global order; ncentroid reduction is fp64)
    for r in multi:
        for section in ("val", "test"):
            for k, v in single[section].items():
                assert r[section][k] == pytest.approx(v, abs=1e-5), (
                    section, k, r[section], single[section],
                )
    assert multi[0]["test"] == multi[1]["test"]

    # both epochs checkpointed (host zero wrote; both see the shared dir)
    assert single["ckpts"] == multi[0]["ckpts"] == ["epoch_000", "epoch_001"]

    # per-rank ingest scales: each rank loaded only its block of every batch
    # (train reads cover fit's train loader; the ncentroid/eval passes use
    # test-mode items which do not go through train_item)
    total_multi = multi[0]["train_item_reads"] + multi[1]["train_item_reads"]
    assert total_multi == single["train_item_reads"], (total_multi, single)
    assert multi[0]["train_item_reads"] == multi[1]["train_item_reads"]
    assert multi[0]["train_item_reads"] == single["train_item_reads"] // 2
