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
  - each rank touches only its share of the IO (asserted via dataset read and
    JPEG decode counters inside the workers).

Two variants: the features path (data/synthetic.yaml's default,
load_from_features=True) and the raw-frames path (load_from_features=False —
reference src/data/components/video_dataset.py:109-358 under
configs/trainer/ddp.yaml's DistributedSampler semantics), where per-rank cv2
decode, uint8 frame blocks through make_array_from_process_local_data, and
the multi-host ncentroid pass over raw frames are all exercised for real.

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
# EXTRA_OVERRIDES (JSON list) selects the variant (features vs raw frames).
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
    from anomalyclip_tpu.data import sources as src_mod
    reads = {"train_items": 0, "frame_decodes": 0, "train_dtypes": set()}
    _orig = ds_mod.VideoDataset.train_item
    def counted(self, idx, rng):
        reads["train_items"] += 1
        feats, label = _orig(self, idx, rng)
        reads["train_dtypes"].add(str(feats.dtype))
        return feats, label
    ds_mod.VideoDataset.train_item = counted

    # count JPEG decodes (the raw-frames variant's actual host IO): both the
    # PIL and the cv2 fast path go through _load_one / _load_raw
    _orig_one = src_mod.FrameSource._load_one
    _orig_raw = src_mod.FrameSource._load_raw
    def counted_one(self, record, file_idx):
        reads["frame_decodes"] += 1
        return _orig_one(self, record, file_idx)
    def counted_raw(self, record, file_idx):
        reads["frame_decodes"] += 1
        return _orig_raw(self, record, file_idx)
    src_mod.FrameSource._load_one = counted_one
    src_mod.FrameSource._load_raw = counted_raw

    from tests.helpers.synthetic_run import synthetic_cfg
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    from pathlib import Path
    run_dir = Path(os.environ["RUN_DIR"])
    extra = json.loads(os.environ.get("EXTRA_OVERRIDES", "[]"))
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
        *extra,
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
        "frame_decodes": reads["frame_decodes"],
        "train_dtypes": sorted(reads["train_dtypes"]),
        "ckpts": sorted(p.name for p in module.ckpt.ckpt_dir.glob("epoch_*")),
    }
    print("RESULT " + json.dumps(result), flush=True)
    """
)

# the raw-frames variant: tiny-CLIP input resolution, cv2 decode, short videos
_FRAMES_OVERRIDES = [
    "data.load_from_features=False",
    "data.input_size=32",  # CLIPConfig.tiny image resolution
    "data.fast_decode=True",
    "data.synthetic_min_frames=520",
    "data.synthetic_max_frames=560",
    "trainer.max_epochs=1",  # frames fit is ~CLIP-encode-bound on CPU
]


def _worker_env(tmp_path, corpus_dir, extra: list) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        REPO_ROOT=REPO_ROOT,
        JAX_PLATFORMS="cpu",
        RUN_DIR="",  # set by callers
        CORPUS_DIR=str(corpus_dir),
        EXTRA_OVERRIDES=json.dumps(extra),
    )
    return env


def _run_single(tmp_path, corpus_dir, extra: list, timeout: int) -> dict:
    env = _worker_env(tmp_path, corpus_dir, extra)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        RUN_DIR=str(tmp_path / "single_run"),
    )
    r = subprocess.run(
        [sys.executable, "-c", _FIT_WORKER],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"single-process run failed:\n{r.stderr[-3000:]}"
    return json.loads(r.stdout.rsplit("RESULT ", 1)[1])


def _run_two_processes(tmp_path, corpus_dir, extra: list, timeout: int) -> list:
    port = _free_port()
    procs = []
    for pid in range(2):
        env = _worker_env(tmp_path, corpus_dir, extra)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            RUN_DIR=str(tmp_path / "multi_run"),  # shared run dir (= shared FS)
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _FIT_WORKER],
                env=env, cwd=REPO_ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    try:
        outs = [p.communicate(timeout=timeout) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{err[-3000:]}\n{out[-1000:]}"
        results.append(json.loads(out.rsplit("RESULT ", 1)[1]))
    return results


def _assert_match(single: dict, multi: list, expected_ckpts: list) -> None:
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

    # every epoch checkpointed (host zero wrote; both see the shared dir)
    assert single["ckpts"] == multi[0]["ckpts"] == expected_ckpts

    # per-rank ingest scales: each rank loaded only its block of every batch
    # (train reads cover fit's train loader; the ncentroid/eval passes use
    # test-mode items which do not go through train_item)
    total_multi = multi[0]["train_item_reads"] + multi[1]["train_item_reads"]
    assert total_multi == single["train_item_reads"], (total_multi, single)
    assert multi[0]["train_item_reads"] == multi[1]["train_item_reads"]
    assert multi[0]["train_item_reads"] == single["train_item_reads"] // 2


@pytest.mark.slow
def test_production_fit_two_processes_matches_single(tmp_path):
    corpus_dir = tmp_path / "corpus"  # shared synthetic corpus (lock-guarded gen)

    single = _run_single(tmp_path, corpus_dir, [], timeout=600)
    multi = _run_two_processes(tmp_path, corpus_dir, [], timeout=600)

    _assert_match(single, multi, ["epoch_000", "epoch_001"])
    assert single["frame_decodes"] == 0  # features path decodes nothing


@pytest.mark.slow
def test_production_fit_two_processes_from_frames(tmp_path):
    """The raw-frames path across 2 real processes: per-rank JPEG decode
    (counted), uint8 frame blocks assembled via
    make_array_from_process_local_data, the multi-host ncentroid pass
    encoding raw frames, and stride-sharded eval — metrics equal to the
    single-process run of the same corpus/seed."""
    corpus_dir = tmp_path / "corpus_frames"

    single = _run_single(tmp_path, corpus_dir, _FRAMES_OVERRIDES, timeout=1200)
    multi = _run_two_processes(
        tmp_path, corpus_dir, _FRAMES_OVERRIDES, timeout=1200
    )

    _assert_match(single, multi, ["epoch_000"])

    # the train loader ships frames as uint8 (the ingest contract): the
    # device normalizes in-graph, the host ships 1/4 the bytes
    assert single["train_dtypes"] == ["uint8"]
    for r in multi:
        assert r["train_dtypes"] == ["uint8"]

    # host JPEG decode actually scales with ranks: the two processes together
    # decode exactly what the single process decoded (train halves split
    # evenly; ncentroid + eval videos stride-shard), and neither rank does
    # anywhere near the full single-process work
    assert single["frame_decodes"] > 0
    total = multi[0]["frame_decodes"] + multi[1]["frame_decodes"]
    assert total == single["frame_decodes"], (total, single["frame_decodes"])
    for r in multi:
        assert r["frame_decodes"] <= 0.65 * single["frame_decodes"], (
            r["frame_decodes"], single["frame_decodes"],
        )
