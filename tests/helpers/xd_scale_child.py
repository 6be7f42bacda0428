"""Subprocess driver for the XD-Violence-scale stress test (tests/test_xd_scale.py).

Runs in its own process so VmHWM measures THIS workload's peak host memory,
not whatever the parent pytest process touched before. Scores one hour-scale
synthetic video through the production predict path (predict.score_input ->
GridScorer buckets -> score_sampled_features), reproduces it as a chunked
computation, computes labeled detection metrics at full length, and prints one
JSON line with {peak_rss_mb, n_bucket_executables, max_abs_chunk_diff, ...}.

Reference regime: XD-Violence test videos reach hour length; the reference
pads+chunks them into segment_size independent 32x16 grids
(/root/reference/src/data/components/feature_dataset.py:252-259).
"""

from __future__ import annotations

import json
import os
import resource
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    tmp_root = Path(sys.argv[1])
    t_frames = int(sys.argv[2])
    mode = sys.argv[3]  # "features" | "frames"
    arch = sys.argv[4]  # "tiny" | "b16"

    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.eval.metrics import detection_metrics
    from anomalyclip_tpu.predict import score_input
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule, TrainState
    from tests.helpers.synthetic_run import synthetic_cfg

    overrides = [
        "data.num_workers=0",
        # the corpus itself is incidental here (we score an in-memory video);
        # keep it tiny so disk/gen time doesn't pollute the measurement
        "data.synthetic_num_normal=2",
        "data.synthetic_num_abnormal=2",
        "data.synthetic_num_test=1",
        "data.synthetic_min_frames=520",
        "data.synthetic_max_frames=600",
    ]
    if arch == "b16":
        # the real XD regime is 512-dim CLIP features; random-init B/16 gives
        # the production embed dim without needing the OpenAI checkpoint
        overrides += ["model.net.arch=ViT-B/16", "model.net.clip_init=random-full"]
    if mode == "frames":
        overrides += ["data.load_from_features=False"]
    cfg = synthetic_cfg(tmp_root, *overrides)

    module = AnomalyCLIPTrainModule(cfg)
    trainable, bn_state = module.model.init_trainable(
        jax.random.PRNGKey(0), module.frozen
    )
    state = TrainState(
        trainable=trainable, opt_state=None, bn_state=bn_state,
        step=jnp.zeros((), jnp.int32),
    )
    d = int(module.model.clip_cfg.embed_dim)
    module.ncentroid = np.random.default_rng(1).standard_normal(d).astype(np.float32)

    rng = np.random.default_rng(0)
    if mode == "features":
        raw = rng.standard_normal((1, t_frames, d)).astype(np.float32)
    else:
        side = int(module.model.clip_cfg.image_resolution)
        raw = rng.integers(0, 256, (1, t_frames, side, side, 3), dtype=np.uint8)

    # --- full-video pass through the production predict path ----------------
    vs, result = score_input(module, state, raw, str(tmp_root / "stress_video"))
    assert len(vs.scores) == t_frames, (len(vs.scores), t_frames)

    # --- labeled eval at full length ----------------------------------------
    normal_id = int(module.net_cfg.normal_id)
    num_classes = int(cfg.data.num_classes)
    abn = [c for c in range(num_classes) if c != normal_id][0]
    labels = np.where(rng.uniform(size=t_frames) < 0.3, abn, normal_id).astype(np.int64)
    det = detection_metrics(vs.scores, labels, vs.class_probs, normal_id, num_classes)

    # --- chunked-reference computation ---------------------------------------
    # grids are independent by construction (reference feature_dataset.py:252-259
    # + temporal_model.py:46-53) but INTERLEAVED over the video (grid s collects
    # frame-block s of every one of the n segments), so the correct chunk axis
    # is the grid BATCH, not contiguous frames: re-run the identical sampling +
    # layout with score_grids applied in small grid chunks and demand the same
    # per-frame outputs as the full-batch bucketed pass above.
    from anomalyclip_tpu.data.sampling import gather_frame_indices, test_start_indices
    from anomalyclip_tpu.eval.evaluator import score_sampled_features

    samp = module.datamodule.cfg
    grid_frames = samp.num_segments * samp.seg_length * samp.stride
    assert t_frames % grid_frames == 0, "pick t_frames grid-aligned for exactness"
    starts, segment_size = test_start_indices(
        t_frames, samp.num_segments, samp.seg_length, samp.stride
    )
    indices = gather_frame_indices(starts, samp.seg_length, samp.stride, t_frames)
    feats_sampled = raw[:, indices]
    if mode == "frames":
        scorer = module._scorer(state)
        ncrops, t = feats_sampled.shape[:2]
        flat = feats_sampled.reshape((-1,) + feats_sampled.shape[2:])
        feats_sampled = scorer.encode_frames_np(flat).reshape(ncrops, t, -1)

    scorer = module._scorer(state)

    def chunked_score_grids(grids):
        sims, scs = [], []
        for i in range(0, grids.shape[0], 16):
            s_, c_ = scorer.score_grids(grids[i : i + 16])
            sims.append(np.asarray(s_))
            scs.append(np.asarray(c_))
        return np.concatenate(sims), np.concatenate(scs)

    _, chunked_scores, _ = score_sampled_features(
        feats_sampled, segment_size, samp.num_segments, samp.seg_length,
        samp.stride, t_frames, chunked_score_grids,
    )
    max_diff = float(np.abs(chunked_scores - vs.scores).max())

    n_buckets = int(module._scorer(state)._score._cache_size())
    # peak host memory: use VmHWM (the CURRENT mm's high-water mark), NOT
    # ru_maxrss. getrusage's maxrss is carried in the signal struct across
    # exec, so a child spawned from a fat parent (a loaded pytest-xdist
    # worker) inherits the PARENT's peak — measured empirically: a 6GB parent
    # yields ru_maxrss=6294MB in a trivial exec'd child whose VmHWM is 150MB.
    # That made this test report the test session's memory, not this
    # workload's (both xd children reported an identical 8.7GB under
    # `make test-full`). VmHWM is reset with the new mm at exec.
    ru_maxrss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    vm_hwm_mb = -1.0
    try:
        for line in Path("/proc/self/status").read_text().splitlines():
            if line.startswith("VmHWM:"):
                vm_hwm_mb = int(line.split()[1]) / 1024.0
    except OSError:
        pass
    peak_rss_mb = vm_hwm_mb if vm_hwm_mb > 0 else ru_maxrss_mb

    print(json.dumps({
        "mode": mode,
        "arch": arch,
        "t_frames": t_frames,
        "embed_dim": d,
        "segment_size": int(t_frames // grid_frames),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "ru_maxrss_mb": round(ru_maxrss_mb, 1),  # incl. pre-exec parent peak
        "ncpu": os.cpu_count(),
        "malloc_arena_max": os.environ.get("MALLOC_ARENA_MAX"),
        "n_bucket_executables": n_buckets,
        "max_abs_chunk_diff": max_diff,
        "auc_roc": det["auc_roc"],
        "video_score_max": result["video_anomaly_score"],
    }))


if __name__ == "__main__":
    main()
