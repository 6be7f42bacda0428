#!/usr/bin/env python
"""Evaluation entry point.

Same invocation contract as the reference (reference: src/eval.py:33-89):

    python eval.py data=ucfcrime model=anomaly_clip_ucfcrime \
        ckpt_path=logs/train/runs/ucfcrime/checkpoints/last

Artifact mode — validate an exported serving artifact (export.py) against a
labeled benchmark with no model code or checkpoint (the pre-ship check that
the artifact you deploy reproduces the eval numbers):

    python eval.py artifact=<dir> data=ucfcrime
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    # full shared pre-pass (cpu forcing AND dp_sim fan-out — e.g. CPU-simulating
    # trainer.model_parallel needs the virtual device count here too)
    from anomalyclip_tpu.train_entry import _apply_platform_overrides

    _apply_platform_overrides(argv, reexec_module="anomalyclip_tpu.eval_entry")

    # multi-host bring-up before any backend-initializing jax call
    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parents[1]))

    from anomalyclip_tpu.config import compose, default_config_dir

    cfg = compose(default_config_dir(), "eval", argv)

    if cfg.get("artifact"):
        if not cfg.get("data"):
            raise SystemExit("artifact eval needs a data group: eval.py artifact=<dir> data=...")
        from anomalyclip_tpu.utils.extras import apply_extras

        apply_extras(cfg)
        return _eval_artifact(cfg)

    if not cfg.get("data") or not cfg.get("model"):
        raise SystemExit(
            "No data/model configured. Run with explicit groups, e.g.\n"
            "  python eval.py data=ucfcrime model=anomaly_clip_ucfcrime ckpt_path=..."
        )

    from anomalyclip_tpu.utils.extras import apply_extras

    apply_extras(cfg)

    ckpt_path = cfg.get("ckpt_path")
    if not ckpt_path or ckpt_path == "???":
        raise SystemExit("eval.py requires ckpt_path=...")

    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    module = AnomalyCLIPTrainModule(cfg)
    return module.test(ckpt_path=ckpt_path)


def _eval_artifact(cfg) -> dict:
    """Full benchmark eval through the exported graphs alone: iterate the test
    loader, score each pre-sampled item via the artifact, write the same
    test artifacts block as module.test (metrics.json + PR/ROC/F1 plots)."""
    import numpy as np

    from anomalyclip_tpu.data.datamodule import AnomalyCLIPDataModule, DataConfig
    from anomalyclip_tpu.eval.artifacts import write_test_artifacts
    from anomalyclip_tpu.eval.evaluator import VideoScores, evaluate_videos
    from anomalyclip_tpu.export import ServingArtifact
    from anomalyclip_tpu.models.anomaly_clip import read_classnames
    from anomalyclip_tpu.utils.logging import is_host_zero

    art = ServingArtifact.load(cfg["artifact"])
    datamodule = AnomalyCLIPDataModule(
        DataConfig.from_dict(dict(cfg["data"])), seed=int(cfg.get("seed") or 0)
    )
    g = art.meta["grid"]
    dm_cfg = datamodule.cfg
    # all three sampling knobs must agree or scores silently misalign in time
    # (stride expands per-chunk scores back to frame rate)
    wanted = (g["num_segments"], g["seg_length"], g["stride"])
    got = (dm_cfg.num_segments, dm_cfg.seg_length, dm_cfg.stride)
    if got != wanted:
        raise SystemExit(
            f"data group samples (num_segments, seg_length, stride)={got} but "
            f"the artifact was exported for {wanted}"
        )

    def score_item(item) -> VideoScores:
        sim, sc, probs = art.score_test_item(item)
        return VideoScores(
            sim, sc, probs, np.asarray(item.frame_labels), item.video_label,
            item.path, getattr(item, "start_frame", 0),
        )

    # honor trainer.limit_test_batches like the checkpoint-backed path
    # (module.test) — shared semantics: int = count, float <= 1.0 = fraction
    from anomalyclip_tpu.data.loader import limit_count

    limit = (cfg.get("trainer") or {}).get("limit_test_batches")
    loader = datamodule.test_dataloader()
    if limit is not None:
        loader = datamodule.test_dataloader(limit=limit_count(len(loader), limit))

    outputs = evaluate_videos(loader, score_item=score_item)
    if not outputs:
        raise SystemExit("artifact eval scored no test videos (empty test set?)")

    save_dir = Path(cfg.get("paths", {}).get("output_dir") or ".") / "artifact_eval"
    classnames = art.meta.get("classnames") or read_classnames(dm_cfg.labels_file)
    metrics = {}
    if is_host_zero():
        metrics = write_test_artifacts(
            save_dir,
            outputs["abnormal_scores"],
            outputs["labels"],
            outputs["class_probs"],
            int(art.meta["normal_id"]),
            len(classnames),
            classnames,
        )
        print(
            f"artifact eval: AUC={metrics['auc_roc']:.4f} AP={metrics['auc_pr']:.4f} "
            f"mAUC={metrics['mean_mc_auroc']:.4f} mAP={metrics['mean_mc_aupr']:.4f} "
            f"-> {save_dir}"
        )
    return metrics


def cli() -> int:
    """Console-script entry: main() returns a metrics dict, which setuptools
    wrappers pass to sys.exit() — translate to a clean exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
