"""Predict CLI: arbitrary-input inference through the evaluator's scorer.

Covers the three input forms (.npy features, frames dir, video file) and
output structure. Scores must match the evaluator's test-time scoring since
predict routes through the same GridScorer/score_video path.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from tests.helpers.synthetic_run import synthetic_cfg


@pytest.mark.slow
def test_predict_features_and_frames(tmp_path):
    from anomalyclip_tpu.predict import main as predict_main
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    cfg = synthetic_cfg(
        tmp_path,
        "data.load_from_features=False",
        "data.input_size=32",
        "data.fast_decode=True",
        "data.synthetic_min_frames=520",
        "data.synthetic_max_frames=560",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=1",
    )
    module = AnomalyCLIPTrainModule(cfg)
    module.fit()
    ckpt = module.save_dir / "checkpoints" / "last"
    froot = cfg["data"]["frames_root"]

    common = [
        "experiment=synthetic",
        "data.load_from_features=False",
        "data.input_size=32",
        "data.synthetic_min_frames=520",
        "data.synthetic_max_frames=560",
        f"data.frames_root={froot}",
        # annotations_root must follow frames_root: with only one of the two
        # overridden, the other falls back to the global default and the
        # synthetic generator (correctly) refuses the split, stampless layout
        f"data.annotations_root={cfg['data']['annotations_root']}",
        f"ckpt_path={ckpt}",
        f"paths.output_dir={tmp_path / 'pred_out'}",
    ]

    # 1) pre-extracted features (.npy)
    out1 = tmp_path / "pred_npy.json"
    res = predict_main(common + [f"input={froot}/abnormal_000.npy", f"output={out1}"])
    saved = json.loads(out1.read_text())
    assert saved["num_frames"] == res["num_frames"] > 0
    assert len(saved["frame_scores"]) == saved["num_frames"]
    assert len(saved["frame_top_class"]) == saved["num_frames"]
    assert all(0.0 <= s <= 1.0 for s in saved["frame_scores"])
    assert len(saved["classnames_abnormal"]) == cfg["data"]["num_classes"] - 1

    # 2) frames directory (decode + CLIP preprocess path) + mp4 visualization
    out2 = tmp_path / "pred_frames.json"
    res2 = predict_main(
        common + [f"input={froot}/abnormal_000", f"output={out2}", "visualize=True"]
    )
    saved2 = json.loads(out2.read_text())
    assert saved2["class_probs_shape"][0] == saved2["num_frames"]
    assert len(saved2["frame_scores"]) == saved2["num_frames"] > 0
    vids = list((tmp_path / "pred_out" / "visualizations").glob("*.mp4"))
    assert vids, "visualize=True on a frames-dir input must render an mp4"

    # 3) video file (cv2 decode path)
    cv2 = pytest.importorskip("cv2")
    avi = tmp_path / "clip.avi"
    w = cv2.VideoWriter(str(avi), cv2.VideoWriter_fourcc(*"MJPG"), 10, (48, 32))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(24):
        w.write(rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8))
    w.release()
    out3 = tmp_path / "pred_video.json"
    predict_main(common + [f"input={avi}", f"output={out3}"])
    saved3 = json.loads(out3.read_text())
    assert saved3["num_frames"] == 24
    assert len(saved3["frame_scores"]) == 24
