"""Visualizer: render a synthetic video's scores to an mp4 (reference:
src/utils/visualizer.py:12-256, hooked at anomaly_clip_module.py:447-456)."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from anomalyclip_tpu.eval.evaluator import VideoScores
from anomalyclip_tpu.eval.visualizer import Visualizer

LABELS = Path(__file__).resolve().parents[1] / "anomalyclip_tpu/labels/synthetic_labels.csv"


def _fake_scores(t: int, n_abn: int, path: str) -> VideoScores:
    rng = np.random.default_rng(0)
    sim = rng.standard_normal((t, n_abn)).astype(np.float32)
    sc = rng.uniform(size=t).astype(np.float32)
    e = np.exp(sim - sim.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True) * sc[:, None]
    labels = np.zeros(t, dtype=np.int64)
    labels[t // 2 :] = 1  # anomalous second half -> exercises the GT shading
    return VideoScores(
        similarity=sim, scores=sc, class_probs=probs,
        frame_labels=labels, video_label=1, path=path,
    )


def test_process_video_without_frames_skips(tmp_path):
    """Features-only run: no JPEG dir -> skipped with a warning, no mp4 rendered."""
    viz = Visualizer(
        normal_id=3, labels_file=str(LABELS), save_dir=tmp_path, frame_step=16
    )
    vs = _fake_scores(t=48, n_abn=5, path=str(tmp_path / "video01.npy"))
    viz.process_video(vs)
    assert not (tmp_path / "visualizations" / "video01.mp4").exists()


def test_process_video_with_frames(tmp_path):
    """Frames present: the real JPEGs are loaded into the frame panel (0-based file
    ids, reference visualizer.py:206) and an mp4 is written."""
    frames_dir = tmp_path / "video02"
    frames_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(32):
        img = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    viz = Visualizer(
        normal_id=3, labels_file=str(LABELS), save_dir=tmp_path, frame_step=8
    )
    vs = _fake_scores(t=32, n_abn=5, path=str(frames_dir))
    viz.process_video(vs)
    out = tmp_path / "visualizations" / "video02.mp4"
    assert out.is_file() and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4  # ceil(32/8)
    cap.release()


def test_default_frame_step_renders_every_frame(tmp_path):
    """Reference parity: the default Visualizer renders one mp4 frame per score
    (reference src/utils/visualizer.py:222-256 renders every frame; frame_step
    is our opt-in speed knob, default 1)."""
    frames_dir = tmp_path / "video03"
    frames_dir.mkdir()
    rng = np.random.default_rng(2)
    t = 12
    for i in range(t):
        img = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    viz = Visualizer(normal_id=3, labels_file=str(LABELS), save_dir=tmp_path)
    assert viz.frame_step == 1
    vs = _fake_scores(t=t, n_abn=5, path=str(frames_dir))
    viz.process_video(vs)
    cap = cv2.VideoCapture(str(tmp_path / "visualizations" / "video03.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == len(vs.scores)
    cap.release()


def test_frame_lookup_honors_start_frame(tmp_path, monkeypatch):
    """Real datasets number frame files from record.start_frame (commonly 1;
    sources.py:189): the panel for score index i must load file i+start_frame,
    not i — otherwise frame 0 is a missing-file placeholder and every panel
    lags its score by start_frame frames."""
    frames_dir = tmp_path / "video04"
    frames_dir.mkdir()
    rng = np.random.default_rng(3)
    t = 8
    for i in range(1, t + 1):  # 1-based corpus
        img = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    seen = []
    real_imread = cv2.imread
    monkeypatch.setattr(
        cv2, "imread", lambda p, *a: (seen.append(p), real_imread(p, *a))[1]
    )

    viz = Visualizer(normal_id=3, labels_file=str(LABELS), save_dir=tmp_path)
    import dataclasses

    vs = dataclasses.replace(
        _fake_scores(t=t, n_abn=5, path=str(frames_dir)), start_frame=1
    )
    viz.process_video(vs)
    names = [p.split("/")[-1] for p in seen]
    assert names[0] == "000001.jpg" and names[-1] == f"{t:06d}.jpg"
    assert len(names) == t  # every panel found its file — no placeholders
