"""Inference on an arbitrary video: per-frame anomaly scores + class predictions.

The reference ships train/eval only; running a trained AnomalyCLIP on a *new*
video required third-party scripts (acknowledged at reference README.md:104-106).
This CLI scores any input through the same jitted grid scorer the evaluator
uses (eval/evaluator.py), so predictions are bit-identical to test-time scores:

    python -m anomalyclip_tpu.predict model=anomaly_clip_ucfcrime data=ucfcrime \
        ckpt_path=<orbax-dir | released.ckpt> input=<video.mp4 | frames_dir | feats.npy> \
        [output=predictions.json] [ncentroid_path=...]

Input forms:
  * a video file       — decoded with OpenCV, CLIP-preprocessed per frame
  * a frames directory — ``{:06d}.jpg`` files (``data.image_tmpl``)
  * a ``.npy`` file    — pre-extracted CLIP features (single- or ``data.ncrops``-crop)

The normality centroid resolves from ``ncentroid_path=``, else ``ncentroid.npy``
next to the checkpoint's run dir, else it is recomputed from the configured
training data (reference: anomaly_clip_module.py:406-445).

Artifact mode — score from an exported serving artifact (export.py) with no
config tree, model construction, or checkpoint; the artifact's graphs + meta
are the whole contract:

    python -m anomalyclip_tpu.predict artifact=<dir> input=<video | frames | .npy> \
        [output=...] [ncrops=1] [image_tmpl={:06d}.jpg] [fast_decode=false]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

VIDEO_EXTS = {".mp4", ".avi", ".mkv", ".mov", ".webm"}


def _decode_video_file(path: Path, input_size: int) -> np.ndarray:
    """Video file -> (T, S, S, 3) uint8, CLIP spatial preprocessing per frame.

    Frames stay uint8 — the encoder normalizes per chunk
    (evaluator.encode_frames_chunked) with bit-identical arithmetic — so a long
    video costs S*S*3 bytes/frame of host RAM, not 4x that in float32."""
    import cv2
    from PIL import Image

    from anomalyclip_tpu.data.sources import spatial_frame

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    # frame-count metadata is an estimate; preallocate when present to avoid a
    # second whole-video copy at stack time, spill to a list if it undercounts
    hint = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    buf = np.empty((hint, input_size, input_size, 3), np.uint8) if hint > 0 else None
    extra = []
    t = 0
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        rgb = Image.fromarray(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        frame = spatial_frame(rgb, input_size)
        if buf is not None and t < len(buf):
            buf[t] = frame
        else:
            extra.append(frame)
        t += 1
    cap.release()
    if t == 0:
        raise ValueError(f"no frames decoded from {path}")
    if buf is None:
        return np.stack(extra)
    if extra:
        return np.concatenate([buf, np.stack(extra)])
    return buf[:t]


def input_start_frame(path: str | Path) -> int:
    """File id of score index 0 for this input: frames-dir corpora are 1-based
    (count_frames walks 1-based ids, the reference's video_dataset.py:203-206
    convention; _load_input builds its VideoRecord from this). Non-dir inputs
    (.npy, video files) have no frame files. ONE definition — _load_input's
    gather and score_input's visualizer offset must agree or every rendered
    panel lags its score."""
    return 1 if Path(path).is_dir() else 0


def _load_input(path: Path, data_cfg, input_size: int) -> np.ndarray:
    """-> (ncrops, T, ...) features or preprocessed frames, evaluator layout.

    ``input_size`` is the model's CLIP image resolution (not ``data.input_size``;
    they agree in every real config, but the encoder's shape is the contract)."""
    from anomalyclip_tpu.data.records import VideoRecord
    from anomalyclip_tpu.data.sources import FrameSource, count_frames

    if path.suffix == ".npy":
        feats = np.asarray(np.load(path), dtype=np.float32)
        ncrops = int(data_cfg.get("ncrops", 1))
        return feats.reshape(-1, ncrops, feats.shape[-1]).transpose(1, 0, 2)
    if not input_size:
        # artifact mode without an encoder graph: only .npy features scoreable
        raise ValueError(
            f"raw-frame input {path} needs an encoder — export the artifact "
            "with include_encoder=true (feature .npy inputs work without it)"
        )
    if path.is_dir():
        tmpl = data_cfg.get("image_tmpl", "{:06d}.jpg")
        n = count_frames(path, tmpl)
        if n == 0:
            raise FileNotFoundError(f"no {tmpl} frames under {path}")
        src = FrameSource(
            input_size=input_size,
            image_tmpl=tmpl,
            ncrops=int(data_cfg.get("ncrops", 1)),
            fast_decode=bool(data_cfg.get("fast_decode", False)),
        )
        rec = VideoRecord(
            rel_path=path.name, start_frame=input_start_frame(path),
            end_frame=n, label=0, root=str(path.parent),
        )
        # decode on a pool — cv2/PIL release the GIL, so this scales with cores
        # (same fan-out as extract_features.py)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 1)) as pool:
            return src.gather(rec, np.arange(n), pool=pool)
    if path.suffix.lower() in VIDEO_EXTS:
        return _decode_video_file(path, input_size)[None]
    raise ValueError(f"unrecognized input: {path} (video file, frames dir, or .npy)")


def maybe_force_cpu(argv) -> None:
    """Honor trainer=cpu before any jax initialization (shared CLI bootstrap)."""
    if any(a in ("trainer=cpu", "trainer.accelerator=cpu") for a in argv):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")


def load_module_and_state(cfg):
    """Build the train module, restore the checkpoint, resolve the ncentroid —
    the common bootstrap of the predict/serve/export CLIs. -> (module, state)"""
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from anomalyclip_tpu.utils.extras import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(cfg.get("extras"))
    ckpt_path = cfg["ckpt_path"]
    module = AnomalyCLIPTrainModule(cfg)
    state = module.load_state(ckpt_path)
    ncentroid = _resolve_ncentroid(cfg, ckpt_path)
    if ncentroid is not None:
        module.ncentroid = ncentroid
    else:
        module.compute_ncentroid()
    return module, state


def artifact_data_cfg(kv: dict) -> dict:
    """Input-loading options of the config-free artifact mode (shared by the
    predict and serve CLIs)."""
    return {
        "ncrops": int(kv.get("ncrops", 1)),
        "image_tmpl": kv.get("image_tmpl", "{:06d}.jpg"),
        "fast_decode": str(kv.get("fast_decode", "false")).lower() in ("true", "1"),
    }


def artifact_bootstrap(kv: dict):
    """Shared artifact-mode startup of the predict/serve CLIs: enable the
    persistent compile cache (disable with compile_cache=false) and load the
    artifact. -> (ServingArtifact, data_cfg)"""
    from anomalyclip_tpu.export import ServingArtifact
    from anomalyclip_tpu.utils.extras import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        {
            "compilation_cache": str(kv.get("compile_cache", "true")).lower()
            not in ("false", "0"),
            "compilation_cache_dir": kv.get("compile_cache_dir"),
        }
    )
    return ServingArtifact.load(kv["artifact"]), artifact_data_cfg(kv)


def _resolve_ncentroid(cfg, ckpt_path: str):
    explicit = cfg.get("ncentroid_path")
    if explicit:
        return np.load(explicit).astype(np.float32)
    # train runs save ncentroid.npy beside <run>/checkpoints/<name>
    for cand in (
        Path(ckpt_path).parent.parent / "ncentroid.npy",
        Path(ckpt_path).parent / "ncentroid.npy",
    ):
        if cand.is_file():
            return np.load(cand).astype(np.float32)
    return None


def _emit_result(result: dict, out) -> None:
    """Write the predictions dict to ``output=`` or print the summary keys."""
    if out:
        Path(out).parent.mkdir(parents=True, exist_ok=True)
        Path(out).write_text(json.dumps(result))
        print(f"wrote {out}", file=sys.stderr)
    else:
        print(json.dumps({k: v for k, v in result.items()
                          if k not in ("frame_scores", "frame_top_class",
                                       "frame_top_class_prob")}))


def predict_from_artifact(kv: dict) -> dict:
    """Config-free inference from an exported serving artifact (export.py
    ServingArtifact): accepts the same input forms as main(), but needs no
    model code, checkpoint, or config tree."""
    from collections import Counter

    input_path = kv.get("input")
    if not input_path:
        raise SystemExit("predict requires artifact=<dir> input=<path>")
    art, data_cfg = artifact_bootstrap(kv)
    p = Path(input_path)
    enc = art.meta.get("encode")
    # encoder-less artifacts reject raw-frame inputs inside _load_input (the
    # input_size=0 guard) — one source of truth shared with serve
    raw = _load_input(p, data_cfg, int(enc["resolution"]) if enc else 0)
    result = art.predict(raw, str(input_path))
    _emit_result(result, kv.get("output"))
    top = Counter(result["frame_top_class"]).most_common(1)[0][0]
    print(
        f"{input_path}: {result['num_frames']} frames, max score "
        f"{result['video_anomaly_score']:.4f}, top class {top}",
        file=sys.stderr,
    )
    return result


def score_input(module, state, raw: np.ndarray, path: str):
    """Score one loaded input (ncrops, T_raw, ...) through the evaluator's jitted
    scorer -> (VideoScores, predictions dict). Shared by predict and serve.

    Covers the test-mode sampling (pad/cover to segment_size full grids, exactly
    like feature_dataset.py:252-259) and fills ground-truth labels with
    normal_id — unlabeled input must not render as GT-anomalous (the visualizer
    shades labels != normal_id)."""
    from anomalyclip_tpu.data.dataset import TestItem
    from anomalyclip_tpu.data.sampling import gather_frame_indices, test_start_indices
    from anomalyclip_tpu.eval.evaluator import score_video
    from anomalyclip_tpu.models.anomaly_clip import read_classnames

    t_raw = raw.shape[1]
    samp = module.datamodule.cfg
    starts, segment_size = test_start_indices(
        t_raw, samp.num_segments, samp.seg_length, samp.stride
    )
    indices = gather_frame_indices(starts, samp.seg_length, samp.stride, t_raw)
    normal_fill = int(module.net_cfg.normal_id)
    start_frame = input_start_frame(path)  # same rule _load_input gathered by
    item = TestItem(
        features=raw[:, indices],
        frame_labels=np.full(t_raw, normal_fill, dtype=np.int64),
        video_label=normal_fill,
        segment_size=segment_size,
        path=path,
        start_frame=start_frame,
    )
    vs = score_video(item, module._scorer(state), module.model)

    classnames = read_classnames(module.datamodule.cfg.labels_file)
    abnormal_names = [c for i, c in enumerate(classnames) if i != normal_fill]
    top_col = vs.class_probs.argmax(axis=1)
    result = {
        "input": path,
        "num_frames": int(t_raw),
        "video_anomaly_score": float(vs.scores.max()),
        "frame_scores": np.round(vs.scores, 6).tolist(),
        "frame_top_class": [abnormal_names[int(c)] for c in top_col],
        "frame_top_class_prob": np.round(vs.class_probs.max(axis=1), 6).tolist(),
        "classnames_abnormal": abnormal_names,
        "class_probs_shape": list(vs.class_probs.shape),
    }
    return vs, result


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    maybe_force_cpu(argv)  # honored in artifact mode too (before any jax init)
    if "artifact" in kv:
        return predict_from_artifact(kv)
    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parents[1]))

    from anomalyclip_tpu.config import compose, default_config_dir

    cfg = compose(default_config_dir(), "eval", argv)
    if not cfg.get("data") or not cfg.get("model"):
        raise SystemExit(
            "predict needs model/data groups, e.g.\n"
            "  python -m anomalyclip_tpu.predict model=anomaly_clip_ucfcrime "
            "data=ucfcrime ckpt_path=... input=video.mp4"
        )
    ckpt_path = cfg.get("ckpt_path")
    input_path = cfg.get("input")
    if not ckpt_path or ckpt_path == "???" or not input_path:
        raise SystemExit("predict requires ckpt_path=... and input=...")

    module, state = load_module_and_state(cfg)
    data_cfg = cfg["data"]
    raw = _load_input(
        Path(input_path), data_cfg, int(module.model.clip_cfg.image_resolution)
    )  # (ncrops, T_raw, ...)
    t_raw = raw.shape[1]
    vs, result = score_input(module, state, raw, str(input_path))

    if cfg.get("visualize") or data_cfg.get("visualize"):
        # frames-dir or .npy-with-sibling-dir inputs render an annotated mp4
        # (eval/visualizer.py resolves the frames dir from vs.path; video-file
        # inputs have none and are skipped)
        from anomalyclip_tpu.eval.visualizer import Visualizer

        viz = Visualizer(
            normal_id=module.net_cfg.normal_id,
            labels_file=module.datamodule.cfg.labels_file,
            image_tmpl=data_cfg.get("image_tmpl", "{:06d}.jpg"),
            save_dir=cfg.get("paths", {}).get("output_dir", "."),
            frame_step=int(data_cfg.get("visualize_frame_step", 1)),
        )
        viz.process_video(vs)

    _emit_result(result, cfg.get("output"))
    top_col = vs.class_probs.argmax(axis=1)
    print(
        f"{input_path}: {t_raw} frames, max score "
        f"{result['video_anomaly_score']:.4f}, top class "
        f"{result['classnames_abnormal'][int(np.bincount(top_col).argmax())]}",
        file=sys.stderr,
    )
    return result


def cli() -> int:
    """Console-script entry: main() returns the predictions dict, which setuptools
    wrappers pass to sys.exit() — translate to a clean exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
