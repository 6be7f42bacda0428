"""Persistent scoring service: stream videos through the warm jitted scorer.

The reference ships batch train/eval only; production deployments need a
long-lived process that amortizes model load + compilation across many inputs.
This CLI keeps the checkpoint, text features, and every compiled executable
warm, and overlaps host decode of the next input with device scoring of the
current one (the decode is host-bound, the scoring device-bound, so the
pipeline hides whichever is cheaper):

    # score paths fed line-by-line on stdin (EOF ends the service)
    ls videos/*.mp4 | python -m anomalyclip_tpu.serve model=anomaly_clip_ucfcrime \
        data=ucfcrime ckpt_path=<ckpt> output_dir=scores/

    # watch a directory, scoring new videos as they appear
    python -m anomalyclip_tpu.serve ... watch=incoming/ poll_interval=2

    # deploy from an exported serving artifact: no config/ckpt/model code
    python -m anomalyclip_tpu.serve artifact=<dir> watch=incoming/ output_dir=scores/

Inputs are anything predict.py accepts (video file / frames dir / feature
.npy); one ``<stem>.json`` per input lands in ``output_dir`` with the same
schema as predict.py's output. Scores are bit-identical to eval.py's: the same
GridScorer executables serve both (eval/evaluator.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from anomalyclip_tpu.predict import (
    VIDEO_EXTS,
    _load_input,
    artifact_bootstrap,
    load_module_and_state,
    maybe_force_cpu,
    score_input,
)


def _iter_stdin():
    for line in sys.stdin:
        line = line.strip()
        if line:
            yield Path(line)


def _iter_watch(root: Path, poll_interval: float, stop_after: float):
    """Yield new scoreable files under ``root`` as they appear (mtime-settled).

    ``stop_after`` bounds the service lifetime in seconds (0 = forever) so tests
    and batch jobs terminate.
    """
    seen = set()
    pending: dict = {}  # path -> last observed signature, for settle detection
    deadline = time.time() + stop_after if stop_after else None
    while deadline is None or time.time() < deadline:
        for p in sorted(root.iterdir()):
            try:
                if p in seen or not (
                    p.suffix == ".npy" or p.suffix.lower() in VIDEO_EXTS or p.is_dir()
                ):
                    continue
                # Skip inputs still being written: a file's mtime must be
                # settled one poll; a frames directory must show a stable
                # (mtime, entry count) signature across two polls — otherwise
                # a directory mid-population would be scored partially and
                # never rescored.
                if p.is_file():
                    if time.time() - p.stat().st_mtime < poll_interval:
                        continue
                else:
                    sig = (p.stat().st_mtime, sum(1 for _ in p.iterdir()))
                    if pending.get(p) != sig:
                        pending[p] = sig
                        continue
            except OSError:
                # the entry vanished (atomic-publish rename / cleanup) between
                # listing and stat — drop any settle state and move on
                pending.pop(p, None)
                continue
            pending.pop(p, None)
            seen.add(p)
            yield p
        time.sleep(poll_interval)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    maybe_force_cpu(argv)  # honored in artifact mode too (before any jax init)
    if "artifact" in kv:
        # deployment mode: the exported artifact is the whole contract — no
        # config tree, checkpoint, or model construction (export.py)
        art, data_cfg = artifact_bootstrap(kv)
        enc = art.meta.get("encode")
        input_size = int(enc["resolution"]) if enc else 0
        cfg = kv
        score_fn = art.predict
    else:
        os.environ.setdefault(
            "PROJECT_ROOT", str(Path(__file__).resolve().parents[1])
        )

        from anomalyclip_tpu.config import compose, default_config_dir

        cfg = compose(default_config_dir(), "eval", argv)
        ckpt_path = cfg.get("ckpt_path")
        if not cfg.get("data") or not cfg.get("model") or not ckpt_path or ckpt_path == "???":
            raise SystemExit(
                "serve needs model=... data=... ckpt_path=... (or artifact=<dir>) "
                "[watch=<dir> | paths on stdin] [output_dir=...]"
            )

        module, state = load_module_and_state(cfg)
        data_cfg = cfg["data"]
        input_size = int(module.model.clip_cfg.image_resolution)

        def score_fn(raw, path):
            return score_input(module, state, raw, path)[1]

    out_dir = Path(cfg.get("output_dir") or "predictions")
    out_dir.mkdir(parents=True, exist_ok=True)

    watch = cfg.get("watch")
    paths = (
        _iter_watch(Path(watch), float(cfg.get("poll_interval", 2.0)),
                    float(cfg.get("stop_after", 0)))
        if watch
        else _iter_stdin()
    )

    n_done = 0
    t0 = time.time()
    # one decode slot prefetched ahead of the device: submit(load next) while
    # the current input scores
    with ThreadPoolExecutor(max_workers=1) as decode_pool:
        pending = None  # (path, Future)
        it = iter(paths)

        def submit(p):
            return (p, decode_pool.submit(_load_input, p, data_cfg, input_size))

        for p in it:
            if pending is None:
                pending = submit(p)
                continue
            path, fut = pending
            pending = submit(p)
            _finish(score_fn, path, fut, out_dir)
            n_done += 1
        if pending is not None:
            path, fut = pending
            _finish(score_fn, path, fut, out_dir)
            n_done += 1
    dt = time.time() - t0
    print(f"served {n_done} inputs in {dt:.1f}s", file=sys.stderr)
    return 0


def _finish(score_fn, path: Path, fut, out_dir: Path) -> None:
    """score_fn: (raw, path) -> predictions dict (checkpoint- or artifact-backed)."""
    try:
        raw = fut.result()
        result = score_fn(raw, str(path))
    except Exception as e:  # one bad input must not kill the service
        print(f"ERROR {path}: {type(e).__name__}: {e}", file=sys.stderr)
        return
    out = out_dir / (path.stem + ".json")
    out.write_text(json.dumps(result))
    print(
        f"{path}: {result['num_frames']} frames, "
        f"score {result['video_anomaly_score']:.4f} -> {out}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    sys.exit(main())
