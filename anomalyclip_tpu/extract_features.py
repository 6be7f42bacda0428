"""CLIP feature extraction: frame directories -> one ``<video>.npy`` per video.

The reference *recommends* training from pre-extracted CLIP features but ships
no extractor — its README points users at third-party scripts for producing
them (reference: README.md:64-70 "Pre-extracted Features", README.md:104-106
acknowledging external inference scripts). This closes that workflow gap
TPU-natively: frames decode in a host thread pool while the ViT encodes
fixed-shape chunks on device (one compile for the whole corpus), at the
benchmarked ~4k frames/sec/chip in bf16.

Output layout matches the reference's feature files exactly: a (T, D) float
array per video for ncrops=1, (T, ncrops, D) for 10-crop — both load through
``FeatureSource.load_video``'s ``reshape(-1, ncrops, D)``
(reference: src/data/components/feature_dataset.py:326-349).

Usage:
    python -m anomalyclip_tpu.extract_features \
        --frames-root /data/ucfcrime/frames --out-root /data/ucfcrime/features \
        --clip-ckpt ~/.cache/clip/ViT-B-16.pt [--ncrops 10] [--dtype bfloat16]

Videos are discovered from ``--annotations`` files (same txt format as
training: ``REL_PATH START END LABEL``) or, without one, every subdirectory of
``--frames-root`` containing frames.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, List, Optional

import numpy as np


def _discover_videos(frames_root: Path, image_tmpl: str) -> List[str]:
    """Every subdirectory (recursive) that contains frame-0001 of the template."""
    found = []
    probe = image_tmpl.format(1)
    for dirpath, _dirnames, filenames in os.walk(frames_root):
        if probe in filenames:
            found.append(os.path.relpath(dirpath, frames_root))
    return sorted(found)


def _video_list(args) -> List[tuple]:
    """-> [(rel_path, start_frame, num_frames)]."""
    frames_root = Path(args.frames_root)
    if args.annotations:
        from anomalyclip_tpu.data.records import parse_annotation_file

        vids = []
        for ann in args.annotations:
            for rec in parse_annotation_file(ann, str(frames_root)):
                vids.append((rec.rel_path, rec.start_frame, rec.num_frames))
        return vids
    from anomalyclip_tpu.data.sources import count_frames

    return [
        (rel, 1, count_frames(frames_root / rel, args.image_tmpl))
        for rel in _discover_videos(frames_root, args.image_tmpl)
    ]


def main(argv: Optional[Iterable[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--frames-root", required=True, help="root of per-video frame dirs")
    p.add_argument("--out-root", required=True, help="where <video>.npy files go")
    p.add_argument("--annotations", nargs="*", default=None,
                   help="annotation txt file(s); default: discover all frame dirs")
    p.add_argument("--image-tmpl", default="{:06d}.jpg")
    p.add_argument("--ncrops", type=int, default=1, choices=(1, 10))
    p.add_argument("--clip-ckpt", default=None, help="torch CLIP checkpoint path")
    p.add_argument("--clip-init", default="pretrained",
                   choices=("pretrained", "random", "random-full"),
                   help="'random' uses the tiny test config (tests only)")
    p.add_argument("--arch", default="ViT-B/16")
    p.add_argument("--batch", type=int, default=256, help="device encode chunk")
    p.add_argument("--dtype", default="bfloat16", choices=("float32", "bfloat16"),
                   help="compute dtype on device")
    p.add_argument("--save-dtype", default="float32", choices=("float32", "float16"))
    p.add_argument("--workers", type=int, default=8, help="decode threads")
    p.add_argument("--fast-decode", action="store_true", help="cv2 decode path")
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(list(argv) if argv is not None else None)

    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.data.records import VideoRecord
    from anomalyclip_tpu.data.sources import FrameSource
    from anomalyclip_tpu.eval.evaluator import encode_frames_chunked
    from anomalyclip_tpu.models.clip.model import encode_image
    from anomalyclip_tpu.models.clip.registry import resolve_clip

    params, cfg = resolve_clip(args.arch, args.clip_init, args.clip_ckpt)
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, compute_dtype), params)
    input_size = cfg.image_resolution  # positional embedding fixes the resolution

    @jax.jit
    def encode_jit(frozen, frames):
        # frames arrive uint8 (FrameSource): encode_image normalizes on device
        # in fp32 then casts to compute_dtype — an eager astype here would skip
        # the normalize and feed 0-255 pixels to the tower
        return encode_image(
            frozen, cfg, frames, compute_dtype=compute_dtype
        ).astype(jnp.float32)

    source = FrameSource(
        input_size=input_size,
        image_tmpl=args.image_tmpl,
        ncrops=args.ncrops,
        fast_decode=args.fast_decode,
    )
    videos = _video_list(args)
    if not videos:
        print(f"no videos found under {args.frames_root}", file=sys.stderr)
        return 1
    out_root = Path(args.out_root)

    pool = ThreadPoolExecutor(max_workers=args.workers)

    todo = []
    for rel, start, n in videos:
        out_path = out_root / f"{rel}.npy"
        if out_path.exists() and not args.overwrite:
            print(f"skip {rel} (exists)", file=sys.stderr)
            continue
        if n <= 0:
            # fail loudly: a silently skipped video would never get a feature
            # file and the skip-existing resume check would retry it forever
            raise SystemExit(
                f"{rel}: no frames (start/end annotation malformed or empty dir)"
            )
        rec = VideoRecord(
            rel_path=rel, start_frame=start, end_frame=start + n - 1, label=0,
            root=str(args.frames_root),
        )
        todo.append((rel, rec, n, out_path))

    # chunk-level pipelining: decode chunk k+1 on the host pool while chunk k
    # encodes on the device. Host memory is O(args.batch) frames regardless of
    # video length — whole-video buffering would hold tens of GB of float32 for
    # an hour-long clip (and 10x that for 10-crop).
    step = max(1, args.batch // args.ncrops)  # frames per decoded chunk
    tasks = []  # (video_index, lo, hi) in frame-index space
    for vi, (_, _, n, _) in enumerate(todo):
        for lo in range(0, n, step):
            tasks.append((vi, lo, min(lo + step, n)))

    def load_chunk(task) -> np.ndarray:
        vi, lo, hi = task
        return source.gather(todo[vi][1], np.arange(lo, hi), pool=pool)

    total_frames = 0
    t0 = time.perf_counter()
    lookahead = ThreadPoolExecutor(max_workers=1)
    fut = lookahead.submit(load_chunk, tasks[0]) if tasks else None
    parts: List[np.ndarray] = []
    for ti, (vi, lo, hi) in enumerate(tasks):
        arr = fut.result()  # (ncrops, hi-lo, H, W, 3)
        fut = (
            lookahead.submit(load_chunk, tasks[ti + 1])
            if ti + 1 < len(tasks)
            else None
        )
        ncrops = arr.shape[0]
        flat = arr.reshape((-1,) + arr.shape[2:])
        f = encode_frames_chunked(encode_jit, params, flat, chunk=args.batch)
        parts.append(f.reshape(ncrops, hi - lo, -1))
        total_frames += (hi - lo) * ncrops

        if ti + 1 == len(tasks) or tasks[ti + 1][0] != vi:
            rel, _, t, out_path = todo[vi]
            feats = np.concatenate(parts, axis=1).transpose(1, 0, 2)  # (T, nc, D)
            parts = []
            if ncrops == 1:
                feats = feats[:, 0]  # (T, D) — the reference's single-crop layout
            out_path.parent.mkdir(parents=True, exist_ok=True)
            # atomic: a partial file at the final name would be skipped as
            # complete on resume and crash training/eval later (.npy suffix kept
            # so np.save does not append another)
            tmp = out_path.with_name(out_path.stem + ".tmp.npy")
            np.save(tmp, feats.astype(args.save_dtype))
            os.replace(tmp, out_path)
            dt = time.perf_counter() - t0
            print(
                f"{rel}: {t} frames x{ncrops} -> {out_path}"
                f"  [{total_frames / max(dt, 1e-9):,.0f} fps cum]",
                file=sys.stderr,
            )
    pool.shutdown()
    lookahead.shutdown()
    print(f"done: {len(todo)} videos, {total_frames} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
