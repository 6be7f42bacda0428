#!/usr/bin/env python
"""Single-video serving latency on the real accelerator.

Throughput benches (bench.py, bench_eval.py) answer "how many frames per
second"; a deployment also cares how long ONE video takes from input tensor to
per-frame scores (reference inference contract: anomaly_clip.py:117-154 —
similarity + anomaly score per frame). Two serving paths:

  features  pre-extracted CLIP features (the reference's recommended setup):
            selector -> axial temporal transformer -> head, per padded video of
            segment_size x 32 x 16 frames.
  frames    raw preprocessed pixels: ViT-B/16 encode + the same scoring head
            (the from-frames path; encode dominates).

Timing is device latency via the carry-chain methodology (bench.py): host
dispatch/tunnel overhead and JPEG decode (host-side, overlapped with device
work in the real loaders) are excluded.

Usage: python scripts/bench_latency.py [--path features|frames|both]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(load_from_features: bool):
    import jax

    from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP, AnomalyCLIPConfig
    from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params

    labels_file = Path(tempfile.mkdtemp()) / "labels.csv"
    labels_file.write_text(
        "id,name\n0,Abuse\n1,Arson\n2,Fighting\n3,Normal\n4,Robbery\n5,Shooting\n"
    )
    clip_cfg = CLIPConfig.vit_b16()
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    cfg = AnomalyCLIPConfig(
        labels_file=str(labels_file),
        emb_size=128,
        depth=1,
        heads=8,
        num_segments=32,
        seg_length=16,
        concat_features=False,
        normal_id=3,
        load_from_features=load_from_features,
        compute_dtype="float32" if load_from_features else "bfloat16",
    )
    model, frozen = AnomalyCLIP.build(cfg, clip_params, clip_cfg)
    trainable, bn_state = model.init_trainable(jax.random.PRNGKey(1), frozen)
    return model, frozen, trainable, bn_state


def _time_video(model, frozen, trainable, bn_state, video, ncentroid, segment_size,
                iters: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(frozen, trainable, bn_state, video, ncentroid):
        def body(_, carry):
            _sim, scores = model.forward_test(
                frozen, trainable, bn_state,
                video + carry.astype(video.dtype) * 0,
                ncentroid, segment_size,
            )
            return scores[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    args = (frozen, trainable, bn_state, video, ncentroid)
    float(chain(*args))  # compile + warmup
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="both", choices=["features", "frames", "both"])
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)

    if args.path in ("features", "both"):
        model, frozen, trainable, bn_state = _build(load_from_features=True)
        d = model.clip_cfg.embed_dim
        ncentroid = jnp.asarray(rng.standard_normal(d), jnp.float32)
        print("features path (pre-extracted ViT-B/16 features):")
        for s in (1, 2, 4, 8):
            t_frames = s * 32 * 16
            video = jnp.asarray(
                rng.standard_normal((1, t_frames, d)), jnp.float32
            )
            best = _time_video(
                model, frozen, trainable, bn_state, video, ncentroid, s, args.iters
            )
            print(
                f"  {t_frames:5d} frames (~{t_frames/30:5.1f} s @30fps): "
                f"{best*1e3:7.2f} ms/video"
            )

    if args.path in ("frames", "both"):
        model, frozen, trainable, bn_state = _build(load_from_features=False)
        frozen = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16), frozen
        )
        d = model.clip_cfg.embed_dim
        ncentroid = jnp.asarray(rng.standard_normal(d), jnp.float32)
        side = model.clip_cfg.image_resolution
        print("frames path (raw preprocessed pixels, bf16 ViT-B/16 encode):")
        for s in (1, 2):
            t_frames = s * 32 * 16
            video = jnp.asarray(
                rng.standard_normal((1, t_frames, side, side, 3)), jnp.bfloat16
            )
            best = _time_video(
                model, frozen, trainable, bn_state, video, ncentroid, s,
                max(4, args.iters // 4),
            )
            print(
                f"  {t_frames:5d} frames (~{t_frames/30:5.1f} s @30fps): "
                f"{best*1e3:7.2f} ms/video ({t_frames/best:,.0f} fps)"
            )


if __name__ == "__main__":
    main()
