#!/usr/bin/env python
"""Single-video serving latency on the real accelerator.

Throughput benches (bench.py, bench_eval.py) answer "how many frames per
second"; a deployment also cares how long ONE video takes from input tensor to
per-frame scores (reference inference contract: anomaly_clip.py:117-154 —
similarity + anomaly score per frame). This times the graphs production code
actually runs (eval/evaluator.py:score_video — the same path `serve`,
`predict`, and the evaluator share):

  features  pre-extracted CLIP features (the reference's recommended setup):
            ``GridScorer._score`` — selector -> axial temporal transformer ->
            head over the video's bucketed (segment_size, 32, 16, D) grids,
            text features precomputed at update() exactly as in serving.
  frames    raw preprocessed pixels: ``model.encode_frames`` (the bf16
            ViT-B/16 chunked-encode entry) followed by the same scoring graph.
            The production host loop feeds the encoder in ENCODE_CHUNK-frame
            dispatches; here the whole video is one dispatch, so this is the
            device-compute latency with host-side decode/transfer excluded
            (the real loaders overlap those with device work).

Model size is the production UCF-Crime config (emb_size 256, depth 1, the
shipped 14-class label table). Timing is device latency via the carry-chain
methodology (bench.py); host dispatch/tunnel overhead is excluded.

Usage: python scripts/bench_latency.py [--path features|frames|both]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build():
    import jax

    from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP, AnomalyCLIPConfig
    from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params

    labels_file = (
        Path(__file__).resolve().parents[1]
        / "anomalyclip_tpu" / "labels" / "ucf_labels.csv"
    )
    clip_cfg = CLIPConfig.vit_b16()
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    # configs/model/anomaly_clip_ucfcrime.yaml: the production model size
    cfg = AnomalyCLIPConfig(
        labels_file=str(labels_file),
        emb_size=256,
        depth=1,
        heads=8,
        num_segments=32,
        seg_length=16,
        concat_features=False,
        normal_id=7,
        compute_dtype="bfloat16",
    )
    model, frozen = AnomalyCLIP.build(cfg, clip_params, clip_cfg)
    trainable, bn_state = model.init_trainable(jax.random.PRNGKey(1), frozen)
    return model, frozen, trainable, bn_state


def _chain_time(fn, args, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        def body(_, carry):
            out = fn(*a[:-1], a[-1] + carry.astype(a[-1].dtype) * 0)
            return out.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

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

    from anomalyclip_tpu.eval.evaluator import GridScorer, bucket_size

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)

    model, frozen, trainable, bn_state = _build()
    frozen = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), frozen)
    d = model.clip_cfg.embed_dim
    n, l = model.cfg.num_segments, model.cfg.seg_length
    ncentroid = jnp.asarray(rng.standard_normal(d), jnp.float32)
    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)

    if args.path in ("features", "both"):
        print("features path (pre-extracted ViT-B/16 features, GridScorer._score):")
        for s in (1, 2, 4, 8):
            gb = bucket_size(s, scorer.buckets)  # what score_grids executes
            grids = jnp.asarray(rng.standard_normal((gb, n, l, d)), jnp.float32)

            def score(text, temporal, bn, ncent, g):
                _sim, scores = scorer._score(text, temporal, bn, ncent, g)
                return scores

            best = _chain_time(
                score,
                (scorer.text_features, scorer._temporal, scorer._bn_state,
                 scorer._ncentroid, grids),
                args.iters,
            )
            t_frames = s * n * l
            print(
                f"  {t_frames:5d} frames (~{t_frames/30:5.1f} s @30fps, "
                f"bucket {gb}): {best*1e3:7.2f} ms/video"
            )

    if args.path in ("frames", "both"):
        side = model.clip_cfg.image_resolution
        print("frames path (raw preprocessed pixels: encode_frames + _score):")
        for s in (1, 2):
            t_frames = s * n * l
            gb = bucket_size(s, scorer.buckets)
            video = jnp.asarray(
                rng.standard_normal((t_frames, side, side, 3)), jnp.bfloat16
            )

            def encode_and_score(text, temporal, bn, ncent, fz, frames):
                feats = model.encode_frames(fz, frames)
                grids = feats.reshape(1, n, s, l, d).transpose(0, 2, 1, 3, 4)
                grids = grids.reshape(s, n, l, d)
                if gb != s:
                    grids = jnp.concatenate(
                        [grids, jnp.zeros((gb - s, n, l, d), grids.dtype)], axis=0
                    )
                _sim, scores = scorer._score(text, temporal, bn, ncent, grids)
                return scores

            best = _chain_time(
                lambda text, temporal, bn, ncent, fz, frames: encode_and_score(
                    text, temporal, bn, ncent, fz, frames
                ),
                (scorer.text_features, scorer._temporal, scorer._bn_state,
                 scorer._ncentroid, frozen, video),
                max(4, args.iters // 4),
            )
            print(
                f"  {t_frames:5d} frames (~{t_frames/30:5.1f} s @30fps): "
                f"{best*1e3:7.2f} ms/video ({t_frames/best:,.0f} fps)"
            )


if __name__ == "__main__":
    main()
