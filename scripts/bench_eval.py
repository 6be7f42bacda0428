#!/usr/bin/env python
"""Feature-path evaluation throughput on the real accelerator.

Measures the per-video scoring hot path the evaluator runs at test time
(reference: anomaly_clip.py:117-154): selector (recenter -> project -> BN) +
axial temporal transformer + sigmoid head over (32, 16) grids, at the
production UCF-Crime model size (emb 128, depth 1, 512-d features). No ViT —
this is the pre-extracted-feature serving number.

Usage: python scripts/bench_eval.py [--grids 64] [--iters 32]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, default=64, help="32x16 grids per batch")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.eval.evaluator import GridScorer
    from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP, AnomalyCLIPConfig
    from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}", file=sys.stderr)

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
    )
    model, frozen = AnomalyCLIP.build(cfg, clip_params, clip_cfg)
    trainable, bn_state = model.init_trainable(jax.random.PRNGKey(1), frozen)
    rng = np.random.default_rng(0)
    ncentroid = rng.standard_normal(clip_cfg.embed_dim).astype(np.float32)

    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)

    g, n, l, d = args.grids, 32, 16, clip_cfg.embed_dim
    grids = jnp.asarray(rng.standard_normal((g, n, l, d)), jnp.float32)

    # carry-chained timing through the jitted score fn (see bench.py methodology)
    @jax.jit
    def chain(text_features, temporal, bn, ncent, grids):
        def body(_, carry):
            sim, scores = scorer._score(
                text_features, temporal, bn, ncent, grids + carry * 0
            )
            return scores[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, args.iters, body, jnp.zeros((), jnp.float32))

    a = (scorer.text_features, scorer._temporal, scorer._bn_state, scorer._ncentroid, grids)
    float(chain(*a))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(*a))
        best = min(best, (time.perf_counter() - t0) / args.iters)

    frames = g * n * l
    print(
        f"eval_score: {best * 1e3:.2f} ms / {g} grids ({frames} frames) "
        f"-> {frames / best:,.0f} frames/sec/chip, "
        f"{g / best:,.0f} grids/sec"
    )


if __name__ == "__main__":
    main()
