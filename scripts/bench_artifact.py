#!/usr/bin/env python
"""Exported-artifact overhead check on the real accelerator.

Deployment runs the serving graphs from a deserialized `jax.export` artifact
(export.py) rather than tracing the model; this measures whether that costs
anything at steady state. Times the production-size score graph (the same
model block as scripts/bench_latency.py: emb 256, depth 1, UCF-Crime labels)
two ways on identical inputs:

  native    GridScorer._score — the jitted executable serve/predict/eval use
            when loading a checkpoint.
  artifact  the round-tripped export: serialize + deserialize the score graph,
            then call it through the jit-cached ServingArtifact path.

Expected: parity — the exported StableHLO recompiles to the same executable.
Usage: python scripts/bench_artifact.py [--iters 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_latency import _build, _chain_time  # noqa: E402  (same model block)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.eval.evaluator import GridScorer, bucket_size
    from anomalyclip_tpu.export import ServingArtifact, export_serving_artifact

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)

    model, frozen, trainable, bn_state = _build()
    frozen = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), frozen)
    d = model.clip_cfg.embed_dim
    n, l = model.cfg.num_segments, model.cfg.seg_length
    ncentroid = np.asarray(rng.standard_normal(d), np.float32)
    scorer = GridScorer(model, frozen, trainable, bn_state, jnp.asarray(ncentroid))

    out = tempfile.mkdtemp(prefix="artifact_bench_")
    export_serving_artifact(
        model, frozen, trainable, bn_state, ncentroid, out, include_encoder=False
    )
    art = ServingArtifact.load(out)

    for s in (1, 8):
        gb = bucket_size(s, scorer.buckets)
        grids = jnp.asarray(rng.standard_normal((gb, n, l, d)), jnp.float32)

        def native(text, temporal, bn, ncent, g):
            return scorer._score(text, temporal, bn, ncent, g)[1]

        t_nat = _chain_time(
            native,
            (scorer.text_features, scorer._temporal, scorer._bn_state,
             scorer._ncentroid, grids),
            args.iters,
        )

        # pass the weight leaves as runtime arguments, exactly like the
        # production path (_score_call(self._score_leaves, grids)) — closing
        # over them would bake them into the trace as foldable constants and
        # measure a differently-specialized executable than production runs
        leaves = [jnp.asarray(x) for x in art._score_leaves]

        def exported(lv, g):
            return art._score_exp.call(lv, g)[1]

        t_art = _chain_time(exported, (leaves, grids), args.iters)
        t_frames = s * n * l
        print(
            f"{t_frames:5d} frames (bucket {gb}): native {t_nat*1e3:7.2f} ms, "
            f"artifact {t_art*1e3:7.2f} ms ({t_art/t_nat:0.2f}x)"
        )


if __name__ == "__main__":
    main()
