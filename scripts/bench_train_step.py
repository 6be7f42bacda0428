#!/usr/bin/env python
"""From-frames TRAIN-step throughput on the real accelerator.

The production training configuration (data.load_from_features=False) encodes
b*num_segments*seg_length frames with the frozen ViT-B/16 inside every train step,
then runs selector/temporal forward+backward and the optax update. This measures
the whole jitted step (device time; carry-chained) at ViT-B/16 scale.

Usage: python scripts/bench_train_step.py [--videos 4] [--iters 4]
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
    ap.add_argument("--videos", type=int, default=4, help="total videos per step (2 halves)")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP, AnomalyCLIPConfig
    from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params
    from anomalyclip_tpu.models.losses import LossConfig, compute_loss
    from anomalyclip_tpu.train.optim import build_optimizer

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
        emb_size=256,
        depth=1,
        heads=8,
        num_segments=32,
        seg_length=16,
        concat_features=False,
        normal_id=3,
        num_topk=3,
        num_bottomk=3,
        load_from_features=False,
        compute_dtype="bfloat16",
    )
    model, frozen = AnomalyCLIP.build(cfg, clip_params, clip_cfg)
    trainable, bn_state = model.init_trainable(jax.random.PRNGKey(1), frozen)
    frozen = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), frozen)

    tx = build_optimizer(
        {"lr": 1e-4}, {"weight_decay": 0.2}, {"warmup_epochs": 1, "total_epoch": 10}, 10
    )
    opt_state = tx.init(trainable)
    loss_cfg = LossConfig(normal_id=3, num_topk=3, frames_per_segment=16, num_segments=32)

    b = args.videos
    t = 32 * 16
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((b, t, 224, 224, 3)), jnp.bfloat16
    )
    labels = jnp.asarray(
        np.concatenate([rng.integers(0, 3, b // 2), np.full(b - b // 2, 3)]), jnp.int32
    )
    ncentroid = jnp.asarray(rng.standard_normal(clip_cfg.embed_dim), jnp.float32)

    @jax.jit
    def train_step(trainable, opt_state, bn_state, frames, carry, key):
        frames = frames + carry.astype(jnp.bfloat16) * 0

        def loss_fn(tr):
            out, new_bn = model.forward_train(
                frozen, tr, bn_state, frames, labels, ncentroid, key
            )
            terms = compute_loss(
                out.logits, out.logits_topk, labels, out.scores,
                out.idx_topk_abn, out.idx_topk_nor, out.idx_bottomk_abn, loss_cfg,
            )
            return terms.total, new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        return new_trainable, new_opt, new_bn, loss.astype(jnp.float32)

    key = jax.random.PRNGKey(0)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    trainable, opt_state, bn_state, carry = train_step(
        trainable, opt_state, bn_state, frames, carry, key
    )
    float(carry)
    print(f"# compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        trainable, opt_state, bn_state, carry = train_step(
            trainable, opt_state, bn_state, frames, carry, key
        )
    float(carry)
    dt = (time.perf_counter() - t0) / args.iters
    fps = b * t / dt
    print(
        f"train_step: {dt * 1e3:,.1f} ms/step ({b} videos, {b * t} frames) "
        f"-> {fps:,.0f} frames/sec/chip"
    )


if __name__ == "__main__":
    main()
