#!/usr/bin/env python
"""Perf sweep for ViT-B/16 encoding: attention impl x batch size.

Usage: python scripts/perf_sweep.py [--impls xla,pallas] [--batches 256,512,1024]
Prints ms/iter and frames/sec for each combination on the current device.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(impl: str, batch: int, iters: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip import model as clip_model
    from anomalyclip_tpu.models.clip.model import (
        CLIPConfig,
        encode_image,
        init_clip_params,
    )

    clip_model.set_attention_impl(impl)

    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.asarray(x).dtype == jnp.float32
        else jnp.asarray(x),
        params,
    )

    @jax.jit
    def encode_step(p, frames, carry):
        out = encode_image(
            p, cfg, frames + carry.astype(jnp.bfloat16) * 0, compute_dtype=jnp.bfloat16
        )
        return out[0, 0].astype(jnp.float32)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)

    carry = jnp.zeros((), jnp.float32)
    float(encode_step(params, frames, carry))  # compile

    t0 = time.perf_counter()
    for _ in range(iters):
        carry = encode_step(params, frames, carry)
    float(carry)
    elapsed = time.perf_counter() - t0
    return elapsed / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--batches", default="256,512,1024")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}", file=sys.stderr)

    for impl in args.impls.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            try:
                ms = bench_one(impl, batch, args.iters) * 1e3
                fps = batch / ms * 1e3
                print(f"impl={impl:7s} batch={batch:5d}  {ms:8.2f} ms/iter  {fps:10,.0f} fps")
            except Exception as e:  # noqa: BLE001
                print(f"impl={impl:7s} batch={batch:5d}  FAILED: {type(e).__name__}: {e}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
