#!/usr/bin/env python
"""Throughput benchmark: ViT-B/16 frame encoding — the from-frames hot path.

The dominant compute of the whole framework is CLIP image encoding
(SURVEY.md §3: "b*512 frames @ 224^2 per train step, and every frame of every video
at eval/centroid time"). BASELINE.md's build target is >= 3000 ViT-B/16
frames/sec/chip. This prints ONE JSON line:

    {"metric": "vit_b16_encode_throughput", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N / 3000}

Runs on whatever accelerator JAX exposes (the driver provides one real TPU chip);
bf16 compute, batched to keep the MXU saturated.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 3000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import (
        CLIPConfig,
        encode_image,
        init_clip_params,
    )

    dev = jax.devices()[0]
    print(f"# benchmarking on {dev.platform}:{dev.device_kind}", file=sys.stderr)

    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    # cast weights to bf16 once: MXU-native, halves HBM traffic
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.asarray(x).dtype == jnp.float32
        else jnp.asarray(x),
        params,
    )
    params = jax.device_put(params, dev)

    batch = 256

    @jax.jit
    def encode(p, frames):
        return encode_image(p, cfg, frames, compute_dtype=jnp.bfloat16)

    @jax.jit
    def encode_step(p, frames, carry):
        """One timed iteration, data-dependent on the previous via ``carry``."""
        out = encode_image(
            p, cfg, frames + carry.astype(jnp.bfloat16) * 0, compute_dtype=jnp.bfloat16
        )
        return out[0, 0].astype(jnp.float32)

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16), dev
    )

    # warmup / compile
    carry = jnp.zeros((), jnp.float32)
    float(encode_step(params, frames, carry))

    # every iteration feeds the next, so no iteration can be elided or
    # overlapped away by the async runtime
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = encode_step(params, frames, carry)
    float(carry)  # forces the whole chain
    elapsed = time.perf_counter() - t0

    fps = batch * iters / elapsed
    print(
        f"# {fps:,.0f} frames/s (batch={batch}, {elapsed / iters * 1e3:.2f} ms/iter)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "vit_b16_encode_throughput",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
