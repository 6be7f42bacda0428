#!/usr/bin/env python
"""Throughput benchmark: ViT-B/16 frame encoding — the from-frames hot path.

The dominant compute of the whole framework is CLIP image encoding
(SURVEY.md §3: "b*512 frames @ 224^2 per train step, and every frame of every video
at eval/centroid time"). BASELINE.md's build target is >= 3000 ViT-B/16
frames/sec/chip. This prints ONE JSON line:

    {"metric": "vit_b16_encode_throughput", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N / 3000}

Methodology: iterations run *inside* one jit via lax.fori_loop with a
data-dependent carry (each iteration's input depends on the previous output), so
the loop can be neither elided nor overlapped, and the measurement excludes the
per-dispatch host/tunnel latency (~1-20 ms on the remote-TPU harness) that is not
part of device throughput. bf16 compute, fused Pallas attention (the shipped TPU
default), batch sized to keep the MXU saturated.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 3000.0


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import (
        CLIPConfig,
        encode_image,
        init_clip_params,
    )

    # The driver runs `python bench.py` bare — defaults are the ViT-B/16 headline.
    # --arch/--batch measure other towers with the same carry-chain methodology.
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ViT-B/16",
                    choices=["ViT-B/16", "ViT-B/32", "ViT-L/14", "ViT-L/14@336px"])
    ap.add_argument("--batch", type=int, default=0, help="0 = per-arch default")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="int8 = W8A8 serving tower (models/clip/quant.py)")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"# benchmarking on {dev.platform}:{dev.device_kind}", file=sys.stderr)

    arch_cfgs = {
        "ViT-B/16": CLIPConfig.vit_b16,
        "ViT-B/32": CLIPConfig.vit_b32,
        "ViT-L/14": CLIPConfig.vit_l14,
        "ViT-L/14@336px": CLIPConfig.vit_l14_336,
    }
    cfg = arch_cfgs[args.arch]()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    if args.quant != "int8":
        # cast weights to bf16 once: MXU-native, halves HBM traffic (the int8
        # branch below quantizes the fp32 tree instead)
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16), params
        )

    # batch sweeps on v5e (bf16): B/16 64->3339, 128->3817, 256->3958, 384->3984,
    # 512->3770 (knee 256; 384 within noise for 1.5x the activation memory);
    # B/32 256->12772, 512->12908, 1024->12946 (flat, use 512); L/14 64->893,
    # 128->825, 256->775 (knee 64); L/14@336 32->338, 64->325 (knee 32; L=577
    # runs the q-tiled resident-KV kernel — was 239 on the XLA fallback).
    batch = args.batch or {"ViT-B/16": 256, "ViT-B/32": 512,
                           "ViT-L/14": 64, "ViT-L/14@336px": 32}[args.arch]
    inner_iters = 12

    if args.quant == "int8":
        from anomalyclip_tpu.models.clip.quant import (
            encode_image_int8,
            quantize_clip_visual,
        )

        # one jitted pass; returns device-resident arrays, no per-leaf transfer
        params = {"qvisual": quantize_clip_visual(params)}

        @jax.jit
        def encode_chain(p, frames):
            def body(_, carry):
                out = encode_image_int8(
                    p["qvisual"], cfg, frames + carry.astype(jnp.bfloat16) * 0
                )
                return out[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, inner_iters, body, jnp.zeros((), jnp.float32))
    else:
        @jax.jit
        def encode_chain(p, frames):
            """inner_iters encodes, each data-dependent on the previous via carry."""

            def body(_, carry):
                out = encode_image(
                    p, cfg, frames + carry.astype(jnp.bfloat16) * 0,
                    compute_dtype=jnp.bfloat16,
                )
                return out[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, inner_iters, body, jnp.zeros((), jnp.float32))

    rng = np.random.default_rng(0)
    side = cfg.image_resolution
    frames = jnp.asarray(rng.standard_normal((batch, side, side, 3)), jnp.bfloat16)

    float(encode_chain(params, frames))  # compile + warmup

    # several outer repeats; take the best (least interference on a shared chip)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(encode_chain(params, frames))
        best = min(best, (time.perf_counter() - t0) / inner_iters)

    fps = batch / best
    print(
        f"# {fps:,.0f} frames/s (batch={batch}, {best * 1e3:.2f} ms/iter)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": args.arch.lower()
                .replace("-", "_").replace("/", "").replace("@", "_")
                + "_encode_throughput",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                # the 3,000 fps baseline is a ViT-B/16 target; other archs have
                # no defined baseline, so the ratio would be meaningless there
                "vs_baseline": round(fps / BASELINE_FPS, 3)
                if args.arch == "ViT-B/16" else None,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # The remote-TPU tunnel occasionally drops mid-run and the JAX backend
        # cannot re-initialize in-process; one fresh-process retry rescues the
        # measurement (the guard env var prevents a retry loop).
        import os

        if os.environ.get("ANOMALYCLIP_BENCH_RETRIED"):
            raise
        print(f"# bench failed ({type(e).__name__}: {e}); retrying once "
              "in a fresh process", file=sys.stderr)
        os.environ["ANOMALYCLIP_BENCH_RETRIED"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
