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
    ap.add_argument("--e2e", action="store_true",
                    help="end-to-end from-frames ingest: JPEG decode + "
                         "preprocess + transfer + encode, sustained (the "
                         "device-only carry-chain number excludes the host)")
    args = ap.parse_args()

    if args.e2e:
        return _bench_e2e_ingest()

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


def _bench_e2e_ingest() -> None:
    """Sustained from-frames ingest through the production extract-features CLI.

    The headline carry-chain bench deliberately excludes the host; this one
    answers "can the host feed the chip": synthetic 224px JPEG corpus ->
    extract_features.main (cv2 decode threads overlapped with device encode,
    uint8 host->device transfer, on-device normalize) -> sustained frames/sec
    measured over the whole run. Also reports the host decode+preprocess rate
    alone, which bounds the pipeline on decode-starved hosts: e2e ~=
    min(decode_rate, device_rate) once the two stages overlap. Decode scales
    linearly with cores (per-core rate is printed), so the doc's
    cores-to-saturate estimate is device_fps / per_core_decode_fps."""
    import os
    import tempfile
    import time
    from pathlib import Path

    import jax  # noqa: F401 — fail early if no backend

    from anomalyclip_tpu.data.synthetic import generate_synthetic_dataset
    from anomalyclip_tpu.utils.extras import enable_compilation_cache

    enable_compilation_cache()  # steady-state measurement, not compile time

    root = Path(tempfile.gettempdir()) / "anomalyclip_e2e_bench"
    froot, aroot = root / "frames", root / "annotations"
    n_videos = 6
    generate_synthetic_dataset(  # stamped: regeneration is skipped when cached
        frames_root=froot,
        annotations_root=aroot,
        num_normal=n_videos,
        num_abnormal=0,
        num_test=0,
        min_frames=900,
        max_frames=1100,
        make_frames=True,
        frame_size=224,
        seed=3,
    )

    from anomalyclip_tpu.data.records import parse_annotation_file

    records = parse_annotation_file(aroot / "Anomaly_Train_Normal.txt", str(froot))
    total_frames = sum(r.num_frames for r in records)

    # host decode+preprocess alone (cv2 fast path, the production default for
    # throughput runs) — the stage that bounds 1-core hosts
    from concurrent.futures import ThreadPoolExecutor

    from anomalyclip_tpu.data.sources import FrameSource

    workers = max(os.cpu_count() or 1, 1)
    src = FrameSource(input_size=224, fast_decode=True)
    pool = ThreadPoolExecutor(max_workers=workers)
    warm = records[0]
    src.gather(warm, np.arange(min(64, warm.num_frames)), pool=pool)  # warm cache
    t0 = time.perf_counter()
    decoded = 0
    for r in records:
        src.gather(r, np.arange(r.num_frames), pool=pool)
        decoded += r.num_frames
    decode_fps = decoded / (time.perf_counter() - t0)
    pool.shutdown()

    decode_scaling = _decode_thread_scaling(records[0], src.image_tmpl)

    # one warm 256-frame encode DISPATCH from a host array, uint8 vs float32:
    # ships the chunk over the host->device link and encodes. On this harness
    # the link is the remote-TPU tunnel, so the dispatch is link-bound (~30
    # MB/s measured) — exactly where the uint8 ingest contract (FrameSource
    # emits uint8, encoders normalize in-graph, 1/4 the bytes) pays off; on a
    # real TPU-VM host the same 4x rides PCIe.
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import (
        CLIPConfig,
        encode_image,
        init_clip_params,
    )

    cfg = CLIPConfig.vit_b16()
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16),
        init_clip_params(jax.random.PRNGKey(0), cfg),
    )

    @jax.jit
    def enc(p, f):
        return encode_image(p, cfg, f, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    chunk_u8 = rng.integers(0, 256, size=(256, 224, 224, 3), dtype=np.uint8)
    chunk_f32 = ((chunk_u8.astype(np.float32) / 255.0) - 0.45) / 0.27

    def dispatch_fps(arr) -> float:
        np.asarray(enc(params, arr))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(enc(params, arr))
            best = min(best, time.perf_counter() - t)
        return len(arr) / best

    disp_u8 = dispatch_fps(chunk_u8)
    disp_f32 = dispatch_fps(chunk_f32)

    # end-to-end: the production CLI (decode pipelined with device encode).
    # Run 1 warms the persistent compile cache; run 2 is the sustained number
    # (a production job amortizes one compile over hours, not 6k frames).
    from anomalyclip_tpu.extract_features import main as extract_main

    out_root = root / "features_out"
    import shutil

    def run_extract() -> float:
        shutil.rmtree(out_root, ignore_errors=True)
        t0 = time.perf_counter()
        rc = extract_main(
            [
                "--frames-root", str(froot),
                "--out-root", str(out_root),
                "--annotations", str(aroot / "Anomaly_Train_Normal.txt"),
                "--clip-init", "random-full",
                "--batch", "256",
                "--workers", str(workers),
                "--fast-decode",
            ]
        )
        assert rc == 0
        return total_frames / (time.perf_counter() - t0)

    cold_fps = run_extract()
    e2e_fps = run_extract()

    print(
        f"# e2e ingest: {e2e_fps:,.0f} fps sustained over {total_frames} frames "
        f"(cold incl. compile: {cold_fps:,.0f}); host decode+preprocess alone: "
        f"{decode_fps:,.0f} fps on {workers} core(s) "
        f"({decode_fps / workers:,.0f} fps/core); thread scaling {decode_scaling}; "
        f"warm 256-frame encode dispatch "
        f"from host: uint8 {disp_u8:,.0f} fps vs float32 {disp_f32:,.0f} fps",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "vit_b16_e2e_ingest_throughput",
                "value": round(e2e_fps, 1),
                "unit": "frames/sec (decode+preprocess+transfer+encode)",
                "vs_baseline": None,
                "host_decode_fps": round(decode_fps, 1),
                "decode_workers": workers,
                "host_decode_scaling": decode_scaling,
                "dispatch_fps_uint8": round(disp_u8, 1),
                "dispatch_fps_float32": round(disp_f32, 1),
            }
        )
    )


def _decode_thread_scaling(record, image_tmpl: str = "{:06d}.jpg") -> dict:
    """Measured decode+preprocess thread-scaling: the same in-memory JPEG set
    decoded at 1/2/4/... threads up to os.cpu_count(). Turns "decode scales
    linearly with cores" from an assertion into a measurement wherever the
    bench runs — cv2 releases the GIL during imdecode/resize, and this curve
    is the proof (or refutation) on the host at hand. In-memory bytes keep
    filesystem caching out of the measurement."""
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    import cv2

    from anomalyclip_tpu.data.transforms import _center_offset, _short_side_size

    n = min(record.num_frames, 192)
    # file ids follow the FrameSource contract: sample index + record.start_frame
    # through the dataset's image template (data/sources.py) — the caller passes
    # the FrameSource's actual image_tmpl so non-default corpora work too.
    blobs = [
        np.fromfile(
            os.path.join(
                record.frames_dir, image_tmpl.format(i + record.start_frame)
            ),
            np.uint8,
        )
        for i in range(n)
    ]

    def one(buf) -> int:
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        h, w = img.shape[:2]
        new_h, new_w = _short_side_size(h, w, 224)
        interp = cv2.INTER_AREA if new_w < w else cv2.INTER_CUBIC
        img = cv2.resize(img, (new_w, new_h), interpolation=interp)
        top, left = _center_offset(new_h - 224), _center_offset(new_w - 224)
        return int(img[top : top + 224, left : left + 224, 0].sum()) & 1

    def rate(nthreads: int) -> float:
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            list(ex.map(one, blobs[: 4 * nthreads]))  # warm the pool
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                list(ex.map(one, blobs))
            return reps * len(blobs) / (time.perf_counter() - t0)

    ncpu = max(os.cpu_count() or 1, 1)
    scaling = {}
    nt = 1
    while nt <= ncpu:
        scaling[str(nt)] = round(rate(nt), 1)
        nt *= 2
    if str(ncpu) not in scaling:
        scaling[str(ncpu)] = round(rate(ncpu), 1)
    return scaling


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
