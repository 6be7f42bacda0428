#!/usr/bin/env python
"""Isolated-attention bench at the ViT-L/14@336 per-layer shape (B=32, L=577,
D=1024, H=16, dh=64, bf16) — the harness behind docs/performance.md's
"Other CLIP towers" section. Carry-chained (each call consumes the previous
call's output) so the loop is neither elided nor overlapped.

Variants:
  qtile        the shipped fused_mha_qtile (baseline)
  qtile-lq<N>  same kernel with the q-tile length overridden to N
               (577 = prime: lq=128 pads the 5-tile sweep to 640 rows, 11%
               waste; lq=120 pads to 600, 4%)
  twopass      flash-style fp32 row-state carried across 2 resident KV halves,
               halving the resident-KV VMEM so the batch group can rise
  nosoftmax    baseline kernel with softmax replaced by identity (dot+DMA floor)
  xla          the plain XLA formulation

Usage: python scripts/bench_attn_l14.py [--variants qtile,twopass,...] [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, D, H = 32, 577, 1024, 16
DH = D // H
SCALE = 1.0 / math.sqrt(DH)


def _inputs():
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((B, L, D)) * 0.02, jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((B, L, 2 * D)) * 0.02, jnp.bfloat16)
    return q, kv


def _bench(fn, q, kv, iters: int) -> float:
    """Carry-chained timing — single shared methodology (scripts/_bench_util)."""
    from _bench_util import carry_bench

    return carry_bench(fn, q, kv, iters=iters)


def _check_group(gb: int, name: str) -> int:
    """Batch groups must divide B exactly: grid=(B // gb, ...) with a non-divisor
    silently benchmarks only floor(B/gb)*gb rows and leaves the tail unwritten,
    so the reported ms/layer would be for a smaller effective batch."""
    if B % gb != 0:
        raise SystemExit(f"{name}: batch group {gb} does not divide B={B}")
    return gb


def make_variant(name: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from anomalyclip_tpu.ops.pallas import attention as A

    # every ad-hoc variant gets the same raised scoped-VMEM cap the shipped
    # kernel runs under, so timings compare apples-to-apples
    CP = pltpu.CompilerParams(vmem_limit_bytes=A._QTILE_VMEM_LIMIT)

    if name == "qtile":
        return lambda q, kv: A.fused_mha_qtile(q, kv, H)

    if name.startswith("qtile-lq"):
        lq = int(name[len("qtile-lq"):])

        def run(q, kv):
            kern = functools.partial(A._mha_qtile_kernel, num_heads=H, scale=SCALE)
            return pl.pallas_call(
                kern,
                grid=(B, pl.cdiv(L, lq)),
                in_specs=[
                    pl.BlockSpec((1, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, L, 2 * D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
                compiler_params=CP,
            )(q, kv)

        return run

    if name.startswith("twopass"):
        # fp32 row-state (max, sum, acc) carried across KV halves; KV block is
        # half-resident so the batch group can rise past the qtile kernel's 1.
        parts = name.split("-")
        gb = _check_group(int(parts[1][2:]) if len(parts) > 1 else 2, name)
        lq = int(parts[2][2:]) if len(parts) > 2 else 128
        lkv = 296  # ceil(577/2) rounded to the 8-sublane grain; tail is padded

        def kern(q_ref, kv_ref, o_ref, acc_ref, m_ref, s_ref):
            kstep = pl.program_id(2)

            @pl.when(kstep == 0)
            def _init():
                acc_ref[...] = jnp.zeros_like(acc_ref)
                m_ref[...] = jnp.full_like(m_ref, A.NEG_INF)
                s_ref[...] = jnp.zeros_like(s_ref)

            for h in range(H):
                q = q_ref[:, :, h * DH : (h + 1) * DH]
                k = kv_ref[:, :, h * DH : (h + 1) * DH]
                v = kv_ref[:, :, D + h * DH : D + (h + 1) * DH]
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * SCALE
                col = kstep * lkv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
                s = jnp.where(col < L, s, A.NEG_INF)
                m_old = m_ref[:, :, h : h + 1]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=2, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new)
                vrow = kstep * lkv + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                v = jnp.where(vrow < L, v, 0).astype(v.dtype)
                acc_ref[:, :, h * DH : (h + 1) * DH] = acc_ref[
                    :, :, h * DH : (h + 1) * DH
                ] * alpha + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                s_ref[:, :, h : h + 1] = s_ref[:, :, h : h + 1] * alpha + jnp.sum(
                    p, axis=2, keepdims=True
                )
                m_ref[:, :, h : h + 1] = m_new

            @pl.when(kstep == pl.num_programs(2) - 1)
            def _finish():
                for h in range(H):
                    sl = slice(h * DH, (h + 1) * DH)
                    o_ref[:, :, sl] = (
                        acc_ref[:, :, sl] / s_ref[:, :, h : h + 1]
                    ).astype(o_ref.dtype)

        def run(q, kv):
            return pl.pallas_call(
                kern,
                grid=(B // gb, pl.cdiv(L, lq), 2),
                in_specs=[
                    pl.BlockSpec((gb, lq, D), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, lkv, 2 * D), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((gb, lq, D), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
                compiler_params=CP,
                scratch_shapes=[
                    pltpu.VMEM((gb, lq, D), jnp.float32),
                    pltpu.VMEM((gb, lq, 128), jnp.float32),
                    pltpu.VMEM((gb, lq, 128), jnp.float32),
                ],
            )(q, kv)

        return run

    if name.startswith("whole"):
        # whole-block kernel (no q tiling) with the VMEM gate bypassed — round-2
        # Mosaic hard-crashed at L>=512/D=1024; probe whether that still holds.
        parts = name.split("-")
        gb = _check_group(int(parts[1][2:]) if len(parts) > 1 else 1, name)

        def run(q, kv):
            kern = functools.partial(
                A._mha_bld_kernel, num_heads=H, scale=SCALE, causal=False
            )
            return pl.pallas_call(
                kern,
                grid=(B // gb,),
                in_specs=[
                    pl.BlockSpec((gb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((gb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
                compiler_params=CP,
            )(q, kv[..., :D], kv[..., D:])

        return run

    if name.startswith("qtilegb"):
        parts = name.split("-")
        gb = _check_group(int(parts[0][len("qtilegb"):]), name)
        lq = int(parts[1][2:]) if len(parts) > 1 else 128

        def run(q, kv):
            kern = functools.partial(A._mha_qtile_kernel, num_heads=H, scale=SCALE)
            return pl.pallas_call(
                kern,
                grid=(B // gb, pl.cdiv(L, lq)),
                in_specs=[
                    pl.BlockSpec((gb, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, L, 2 * D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((gb, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
                compiler_params=CP,
            )(q, kv)

        return run

    if name.startswith("pair"):
        # Head-pair grid: the third grid dimension walks 128-lane-aligned
        # head *pairs*, so every block the kernel sees is a native-width lane
        # slice produced by the BlockSpec itself — no in-kernel odd-offset
        # slicing, no caller-side transposes, and the batch group can rise
        # because per-program VMEM only holds one pair. KV varies with the
        # pair index and stays resident across the innermost q-tile sweep.
        parts = name.split("-")
        gb = _check_group(int(parts[1][2:]) if len(parts) > 1 else 8, name)
        lq = int(parts[2][2:]) if len(parts) > 2 else 128
        if H % 2 != 0:
            raise SystemExit(f"{name}: head-pair grid needs even H, got {H}")

        def kern(q_ref, k_ref, v_ref, o_ref):
            for h in range(2):
                sl = slice(h * DH, (h + 1) * DH)
                o_ref[:, :, sl] = A._attend_head(
                    q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl],
                    SCALE, None, o_ref.dtype,
                )

        def run(q, kv):
            k, v = kv[..., :D], kv[..., D:]
            return pl.pallas_call(
                kern,
                grid=(B // gb, H // 2, pl.cdiv(L, lq)),
                in_specs=[
                    pl.BlockSpec((gb, lq, 128), lambda i, h, j: (i, j, h), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, L, 128), lambda i, h, j: (i, 0, h), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, L, 128), lambda i, h, j: (i, 0, h), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((gb, lq, 128), lambda i, h, j: (i, j, h), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
                compiler_params=CP,
            )(q, k, v)

        return run

    if name.startswith("nosoftmax"):
        parts = name.split("-")
        gb = (
            _check_group(int(parts[0][len("nosoftmaxgb"):]), name)
            if parts[0] != "nosoftmax"
            else 1
        )
        lq_override = int(parts[1][2:]) if len(parts) > 1 else None

        def kern(q_ref, kv_ref, o_ref):
            for h in range(H):
                q = q_ref[:, :, h * DH : (h + 1) * DH]
                k = kv_ref[:, :, h * DH : (h + 1) * DH]
                v = kv_ref[:, :, D + h * DH : D + (h + 1) * DH]
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * SCALE
                o_ref[:, :, h * DH : (h + 1) * DH] = jax.lax.dot_general(
                    s.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)

        lq = lq_override or 128

        def run(q, kv):
            return pl.pallas_call(
                kern,
                grid=(B // gb, pl.cdiv(L, lq)),
                in_specs=[
                    pl.BlockSpec((gb, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, L, 2 * D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((gb, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
                compiler_params=CP,
            )(q, kv)

        return run

    if name == "xla":
        return lambda q, kv: A._xla_mha_bld(q, kv[..., :D], kv[..., D:], H, False)

    raise SystemExit(f"unknown variant {name}")


def tower_ablation(iters: int, arch: str = "l14@336") -> None:
    """Whole-tower encode (bf16, carry-chained) under three attention
    configurations — the identity-attention method behind
    docs/performance.md's measured-ceiling argument: replacing the attention
    core with `out = v` (both projections kept) measures the non-attention
    floor directly, so `real - identity` is the kernel's true in-tower marginal
    cost and `identity + layers * dot_floor` is the perfect-kernel ceiling.
    ``--arch l14`` runs the plain ViT-L/14 tower (batch 64, 224px, whole-block
    kernel) instead of the default L/14@336 (batch 32, q-tiled kernel)."""
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip import model as clip_model
    from anomalyclip_tpu.models.clip.model import CLIPConfig, encode_image, init_clip_params

    if arch == "l14":
        cfg, batch, img = CLIPConfig.vit_l14(), 64, 224
    else:
        cfg, batch, img = CLIPConfig.vit_l14_336(), 32, 336
    seq = (img // cfg.vision_patch_size) ** 2 + 1
    width = cfg.vision_width
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.asarray(x).dtype == jnp.float32
        else jnp.asarray(x),
        params,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((batch, img, img, 3)), jnp.bfloat16)

    real_mha = clip_model.multi_head_attention

    def identity_mha(x, attn, num_heads, causal=False):
        d = x.shape[-1]
        qkv = x @ attn["qkv_w"] + attn["qkv_b"]
        return qkv[..., 2 * d :] @ attn["out_w"] + attn["out_b"]

    def bench_tower(tag: str) -> float:
        @jax.jit
        def step(p, f, carry):
            # fold-proof dependency: splice the carry value into one pixel
            f = jax.lax.dynamic_update_slice(
                f, carry.astype(f.dtype).reshape(1, 1, 1, 1), (0, 0, 0, 0)
            )
            out = encode_image(p, cfg, f, compute_dtype=jnp.bfloat16)
            return out[0, 0].astype(jnp.float32)

        carry = jnp.zeros((), jnp.float32)
        float(step(params, frames, carry))
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(params, frames, carry)
        float(carry)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:18s} {ms:8.2f} ms/iter  {batch / ms * 1e3:6.1f} fps")
        return ms

    real = bench_tower("tower(fused)")
    clip_model.multi_head_attention = identity_mha
    try:
        ident = bench_tower("tower(identity)")
    finally:
        clip_model.multi_head_attention = real_mha
    with clip_model.attention_impl("xla"):
        bench_tower("tower(xla)")

    marginal = (real - ident) / cfg.vision_layers
    # Per-layer attention-dot floor at the measured batch: 2 matmuls (QK^T and
    # PV) x 2 FLOPs/MAC x B x L^2 x D = 4*B*L^2*D FLOPs, over the MXU's bf16
    # peak derated to 50% because both matmuls contract/emit dh=64 wide vs the
    # 128-lane MXU (<=50% fill is intrinsic to dh=64). `real`/`ident` above are
    # full-batch wall times, so the floor must count full-batch FLOPs too.
    dot_floor = 4 * batch * seq * seq * width / (197e12 * 0.5) * 1e3
    perfect = ident + cfg.vision_layers * dot_floor
    print(f"attention marginal: {marginal:0.3f} ms/layer "
          f"(dot floor {dot_floor:0.3f}); perfect-kernel ceiling "
          f"{perfect:0.2f} ms/iter = {batch / perfect * 1e3:0.1f} fps")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="qtile,qtile-lq120,twopass,nosoftmax")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--check", action="store_true", help="verify vs XLA first")
    ap.add_argument("--tower", action="store_true", help="whole-tower ablation")
    ap.add_argument("--arch", default="l14@336", choices=("l14", "l14@336"),
                    help="tower for --tower (isolated variants are @336-only)")
    ap.add_argument("--seq", type=int, default=0,
                    help="override L for the isolated variants — the "
                         "lane-alignment ablation (VERDICT r4 item 5): run the "
                         "same B/D/dh at a synthetic lane-aligned L (576/640) "
                         "to split the prime-L=577 tax from the softmax residue")
    args = ap.parse_args()

    if args.seq:
        global L
        L = args.seq

    if args.tower:
        tower_ablation(max(5, args.iters // 3), args.arch)
        return

    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.ops.pallas import attention as A

    q, kv = _inputs()
    ref = None
    if args.check:
        ref = np.asarray(
            A._xla_mha_bld(q.astype(jnp.float32), kv[..., :D].astype(jnp.float32),
                           kv[..., D:].astype(jnp.float32), H, False)
        )

    for name in args.variants.split(","):
        name = name.strip()
        try:
            fn = make_variant(name)
            if ref is not None and name not in ("nosoftmax",):
                got = np.asarray(jax.jit(fn)(q, kv), np.float32)
                err = np.abs(got - ref).max()
                assert err < 0.05, f"{name}: max err {err}"
            ms = _bench(fn, q, kv, args.iters)
            print(f"{name:18s} {ms:7.3f} ms/layer")
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
