"""Int8 (W8A8) serving path for the frozen CLIP visual tower.

The bf16 encoder is measured at 90-94% of the v5e MXU's bf16 peak with a
proven ~4,217 fps ViT-B/16 ceiling (docs/performance.md). The only lever past
that ceiling is precision: the v5e MXU's nominal int8xint8->int32 rate is 2x
bf16 (394 TOPS). This module quantizes the tower's six GEMM weight families
(patch embed, per-block qkv/out/fc/proj, final projection) to int8 with
per-output-channel symmetric scales, and quantizes activations dynamically
per token (per-row abs-max) at each GEMM — the W8A8 recipe that holds ViT
features to high fidelity in practice. Everything else (LayerNorms, biases,
residual stream, attention core) stays in bf16/fp32 exactly as the bf16 path:
attention is 15% of time and dominated by the dh=64 shape, not precision.

MEASURED CAVEAT (v5e, 2026-08-17): the int8 MXU's nominal 2x is NOT reachable
through today's XLA/Mosaic. Four formulations were measured at the tower's
hot shapes — XLA W8A8 (this module), a bare XLA int8 dot, a fully fused
Pallas quantize-GEMM (in-VMEM quantize, resident int8 weight, in-register
dequant/GELU epilogue; block sizes swept 128-1024), and a hybrid Pallas-
quantize + XLA-dot split — and every one computes at roughly the bf16 MXU
rate (~60-209 TOP/s across harnesses, never above 1.3x the same harness's
bf16 reading and mostly at parity with it), so the
quantization overhead has nothing to pay for it: end-to-end int8 encode is
3,837 fps (XLA, ~5% SLOWER than bf16's 4,044-4,059) and 2,918 fps (fused
Pallas kernel — since deleted). Enable for throughput only after
re-measuring on your hardware/toolchain; see docs/performance.md "Past the
bf16 ceiling" for the full numbers.

Opt-in and serving-only: training and parity paths never touch this module.
Feature fidelity must be validated against the fp32 encoder for a given
checkpoint (tests assert the mechanism's error bounds; the released
checkpoints are unreachable offline — see BASELINE.md).

No reference counterpart (the reference is fp32-only); cited against our own
models/clip/model.py whose layer structure this mirrors exactly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from anomalyclip_tpu.models.clip.model import (
    CLIPConfig,
    attention_from_qkv,
    layer_norm,
    matmul_precision_for,
    patchify,
    quick_gelu,
)

Params = Dict[str, Any]


def quantize_weight(w) -> Params:
    """Per-output-channel symmetric int8 quantization of a (..., in, out) weight
    (stacked block weights keep their leading ``layers`` axis)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0  # (..., 1, out)
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.rint(w / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale[..., 0, :]}


def int8_linear(x: jnp.ndarray, qlin: Params, bias=None, gelu: bool = False) -> jnp.ndarray:
    """y = dequant(quant(x) @ w_q) + bias [-> QuickGELU], activations quantized
    per token.

    x: (..., in) bf16/f32 -> (..., out) in x.dtype. The matmul runs
    int8 x int8 -> int32; scales apply as one fused multiply, and ``gelu``
    folds the fc GEMM's QuickGELU into the same f32 epilogue before the cast.
    Deliberately the plain XLA formulation: a fused Pallas W8A8 kernel
    (in-VMEM quantize -> MXU int8 dot -> in-register dequant), a hybrid
    Pallas-quantize + XLA-dot split, and block-size sweeps were all measured
    SLOWER on v5e — Mosaic's int8 dot plateaus at ~70-80 TOP/s, at or below
    the bf16 MXU rate; see docs/performance.md "Past the bf16 ceiling".
    """
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    x_q = jnp.clip(jnp.rint(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, qlin["w_q"], (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * x_scale * qlin["scale"].astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if gelu:
        y = quick_gelu(y)
    return y.astype(out_dtype)


@jax.jit
def _quantize_visual_tree(visual: Params) -> Params:
    f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t
    )
    blocks = visual["blocks"]
    return {
        "patch_embed": quantize_weight(visual["patch_embed"]),
        "class_embedding": f32(visual["class_embedding"]),
        "positional_embedding": f32(visual["positional_embedding"]),
        "ln_pre": f32(visual["ln_pre"]),
        "blocks": {
            "ln_1": f32(blocks["ln_1"]),
            "ln_2": f32(blocks["ln_2"]),
            "attn": {
                "qkv": quantize_weight(blocks["attn"]["qkv_w"]),
                "qkv_b": f32(blocks["attn"]["qkv_b"]),
                "out": quantize_weight(blocks["attn"]["out_w"]),
                "out_b": f32(blocks["attn"]["out_b"]),
            },
            "mlp": {
                "fc": quantize_weight(blocks["mlp"]["fc_w"]),
                "fc_b": f32(blocks["mlp"]["fc_b"]),
                "proj": quantize_weight(blocks["mlp"]["proj_w"]),
                "proj_b": f32(blocks["mlp"]["proj_b"]),
            },
        },
        "ln_post": f32(visual["ln_post"]),
        "proj": quantize_weight(visual["proj"]),
    }


def quantize_clip_visual(params: Params) -> Params:
    """fp32 visual tower -> int8 tower (same tree shape; GEMM weights replaced
    by {w_q, scale} nodes, everything else passed through as fp32).

    Runs as ONE jitted tree->tree pass so quantization happens where the
    weights live: host-numpy callers (train/module.py) pay a single H2D
    transfer, and device-resident callers (bench.py, whose params sit on the
    remote TPU) never round-trip through the host — eager per-leaf numpy here
    cost ~150 s of tunnel traffic for ViT-B/16."""
    return _quantize_visual_tree(params["visual"])


def _block_apply_q(x: jnp.ndarray, blk: Params, num_heads: int) -> jnp.ndarray:
    h = layer_norm(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    qkv = int8_linear(h, blk["attn"]["qkv"], blk["attn"]["qkv_b"])
    # the fp attention core with the *full* dispatch ladder (whole-block ->
    # qtile -> flash/XLA) — only the projections around it are int8
    attn = attention_from_qkv(qkv, num_heads)
    x = x + int8_linear(attn, blk["attn"]["out"], blk["attn"]["out_b"])
    h = layer_norm(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = int8_linear(h, blk["mlp"]["fc"], blk["mlp"]["fc_b"], gelu=True)
    x = x + int8_linear(h, blk["mlp"]["proj"], blk["mlp"]["proj_b"])
    return x


def encode_image_int8(
    qvisual: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Visual forward with int8 GEMMs: (B, H, W, 3) NHWC -> (B, embed_dim).
    Mirrors model.py:_encode_image layer for layer; ViT only (the RN family
    stays on the fp path). compute_dtype governs the non-GEMM compute exactly
    as in encode_image — incl. the highest-precision matmul mode for fp32
    (model.py:37-42: the TPU default silently truncates fp32 operands).
    uint8 input is CLIP-normalized on device, exactly like encode_image."""
    if images.dtype == jnp.uint8:
        from anomalyclip_tpu.models.clip.model import normalize_frames_on_device

        images = normalize_frames_on_device(images)
    with matmul_precision_for(compute_dtype):
        return _encode_image_int8(qvisual, cfg, images, compute_dtype)


def _encode_image_int8(
    qvisual: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    compute_dtype: jnp.dtype,
) -> jnp.ndarray:
    dtype = jnp.dtype(compute_dtype)
    x = patchify(images.astype(dtype), cfg.vision_patch_size)
    x = int8_linear(x, qvisual["patch_embed"])

    b = x.shape[0]
    cls = jnp.broadcast_to(
        qvisual["class_embedding"].astype(dtype), (b, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + qvisual["positional_embedding"].astype(dtype)
    x = layer_norm(x, qvisual["ln_pre"]["scale"], qvisual["ln_pre"]["bias"])

    def body(carry, blk):
        return _block_apply_q(carry, blk, cfg.vision_heads), None

    # int8 weights must NOT be cast to the activation dtype (unlike the bf16
    # path's transformer_apply); scan consumes the stacked tree as-is
    blocks = jax.tree_util.tree_map(jnp.asarray, qvisual["blocks"])
    x, _ = jax.lax.scan(body, x, blocks)

    x = layer_norm(x[:, 0, :], qvisual["ln_post"]["scale"], qvisual["ln_post"]["bias"])
    return int8_linear(x, qvisual["proj"])
