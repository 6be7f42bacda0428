"""Int8 (W8A8) serving path for the frozen CLIP visual tower.

The bf16 encoder is measured at 90-94% of the v5e MXU's bf16 peak with a
proven ~4,217 fps ViT-B/16 ceiling (docs/performance.md). The only lever past
that ceiling is precision: the v5e MXU runs int8xint8->int32 at 2x the bf16
rate (394 TOPS). This module quantizes the tower's six GEMM weight families
(patch embed, per-block qkv/out/fc/proj, final projection) to int8 with
per-output-channel symmetric scales, and quantizes activations dynamically
per token (per-row abs-max) at each GEMM — the W8A8 recipe that holds ViT
features to high fidelity in practice. Everything else (LayerNorms, biases,
residual stream, attention core) stays in bf16/fp32 exactly as the bf16 path:
attention is 15% of time and dominated by the dh=64 shape, not precision.

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
import numpy as np

from anomalyclip_tpu.models.clip.model import (
    CLIPConfig,
    layer_norm,
    patchify,
    quick_gelu,
)

Params = Dict[str, Any]


def quantize_weight(w: np.ndarray) -> Params:
    """Per-output-channel symmetric int8 quantization of a (..., in, out) weight
    (stacked block weights keep their leading ``layers`` axis)."""
    w = np.asarray(w, np.float32)
    scale = np.max(np.abs(w), axis=-2, keepdims=True) / 127.0  # (..., 1, out)
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "scale": scale[..., 0, :].astype(np.float32)}


def int8_linear(x: jnp.ndarray, qlin: Params, bias=None) -> jnp.ndarray:
    """y = dequant(quant(x) @ w_q) + bias, activations quantized per token.

    x: (..., in) bf16/f32 -> (..., out) in x.dtype. The matmul runs
    int8 x int8 -> int32 on the MXU; scales apply as one fused multiply.
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
    return y.astype(out_dtype)


def quantize_clip_visual(params: Params) -> Params:
    """fp32 visual tower -> int8 tower (same tree shape; GEMM weights replaced
    by {w_q, scale} nodes, everything else passed through as fp32)."""
    visual = params["visual"]
    blocks = visual["blocks"]
    return {
        "patch_embed": quantize_weight(visual["patch_embed"]),
        "class_embedding": np.asarray(visual["class_embedding"], np.float32),
        "positional_embedding": np.asarray(visual["positional_embedding"], np.float32),
        "ln_pre": jax.tree_util.tree_map(np.asarray, visual["ln_pre"]),
        "blocks": {
            "ln_1": jax.tree_util.tree_map(np.asarray, blocks["ln_1"]),
            "ln_2": jax.tree_util.tree_map(np.asarray, blocks["ln_2"]),
            "attn": {
                "qkv": quantize_weight(blocks["attn"]["qkv_w"]),
                "qkv_b": np.asarray(blocks["attn"]["qkv_b"], np.float32),
                "out": quantize_weight(blocks["attn"]["out_w"]),
                "out_b": np.asarray(blocks["attn"]["out_b"], np.float32),
            },
            "mlp": {
                "fc": quantize_weight(blocks["mlp"]["fc_w"]),
                "fc_b": np.asarray(blocks["mlp"]["fc_b"], np.float32),
                "proj": quantize_weight(blocks["mlp"]["proj_w"]),
                "proj_b": np.asarray(blocks["mlp"]["proj_b"], np.float32),
            },
        },
        "ln_post": jax.tree_util.tree_map(np.asarray, visual["ln_post"]),
        "proj": quantize_weight(visual["proj"]),
    }


def _attention_bf16(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """The bf16 attention core over the packed (B, L, 3D) projection — same
    dispatch ladder as the bf16 path (model.py:multi_head_attention), minus the
    projections which are int8 here."""
    from anomalyclip_tpu.models.clip.model import _attention_impl
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_qkv, mha_eligible

    b, l, d3 = qkv.shape
    d = d3 // 3
    if _attention_impl() == "pallas" and mha_eligible(b, l, d, num_heads, qkv.dtype.itemsize):
        return fused_mha_qkv(qkv, num_heads, False)
    from anomalyclip_tpu.ops.pallas.attention import _xla_mha_bld

    return _xla_mha_bld(
        qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :], num_heads, False
    )


def _block_apply_q(x: jnp.ndarray, blk: Params, num_heads: int) -> jnp.ndarray:
    h = layer_norm(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    qkv = int8_linear(h, blk["attn"]["qkv"], blk["attn"]["qkv_b"])
    attn = _attention_bf16(qkv, num_heads)
    x = x + int8_linear(attn, blk["attn"]["out"], blk["attn"]["out_b"])
    h = layer_norm(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = quick_gelu(int8_linear(h, blk["mlp"]["fc"], blk["mlp"]["fc_b"]))
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
    stays on the fp path)."""
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
