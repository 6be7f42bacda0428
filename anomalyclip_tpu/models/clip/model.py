"""CLIP ViT + text transformer as pure JAX functions over parameter pytrees.

Re-design of the reference's vendored OpenAI CLIP (reference:
src/models/components/clip/model.py:174-430) for TPU:

- Parameters are plain pytrees; every transformer's per-layer weights are stacked on
  a leading ``layers`` axis and applied with ``lax.scan`` — one compiled block body
  regardless of depth (fast XLA compiles, clean pjit sharding).
- The patch embedding is an unfold + matmul rather than a conv, which maps directly
  onto the MXU with no layout shuffles.
- Numerics: LayerNorm and softmax always run in float32 (matching the reference's
  fp32 LayerNorm, model.py:174-180); matmuls run in ``compute_dtype`` (float32 for
  checkpoint parity, bfloat16 for peak MXU throughput).
- QuickGELU (``x * sigmoid(1.702 x)``) matches model.py:183-185 exactly — standard
  GELU silently degrades checkpoint parity.

Both visual towers are implemented: the ViT (used by every reference config,
ViT-B/16) lives here, and the ModifiedResNet tower (reference model.py:10-171,
config-reachable via RN50-style checkpoints) lives in ``resnet.py`` and is wired
through ``encode_image`` below.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def matmul_precision_for(compute_dtype) -> contextlib.AbstractContextManager:
    """Pin XLA matmul precision to the numerics policy.

    JAX's default matmul precision truncates fp32 operands (bf16-like passes) on
    accelerator-style backends; that breaks checkpoint parity silently. fp32 compute
    gets "highest" (true fp32 MXU passes); bf16 compute keeps the fast default.
    """
    if jnp.dtype(compute_dtype) == jnp.float32:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    # int -> ViT depth; tuple -> ModifiedResNet stage depths (model.py:477-487)
    vision_layers: Any = 12
    vision_width: int = 768
    vision_patch_size: Optional[int] = 16  # None -> ModifiedResNet tower
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_resnet(self) -> bool:
        return self.vision_patch_size is None

    @property
    def vision_heads(self) -> int:
        if self.is_resnet:
            return self.vision_width * 32 // 64  # model.py:300-309
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @staticmethod
    def vit_b16() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def vit_b32() -> "CLIPConfig":
        return CLIPConfig(vision_patch_size=32)

    @staticmethod
    def vit_l14() -> "CLIPConfig":
        return CLIPConfig(
            embed_dim=768,
            vision_layers=24,
            vision_width=1024,
            vision_patch_size=14,
            transformer_width=768,
            transformer_heads=12,
        )

    @staticmethod
    def vit_l14_336() -> "CLIPConfig":
        return dataclasses.replace(CLIPConfig.vit_l14(), image_resolution=336)

    @staticmethod
    def rn50() -> "CLIPConfig":
        return CLIPConfig(
            embed_dim=1024,
            vision_layers=(3, 4, 6, 3),
            vision_width=64,
            vision_patch_size=None,
        )

    @staticmethod
    def tiny(vocab_size: int = 49408) -> "CLIPConfig":
        """A small stand-in config for tests and the synthetic experiment."""
        return CLIPConfig(
            embed_dim=64,
            image_resolution=32,
            vision_layers=2,
            vision_width=64,
            vision_patch_size=16,
            context_length=77,
            vocab_size=vocab_size,
            transformer_width=64,
            transformer_heads=4,
            transformer_layers=2,
        )


# ---------------------------------------------------------------------------
# Numeric primitives
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """LayerNorm over the last axis, always computed in float32 (model.py:174-180)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


_ATTENTION_IMPL = "auto"  # "auto" | "xla" | "pallas"
_ATTENTION_IMPL_SCOPED: list = []  # attention_impl() stack; beats env + global


def set_attention_impl(impl: str) -> None:
    """Select the attention core: "xla" (einsum path), "pallas" (fused VMEM
    kernel, see ops/pallas/attention.py), or "auto" (pallas on TPU backends).
    Env var ANOMALYCLIP_ATTN_IMPL overrides this global; a scoped
    attention_impl() context overrides both."""
    global _ATTENTION_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _ATTENTION_IMPL = impl


def _attention_impl() -> str:
    import os

    if _ATTENTION_IMPL_SCOPED:
        impl = _ATTENTION_IMPL_SCOPED[-1]
    else:
        impl = os.environ.get("ANOMALYCLIP_ATTN_IMPL", _ATTENTION_IMPL)
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


@contextlib.contextmanager
def attention_impl(impl: str):
    """Scoped attention-core override — takes precedence over both the global
    and the ANOMALYCLIP_ATTN_IMPL env var (callers use it as a *requirement*,
    not a preference: the tensor-parallel path must keep pallas_call out of the
    partitioned jit because it has no GSPMD partitioning rule). The selection is
    read at trace time, so wrapping the *body* of a jitted function pins the
    impl across retraces."""
    assert impl in ("auto", "xla", "pallas"), impl
    _ATTENTION_IMPL_SCOPED.append(impl)
    try:
        yield
    finally:
        _ATTENTION_IMPL_SCOPED.pop()


def attention_core(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool = False
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(dh)) v over (B, H, L, Dh); fp32 softmax either way."""
    if _attention_impl() == "pallas":
        from anomalyclip_tpu.ops.pallas.attention import fused_attention

        return fused_attention(q, k, v, causal=causal)
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(head_dim))
    if causal:
        l = q.shape[2]
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def multi_head_attention(
    x: jnp.ndarray,
    attn: Params,
    num_heads: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Batched MHA over (B, L, D); softmax in fp32.

    Weight layout: ``qkv_w`` is (D, 3D) (the transpose of torch's in_proj_weight so
    the hot path is a plain right-matmul), ``out_w`` is (D, D).

    On TPU the fused (B, L, D) Pallas kernel (ops/pallas/attention.py:
    fused_mha_bld) is used when the shape fits: q/k/v are consumed as contiguous
    lane-slices of the qkv projection, heads split inside VMEM, and neither the
    per-head transposes nor the (B, H, L, L) score tensor ever reach HBM — the
    dominant cost of the XLA formulation (measured +37% full-encode throughput at
    ViT-B/16 batch 256 on v5e).
    """
    b, l, d = x.shape
    rung = attention_rung(b, l, d, num_heads, x.dtype.itemsize, causal)
    if rung == "qtile":
        # project q and packed k|v as two GEMMs straight from x: slicing one
        # packed (B, L, 3D) projection instead materializes copies (measured
        # -5% full-encode at ViT-L/14@336, the rung's one production shape)
        q = x @ attn["qkv_w"][:, :d] + attn["qkv_b"][:d]
        kv = x @ attn["qkv_w"][:, d:] + attn["qkv_b"][d:]
        from anomalyclip_tpu.ops.pallas.attention import fused_mha_qtile

        out = fused_mha_qtile(q, kv, num_heads)
    else:
        qkv = x @ attn["qkv_w"] + attn["qkv_b"]
        out = _attention_apply_rung(rung, qkv, num_heads, causal)
    return out @ attn["out_w"] + attn["out_b"]


def attention_rung(
    b: int, l: int, d: int, num_heads: int, itemsize: int, causal: bool
) -> str:
    """THE kernel dispatch ladder, in one place for every attention caller
    (fp multi_head_attention and the int8 tower's attention_from_qkv): which
    rung serves this shape — "mha" (fused whole-block kernel), "qtile"
    (q-tiled resident-KV kernel, e.g. ViT-L/14@336's L=577), or "core"
    (split-heads attention_core, which itself falls back flash -> XLA)."""
    if _attention_impl() == "pallas":
        from anomalyclip_tpu.ops.pallas.attention import (
            mha_eligible,
            mha_qtile_eligible,
        )

        if mha_eligible(b, l, d, num_heads, itemsize):
            return "mha"
        if not causal and mha_qtile_eligible(b, l, d, num_heads, itemsize):
            return "qtile"
    return "core"


def _attention_apply_rung(
    rung: str, qkv: jnp.ndarray, num_heads: int, causal: bool
) -> jnp.ndarray:
    """Run the chosen rung over a packed (B, L, 3D) qkv projection."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    head_dim = d // num_heads

    if rung == "mha":
        from anomalyclip_tpu.ops.pallas.attention import fused_mha_qkv

        return fused_mha_qkv(qkv, num_heads, causal)
    if rung == "qtile":
        from anomalyclip_tpu.ops.pallas.attention import fused_mha_qtile

        return fused_mha_qtile(qkv[..., :d], qkv[..., d:], num_heads)

    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)

    out = attention_core(split_heads(q), split_heads(k), split_heads(v), causal)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d)


def attention_from_qkv(qkv: jnp.ndarray, num_heads: int, causal: bool = False) -> jnp.ndarray:
    """The attention core over a packed (B, L, 3D) qkv projection -> (B, L, D),
    dispatched through the same attention_rung ladder as the fp path. For
    callers that own the projections — the int8 serving tower
    (models/clip/quant.py) projects with int8 GEMMs and must keep kernel
    coverage on shapes where only the qtile/flash rungs fit."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    rung = attention_rung(b, l, d, num_heads, qkv.dtype.itemsize, causal)
    return _attention_apply_rung(rung, qkv, num_heads, causal)


def _block_apply(x: jnp.ndarray, blk: Params, num_heads: int, causal: bool) -> jnp.ndarray:
    """One pre-LN residual attention block (model.py:188-217)."""
    h = layer_norm(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    x = x + multi_head_attention(h, blk["attn"], num_heads, causal)
    h = layer_norm(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = quick_gelu(h @ blk["mlp"]["fc_w"] + blk["mlp"]["fc_b"])
    x = x + (h @ blk["mlp"]["proj_w"] + blk["mlp"]["proj_b"])
    return x


def transformer_apply(
    x: jnp.ndarray, blocks: Params, num_heads: int, causal: bool = False
) -> jnp.ndarray:
    """Apply a stack of residual blocks (leading ``layers`` axis) via lax.scan.

    Weights are cast to the activation dtype so a bfloat16 activation stream stays
    bfloat16 end-to-end (LayerNorm still computes in fp32 internally).
    """
    blocks = jax.tree_util.tree_map(lambda w: w.astype(x.dtype), blocks)

    def body(carry, blk):
        return _block_apply(carry, blk, num_heads, causal), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, 3) NHWC images -> (B, N_patches, 3*patch*patch) with the channel-major
    per-patch ordering of a torch Conv2d kernel flatten (weight[o, c, kh, kw])."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    # -> (B, gh, gw, c, ph, pw): channel-major within the patch
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * patch * patch)


def normalize_frames_on_device(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB (..., H, W, 3) -> CLIP-normalized float32, inside the jit.

    The exact fp32 arithmetic of data/sources.normalize_frames (same constants,
    same op order), so a uint8 ingest path scores bit-identically to host
    normalization — but the host->device transfer carries 1/4 the bytes and the
    normalize rides the TPU VPU fused into the encode graph instead of burning
    host cycles (reference preprocesses to float on the host via torchvision,
    src/utils/augmentations.py:21-34)."""
    from anomalyclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    return (images.astype(jnp.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Visual forward: (B, H, W, 3) NHWC -> (B, embed_dim). ViT (model.py:266-290)
    or ModifiedResNet (model.py:159-171) depending on the config. uint8 input is
    CLIP-normalized on device (normalize_frames_on_device)."""
    if images.dtype == jnp.uint8:
        images = normalize_frames_on_device(images)
    with matmul_precision_for(compute_dtype):
        if cfg.is_resnet:
            from anomalyclip_tpu.models.clip.resnet import resnet_encode_image

            return resnet_encode_image(
                params["visual"], images, cfg.vision_heads, compute_dtype
            )
        return _encode_image(params, cfg, images, compute_dtype)


def _encode_image(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    compute_dtype: jnp.dtype,
) -> jnp.ndarray:
    visual = params["visual"]
    x = patchify(images.astype(compute_dtype), cfg.vision_patch_size)
    x = x @ visual["patch_embed"].astype(compute_dtype)  # (B, N, width)

    b = x.shape[0]
    cls = jnp.broadcast_to(
        visual["class_embedding"].astype(compute_dtype), (b, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + visual["positional_embedding"].astype(compute_dtype)
    x = layer_norm(x, visual["ln_pre"]["scale"], visual["ln_pre"]["bias"])

    x = transformer_apply(x, visual["blocks"], cfg.vision_heads)

    x = layer_norm(x[:, 0, :], visual["ln_post"]["scale"], visual["ln_post"]["bias"])
    return x @ visual["proj"].astype(compute_dtype)


def text_transformer_on_embeddings(
    params: Params,
    cfg: CLIPConfig,
    embeddings: jnp.ndarray,
    eot_indices: jnp.ndarray,
    text_projection: Optional[jnp.ndarray] = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Text transformer over pre-built token embeddings, skipping the embedding
    lookup (reference: src/models/components/text_encoder.py:14-25 — the CoOp path
    feeds learned context vectors directly).

    Args:
        embeddings: (N, context_length, width) prompt embeddings.
        eot_indices: (N,) position of the EOT token per prompt (argmax of token ids).
        text_projection: overrides params["text"]["text_projection"]; in AnomalyCLIP
            this matrix is trainable (anomaly_clip_module.py:72) and lives in the
            trainable pytree.
    """
    with matmul_precision_for(compute_dtype):
        return _text_on_embeddings(
            params, cfg, embeddings, eot_indices, text_projection, compute_dtype
        )


def _text_on_embeddings(
    params: Params,
    cfg: CLIPConfig,
    embeddings: jnp.ndarray,
    eot_indices: jnp.ndarray,
    text_projection: Optional[jnp.ndarray],
    compute_dtype: jnp.dtype,
) -> jnp.ndarray:
    text = params["text"]
    x = embeddings.astype(compute_dtype) + text["positional_embedding"].astype(compute_dtype)
    x = transformer_apply(x, text["blocks"], cfg.transformer_heads, causal=True)
    x = layer_norm(x, text["ln_final"]["scale"], text["ln_final"]["bias"])
    x = jnp.take_along_axis(x, eot_indices[:, None, None], axis=1)[:, 0, :]
    proj = text_projection if text_projection is not None else text["text_projection"]
    return x @ proj.astype(compute_dtype)


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    tokens: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Text forward from token ids: (N, 77) int32 -> (N, embed_dim)
    (model.py:401-414; identical math to the reference's TextEncoderZeroshot,
    text_encoder.py:28-50 — parity pinned in tests/test_full_pipeline_oracle.py)."""
    embeddings = params["text"]["token_embedding"][tokens]
    eot_indices = jnp.argmax(tokens, axis=-1)
    return text_transformer_on_embeddings(
        params, cfg, embeddings, eot_indices, compute_dtype=compute_dtype
    )


def clip_similarity(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    tokens: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive logits (model.py:416-430); provided for CLIP API completeness."""
    image_features = encode_image(params, cfg, images, compute_dtype)
    text_features = encode_text(params, cfg, tokens, compute_dtype)
    image_features = image_features / jnp.linalg.norm(image_features, axis=1, keepdims=True)
    text_features = text_features / jnp.linalg.norm(text_features, axis=1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * image_features @ text_features.T
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# Initialization (reference init distributions, model.py:352-384)
# ---------------------------------------------------------------------------


def _init_blocks(key: jax.Array, layers: int, width: int) -> Params:
    """Stacked residual-block params with CLIP's init scheme."""
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    keys = jax.random.split(key, 4)

    def normal(k, shape, std):
        return jax.random.normal(k, shape, dtype=jnp.float32) * std

    return {
        "ln_1": {
            "scale": jnp.ones((layers, width)),
            "bias": jnp.zeros((layers, width)),
        },
        "attn": {
            "qkv_w": normal(keys[0], (layers, width, 3 * width), attn_std),
            "qkv_b": jnp.zeros((layers, 3 * width)),
            "out_w": normal(keys[1], (layers, width, width), proj_std),
            "out_b": jnp.zeros((layers, width)),
        },
        "ln_2": {
            "scale": jnp.ones((layers, width)),
            "bias": jnp.zeros((layers, width)),
        },
        "mlp": {
            "fc_w": normal(keys[2], (layers, width, 4 * width), fc_std),
            "fc_b": jnp.zeros((layers, 4 * width)),
            "proj_w": normal(keys[3], (layers, 4 * width, width), proj_std),
            "proj_b": jnp.zeros((layers, width)),
        },
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    """Random CLIP params matching the reference's initialize_parameters
    distributions — used for tests and the synthetic experiment; real runs load
    converted OpenAI weights."""
    kv, kt, k_emb, k_pos, k_cls, k_vpos, k_patch, k_proj, k_tp = jax.random.split(key, 9)
    if cfg.is_resnet:
        from anomalyclip_tpu.models.clip.resnet import init_resnet_params

        visual = init_resnet_params(kv, cfg)
        return {
            "visual": visual,
            "text": _init_text_params(cfg, kt, k_emb, k_pos, k_tp),
            "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype=jnp.float32),
        }
    width = cfg.vision_width
    scale = width**-0.5
    n_patches = cfg.grid_size**2

    visual = {
        "patch_embed": jax.random.normal(
            k_patch, (3 * cfg.vision_patch_size**2, width), dtype=jnp.float32
        )
        * scale,
        "class_embedding": scale * jax.random.normal(k_cls, (width,), dtype=jnp.float32),
        "positional_embedding": scale
        * jax.random.normal(k_vpos, (n_patches + 1, width), dtype=jnp.float32),
        "ln_pre": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "blocks": _init_blocks(kv, cfg.vision_layers, width),
        "ln_post": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "proj": scale * jax.random.normal(k_proj, (width, cfg.embed_dim), dtype=jnp.float32),
    }
    return {
        "visual": visual,
        "text": _init_text_params(cfg, kt, k_emb, k_pos, k_tp),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype=jnp.float32),
    }


def _init_text_params(cfg: CLIPConfig, kt, k_emb, k_pos, k_tp) -> Params:
    tw = cfg.transformer_width
    return {
        "token_embedding": 0.02
        * jax.random.normal(k_emb, (cfg.vocab_size, tw), dtype=jnp.float32),
        "positional_embedding": 0.01
        * jax.random.normal(k_pos, (cfg.context_length, tw), dtype=jnp.float32),
        "blocks": _init_blocks(kt, cfg.transformer_layers, tw),
        "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
        "text_projection": (tw**-0.5)
        * jax.random.normal(k_tp, (tw, cfg.embed_dim), dtype=jnp.float32),
    }
