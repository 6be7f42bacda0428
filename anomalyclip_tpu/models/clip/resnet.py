"""CLIP's ModifiedResNet visual tower as pure JAX functions (NHWC).

Completes the CLIP-architecture surface (reference: src/models/components/clip/
model.py:10-171 — Bottleneck with anti-aliased strided convs, 3-conv stem with
avgpool, QKV AttentionPool2d head; build_model reconstructs it from RN-shaped
state dicts, model.py:477-487). Every AnomalyCLIP config uses ViT-B/16, so this
tower exists for checkpoint/API completeness: RN-family CLIP checkpoints convert
and evaluate through the same ``encode_image`` entry point.

Inference-only by design: the image encoder is frozen in AnomalyCLIP
(anomaly_clip_module.py:67-69), so BatchNorm applies the checkpoint's running
statistics (eval mode); there is no train-mode BN here.

Layout: NHWC activations, HWIO conv kernels — the TPU-native convention; the
converter transposes torch's OIHW weights once at load.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _bn_eval(x: jnp.ndarray, bn: Params, eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm2d in eval mode over the channel (last) axis."""
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    scale = (bn["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (
        bn["bias"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * bn["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + bias


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avgpool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 1:
        return x
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    )
    return summed / (k * k)


def _bottleneck(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    """Anti-aliased bottleneck (model.py:10-68): all convs stride 1; when the block
    downsamples, an avgpool runs after conv2 and prepends the shortcut conv.
    ``stride`` is static (from the block's position in the architecture), never a
    pytree leaf — it shapes the compiled graph."""
    out = jax.nn.relu(_bn_eval(_conv(x, p["conv1_w"]), p["bn1"]))
    out = jax.nn.relu(_bn_eval(_conv(out, p["conv2_w"], padding=1), p["bn2"]))
    out = _avgpool(out, stride)
    out = _bn_eval(_conv(out, p["conv3_w"]), p["bn3"])
    if "down_conv_w" in p:
        identity = _bn_eval(_conv(_avgpool(x, stride), p["down_conv_w"]), p["down_bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(x: jnp.ndarray, p: Params, num_heads: int) -> jnp.ndarray:
    """QKV attention pooling (model.py:71-110): mean token queries all spatial
    tokens; separate q/k/v projections; softmax in fp32."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)[None]

    dh = c // num_heads
    q = tokens[:, :1] @ p["q_w"].astype(tokens.dtype) + p["q_b"].astype(tokens.dtype)
    k = tokens @ p["k_w"].astype(tokens.dtype) + p["k_b"].astype(tokens.dtype)
    v = tokens @ p["v_w"].astype(tokens.dtype) + p["v_b"].astype(tokens.dtype)

    def heads(t):
        return t.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores * (1.0 / math.sqrt(dh)), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return out @ p["c_w"].astype(out.dtype) + p["c_b"].astype(out.dtype)


def resnet_encode_image(
    visual: Params,
    images: jnp.ndarray,
    num_heads: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, H, W, 3) NHWC -> (B, output_dim) through the ModifiedResNet
    (model.py:159-171: stem -> layer1..4 -> attnpool)."""
    x = images.astype(compute_dtype)
    stem = visual["stem"]
    x = jax.nn.relu(_bn_eval(_conv(x, stem["conv1_w"], stride=2, padding=1), stem["bn1"]))
    x = jax.nn.relu(_bn_eval(_conv(x, stem["conv2_w"], padding=1), stem["bn2"]))
    x = jax.nn.relu(_bn_eval(_conv(x, stem["conv3_w"], padding=1), stem["bn3"]))
    x = _avgpool(x, 2)
    for li, layer_name in enumerate(("layer1", "layer2", "layer3", "layer4")):
        for bi, block in enumerate(visual[layer_name]):
            # layers 2-4 downsample in their first block (model.py:140-147)
            stride = 2 if (li > 0 and bi == 0) else 1
            x = _bottleneck(x, block, stride)
    return _attention_pool(x, visual["attnpool"], num_heads)


def init_resnet_params(key: jax.Array, cfg) -> Params:
    """Random ModifiedResNet visual params (shape-compatible with the converter's
    pytree, convert.py:_resnet_visual_params) — tests/bench only; real runs load
    converted RN checkpoints. BN stats init to eval-mode identity (mean 0, var 1);
    weights follow the reference's attnpool std = embed_dim**-0.5
    (model.py:336-356) and simple fan-in scaling for convs.

    Draws come from a numpy Generator seeded from the key: RN50 needs ~55
    distinct-shaped tensors, and one jax.random dispatch per tensor costs a
    separate XLA:CPU compile each (~22 s just to *init* on a 1-core host); the
    consumers are tests/bench, where numpy's determinism-per-seed is all that
    is required."""
    width = cfg.vision_width
    embed_dim = width * 32
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).ravel())

    def normal(std, shape):
        return jnp.asarray(std * rng.standard_normal(shape), dtype=jnp.float32)

    def conv(cin, cout, k):
        return normal((cin * k * k) ** -0.5, (k, k, cin, cout))

    def bn(c):
        return {
            "scale": jnp.ones((c,)),
            "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)),
            "var": jnp.ones((c,)),
        }

    def bottleneck(cin, planes, downsample):
        p = {
            "conv1_w": conv(cin, planes, 1),
            "bn1": bn(planes),
            "conv2_w": conv(planes, planes, 3),
            "bn2": bn(planes),
            "conv3_w": conv(planes, planes * 4, 1),
            "bn3": bn(planes * 4),
        }
        if downsample:
            p["down_conv_w"] = conv(cin, planes * 4, 1)
            p["down_bn"] = bn(planes * 4)
        return p

    visual: Params = {
        "stem": {
            "conv1_w": conv(3, width // 2, 3),
            "bn1": bn(width // 2),
            "conv2_w": conv(width // 2, width // 2, 3),
            "bn2": bn(width // 2),
            "conv3_w": conv(width // 2, width, 3),
            "bn3": bn(width),
        },
    }
    inplanes = width
    for li, blocks in enumerate(cfg.vision_layers, start=1):
        planes = width * (2 ** (li - 1))
        layer: List[Params] = []
        for bi in range(blocks):
            layer.append(bottleneck(inplanes, planes, downsample=(bi == 0)))
            inplanes = planes * 4
        visual[f"layer{li}"] = layer
    spacial = cfg.image_resolution // 32
    pstd = embed_dim**-0.5
    visual["attnpool"] = {
        "positional_embedding": normal(pstd, (spacial**2 + 1, embed_dim)),
        "q_w": normal(pstd, (embed_dim, embed_dim)),
        "q_b": jnp.zeros((embed_dim,)),
        "k_w": normal(pstd, (embed_dim, embed_dim)),
        "k_b": jnp.zeros((embed_dim,)),
        "v_w": normal(pstd, (embed_dim, embed_dim)),
        "v_b": jnp.zeros((embed_dim,)),
        "c_w": normal(pstd, (embed_dim, cfg.embed_dim)),
        "c_b": jnp.zeros((cfg.embed_dim,)),
    }
    return visual
