"""Axial transformer over the (num_segments x seg_length) temporal grid.

Re-design of the reference TemporalModel (reference:
src/models/components/temporal_model.py:8-77 + classification_head.py:4-15), whose
attention core is the external ``axial_attention`` pip package (lucidrains
AxialImageTransformer, requirements.txt:31). Functional behavior reproduced here:

- axial positional embeddings: one learned vector per segment index and one per
  within-segment frame index, added to the input grid,
- per depth level, a *reversible* pair of blocks in the RevNet coupling
  ``y1 = x1 + f(x2); y2 = x2 + g(y1)`` with ``x1 = x2 = x`` at entry and the two
  streams averaged at exit:
    block A: f = pre-LN self-attention along the segment axis (long-term, n=32),
             g = pre-LN self-attention along the frame axis (short-term, l=16),
    block B: f, g = two channel-LN 3x3 conv feed-forwards (dim -> 4*dim -> dim,
             LeakyReLU) over the grid,
- classification head: LayerNorm -> Linear -> sigmoid, one score per frame.

TPU-first differences from the torch package: the grid lives in NHWC ("b n l d")
throughout — no channels-first permutes; both axial attentions are batched matmuls
folding the orthogonal axis into batch; reversibility is kept as the *numeric
coupling* only (checkpoint compatibility). No custom reversible backward — and no
rematerialization — is needed: the grid is 32x16, so the activation-memory
motivation for RevNet does not exist on TPU at this size and XLA's default
autodiff storage is already cheap.

At test time a variable-length video arrives as ``segment_size`` independent 32x16
grids folded into the batch axis (temporal_model.py:45-53).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TemporalConfig:
    input_size: int
    emb_size: int
    depth: int
    heads: int
    dim_heads: int | None  # None -> emb_size // heads
    num_segments: int = 32
    seg_length: int = 16

    @property
    def head_dim(self) -> int:
        return self.dim_heads if self.dim_heads else self.emb_size // self.heads

    @property
    def hidden(self) -> int:
        return self.head_dim * self.heads


# ---------------------------------------------------------------------------
# Initialization: torch-default distributions so training-from-scratch matches the
# reference's statistical behavior (nn.Linear/nn.Conv2d kaiming-uniform bounds).
# ---------------------------------------------------------------------------


def _linear_init(key: jax.Array, fan_in: int, shape_w, shape_b=None):
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, shape_w, minval=-bound, maxval=bound, dtype=jnp.float32)
    if shape_b is None:
        return w
    b = jax.random.uniform(kb, shape_b, minval=-bound, maxval=bound, dtype=jnp.float32)
    return w, b


def _init_axial_attn(key: jax.Array, cfg: TemporalConfig) -> Params:
    d, h = cfg.emb_size, cfg.hidden
    k1, k2, k3 = jax.random.split(key, 3)
    to_out_w, to_out_b = _linear_init(k3, h, (h, d), (d,))
    return {
        "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "to_q": _linear_init(k1, d, (d, h)),  # no bias (axial SelfAttention)
        "to_kv": _linear_init(k2, d, (d, 2 * h)),
        "to_out_w": to_out_w,
        "to_out_b": to_out_b,
    }


def _init_conv_ff(key: jax.Array, cfg: TemporalConfig) -> Params:
    d = cfg.emb_size
    k1, k2 = jax.random.split(key)
    w1, b1 = _linear_init(k1, d * 9, (3, 3, d, 4 * d), (4 * d,))
    w2, b2 = _linear_init(k2, 4 * d * 9, (3, 3, 4 * d, d), (d,))
    return {
        "ln_g": jnp.ones((d,)),
        "ln_b": jnp.zeros((d,)),
        "conv1_w": w1,
        "conv1_b": b1,
        "conv2_w": w2,
        "conv2_b": b2,
    }


def init_temporal_params(key: jax.Array, cfg: TemporalConfig) -> Params:
    keys = jax.random.split(key, 4 + 4 * cfg.depth)
    proj_w, proj_b = _linear_init(keys[0], cfg.input_size, (cfg.input_size, cfg.emb_size), (cfg.emb_size,))
    head_w, head_b = _linear_init(keys[1], cfg.emb_size, (cfg.emb_size, 1), (1,))
    layers: List[Params] = []
    for i in range(cfg.depth):
        base = 4 + 4 * i
        layers.append(
            {
                "attn_n": _init_axial_attn(keys[base], cfg),
                "attn_l": _init_axial_attn(keys[base + 1], cfg),
                "ff1": _init_conv_ff(keys[base + 2], cfg),
                "ff2": _init_conv_ff(keys[base + 3], cfg),
            }
        )
    return {
        "projection": {"w": proj_w, "b": proj_b},
        # axial positional embeddings (randn init, one per axis)
        "pos_n": jax.random.normal(keys[2], (cfg.num_segments, cfg.emb_size), dtype=jnp.float32),
        "pos_l": jax.random.normal(keys[3], (cfg.seg_length, cfg.emb_size), dtype=jnp.float32),
        "layers": layers,
        "head": {
            "ln": {"scale": jnp.ones((cfg.emb_size,)), "bias": jnp.zeros((cfg.emb_size,))},
            "w": head_w,
            "b": head_b,
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _chan_layer_norm(x, g, b, eps=1e-5):
    """Channel LayerNorm with the axial package's eps placement:
    (x - mean) / (std + eps), std = sqrt(biased var) — NOT sqrt(var + eps)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.var(x, axis=-1, keepdims=True))
    return (x - mean) / (std + eps) * g + b


def _self_attention(x: jnp.ndarray, p: Params, cfg: TemporalConfig) -> jnp.ndarray:
    """Pre-LN multi-head self-attention over (B, T, D) with no q/kv bias.

    On TPU the fused (B, T, hidden) Pallas kernel handles the attention core
    (heads split in VMEM, softmax resident on-chip — same design as the CLIP
    encoder's MHA); elsewhere the einsum formulation runs. Identical math.
    """
    b, t, d = x.shape
    h, e = cfg.heads, cfg.head_dim
    x = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"])
    q = x @ p["to_q"]
    kv = x @ p["to_kv"]

    from anomalyclip_tpu.models.clip.model import _attention_impl

    if _attention_impl() == "pallas":
        from anomalyclip_tpu.ops.pallas.attention import fused_mha_bld, mha_eligible

        if mha_eligible(b, t, h * e, h, q.dtype.itemsize):
            k = kv[:, :, : h * e]
            v = kv[:, :, h * e :]
            out = fused_mha_bld(q, k, v, h)
            return out @ p["to_out_w"] + p["to_out_b"]

    k, v = jnp.split(kv, 2, axis=-1)

    def heads(t_):
        return t_.reshape(b, -1, h, e).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    dots = jnp.einsum("bhie,bhje->bhij", q, k, preferred_element_type=jnp.float32)
    dots = jax.nn.softmax(dots * (e**-0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhij,bhje->bhie", dots, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h * e)
    return out @ p["to_out_w"] + p["to_out_b"]


def _attn_along_segments(x: jnp.ndarray, p: Params, cfg: TemporalConfig) -> jnp.ndarray:
    """Attend along the segment axis n: fold l into batch. x: (B, n, l, d)."""
    b, n, l, d = x.shape
    y = x.transpose(0, 2, 1, 3).reshape(b * l, n, d)
    y = _self_attention(y, p, cfg)
    return y.reshape(b, l, n, d).transpose(0, 2, 1, 3)


def _attn_along_frames(x: jnp.ndarray, p: Params, cfg: TemporalConfig) -> jnp.ndarray:
    """Attend along the frame axis l: fold n into batch. x: (B, n, l, d)."""
    b, n, l, d = x.shape
    y = x.reshape(b * n, l, d)
    y = _self_attention(y, p, cfg)
    return y.reshape(b, n, l, d)


def _conv_ff(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Channel-LN -> 3x3 conv (d->4d) -> LeakyReLU(0.01) -> 3x3 conv (4d->d),
    NHWC over the (n, l) grid."""
    y = _chan_layer_norm(x, p["ln_g"], p["ln_b"])
    y = jax.lax.conv_general_dilated(
        y, p["conv1_w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv1_b"]
    y = jnp.where(y >= 0, y, 0.01 * y)
    y = jax.lax.conv_general_dilated(
        y, p["conv2_w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv2_b"]
    return y


def _reversible_pair(x1, x2, f, g):
    """RevNet coupling: y1 = x1 + f(x2); y2 = x2 + g(y1)."""
    y1 = x1 + f(x2)
    y2 = x2 + g(y1)
    return y1, y2


def axial_transformer(x: jnp.ndarray, params: Params, cfg: TemporalConfig) -> jnp.ndarray:
    """(B, n, l, d) -> (B, n, l, d)."""
    x = x + params["pos_n"][None, :, None, :] + params["pos_l"][None, None, :, :]
    x1 = x2 = x
    for layer in params["layers"]:
        x1, x2 = _reversible_pair(
            x1,
            x2,
            lambda t: _attn_along_segments(t, layer["attn_n"], cfg),
            lambda t: _attn_along_frames(t, layer["attn_l"], cfg),
        )
        x1, x2 = _reversible_pair(
            x1,
            x2,
            lambda t: _conv_ff(t, layer["ff1"]),
            lambda t: _conv_ff(t, layer["ff2"]),
        )
    return (x1 + x2) * 0.5


def temporal_scores(
    features: jnp.ndarray,
    params: Params,
    cfg: TemporalConfig,
    segment_size: int = 1,
    test_mode: bool = False,
) -> jnp.ndarray:
    """Full temporal model: project -> axial transformer -> sigmoid head.

    Args:
        features: (B*n*l, input_size) train mode; (B*n*s*l, input_size) test mode
            laid out video-major/segment-grid order (temporal_model.py:45-60).
        segment_size: s, the number of independent 32x16 grids per test video.
    Returns:
        (total_frames, 1) per-frame anomaly scores in (0, 1).
    """
    x = features @ params["projection"]["w"] + params["projection"]["b"]
    n, l, d = cfg.num_segments, cfg.seg_length, cfg.emb_size
    if test_mode:
        # (b n s l) d -> (b s) n l d
        x = x.reshape(-1, n, segment_size, l, d)
        x = x.transpose(0, 2, 1, 3, 4).reshape(-1, n, l, d)
    else:
        x = x.reshape(-1, n, l, d)

    x = axial_transformer(x, params, cfg)

    if test_mode:
        # (b s) n l d -> (b n s l) d
        x = x.reshape(-1, segment_size, n, l, d)
        x = x.transpose(0, 2, 1, 3, 4).reshape(-1, d)
    else:
        x = x.reshape(-1, d)

    x = _layer_norm(x, params["head"]["ln"]["scale"], params["head"]["ln"]["bias"])
    return jax.nn.sigmoid(x @ params["head"]["w"] + params["head"]["b"])
