"""Fused multi-head attention kernel (Pallas / Mosaic TPU).

The ViT-B/16 encoder is the framework's dominant FLOP consumer (SURVEY.md §3 hot
loops); its attention works on short sequences (197 tokens, 64-dim heads) where the
costly part is not the matmul FLOPs but the HBM round-trips of the (B, H, L, L)
score tensor. This kernel keeps one head's whole attention — scores, fp32 softmax,
weighted sum — resident in VMEM:

    grid = (batch*heads,); per program: q,k,v (L, Dh) -> out (L, Dh)

with fp32 accumulation on the MXU for both matmuls and an fp32 softmax, matching
the XLA reference path (models/clip/model.py::multi_head_attention) to ~1e-2 in
bf16 / ~1e-6 in fp32 (tests/test_pallas_attention.py). Sequences are padded to the
sublane multiple with masked scores so padded keys contribute zero weight.

Use `fused_attention(q, k, v, causal=...)`; falls back to a pure-XLA computation on
non-TPU backends (interpret mode is used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, valid_len: int):
    q = q_ref[0]  # (Lp, Dh)
    k = k_ref[0]
    v = v_ref[0]
    lp = q.shape[0]

    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale

    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    mask = col < valid_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
        mask = jnp.logical_and(mask, col <= row)
    scores = jnp.where(mask, scores, NEG_INF)

    # numerically safe fp32 softmax over keys
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over (B, H, L, Dh) tensors; softmax in fp32.

    Pads L to the tile multiple and Dh to the lane width; padded keys are masked
    out inside the kernel, padded queries produce garbage rows that are sliced off.
    """
    b, h, l, dh = q.shape
    dtype = q.dtype
    sub = 16 if dtype == jnp.bfloat16 else 8
    lp = _round_up(l, sub)
    dp = _round_up(dh, 128)

    def pad(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, lp - l), (0, dp - dh))).reshape(
            b * h, lp, dp
        )

    qp, kp, vp = pad(q), pad(k), pad(v)
    scale = 1.0 / (dh**0.5)

    kernel = functools.partial(
        _attn_kernel, scale=scale, causal=causal, valid_len=l
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lp, dp), dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, lp, dp)[:, :, :l, :dh]
