#!/usr/bin/env python
"""Prototype: no-pad pallas attention + einsum projections, full-encode bench."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anomalyclip_tpu.models.clip import model as M
from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params


def chain_time(step_fn, args, iters=10):
    carry = jnp.zeros((), jnp.float32)
    float(step_fn(*args, carry))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool):
    q = q_ref[...]  # (G, L, Dh)
    k = k_ref[...]
    v = v_ref[...]
    g, l, dh = q.shape
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, l, l), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (g, l, l), 2)
        s = jnp.where(col <= row, s, -1e30)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=2, keepdims=True)  # (G, L, 1)
    out = jax.lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (out / denom).astype(o_ref.dtype)


def fused_attention2(q, k, v, causal=False, g=8):
    b, h, l, dh = q.shape
    n = b * h
    while n % g:
        g //= 2
    qf = q.reshape(n, l, dh)
    kf = k.reshape(n, l, dh)
    vf = v.reshape(n, l, dh)
    kern = functools.partial(_kernel, scale=1.0 / dh**0.5, causal=causal)
    out = pl.pallas_call(
        kern,
        grid=(n // g,),
        in_specs=[pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, dh), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, l, dh)


def mha_pallas2(x, attn, num_heads, causal=False, g=8):
    b, l, d = x.shape
    dh = d // num_heads
    qkv_w = attn["qkv_w"].reshape(d, 3, num_heads, dh)
    qkv_b = attn["qkv_b"].reshape(3, num_heads, dh)
    # (B, 3, H, L, Dh) in one einsum; transpose folded into GEMM output
    qkv = jnp.einsum("bld,dshe->bshle", x, qkv_w) + qkv_b[None, :, :, None, :]
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    o = fused_attention2(q, k, v, causal=causal, g=g)
    out_w = attn["out_w"].reshape(num_heads, dh, d)
    return jnp.einsum("bhld,hdo->blo", o, out_w) + attn["out_b"]


def mha_xla_bhld(x, attn, num_heads, causal=False):
    """XLA path with einsum projections (no explicit transposes)."""
    b, l, d = x.shape
    dh = d // num_heads
    qkv_w = attn["qkv_w"].reshape(d, 3, num_heads, dh)
    qkv_b = attn["qkv_b"].reshape(3, num_heads, dh)
    qkv = jnp.einsum("bld,dshe->bshle", x, qkv_w) + qkv_b[None, :, :, None, :]
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * (1.0 / np.sqrt(dh))
    w = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out_w = attn["out_w"].reshape(num_heads, dh, d)
    return jnp.einsum("bhld,hdo->blo", o, out_w) + attn["out_b"]


def encode_with(mha_fn, params, cfg, frames):
    visual = params["visual"]
    x = M.patchify(frames, cfg.vision_patch_size)
    x = x @ visual["patch_embed"]
    b = x.shape[0]
    cls = jnp.broadcast_to(visual["class_embedding"], (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + visual["positional_embedding"]
    x = M.layer_norm(x, visual["ln_pre"]["scale"], visual["ln_pre"]["bias"])

    def body(carry, blk):
        h = M.layer_norm(carry, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
        carry = carry + mha_fn(h, blk["attn"], cfg.vision_heads)
        h = M.layer_norm(carry, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
        h = M.quick_gelu(h @ blk["mlp"]["fc_w"] + blk["mlp"]["fc_b"])
        return carry + (h @ blk["mlp"]["proj_w"] + blk["mlp"]["proj_b"]), None

    x, _ = jax.lax.scan(body, x, visual["blocks"])
    x = M.layer_norm(x[:, 0, :], visual["ln_post"]["scale"], visual["ln_post"]["bias"])
    return x @ visual["proj"]


def main():
    rng = np.random.default_rng(0)
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    batch = int(os.environ.get("BATCH", "256"))
    frames = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)

    variants = [
        ("xla_bhld", mha_xla_bhld),
        ("pallas_g4", functools.partial(mha_pallas2, g=4)),
        ("pallas_g8", functools.partial(mha_pallas2, g=8)),
        ("pallas_g16", functools.partial(mha_pallas2, g=16)),
    ]
    for name, fn in variants:
        @jax.jit
        def step(p, fr, carry, fn=fn):
            out = encode_with(fn, p, cfg, fr + carry.astype(jnp.bfloat16) * 0)
            return out[0, 0].astype(jnp.float32)

        try:
            dt = chain_time(step, (params, frames))
            print(f"encode {name:10s} b={batch}: {dt*1e3:7.2f} ms  {batch/dt:9,.0f} fps")
        except Exception as e:  # noqa: BLE001
            print(f"encode {name:10s} b={batch}: FAILED {type(e).__name__}: {str(e)[:300]}")
        sys.stdout.flush()

    # numeric sanity: pallas2 vs xla reference at bf16
    q = jnp.asarray(rng.standard_normal((2, 4, 197, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 4, 197, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 4, 197, 64)), jnp.bfloat16)
    from anomalyclip_tpu.ops.pallas.attention import _xla_attention
    want = np.asarray(_xla_attention(q, k, v, False)).astype(np.float32)
    got = np.asarray(fused_attention2(q, k, v)).astype(np.float32)
    err = np.abs(got - want).max()
    print(f"max abs err pallas2 vs xla (bf16): {err:.4f}")


if __name__ == "__main__":
    main()
