#!/usr/bin/env python
"""In-graph MHA variant matrix: projection style x attention core, full encode b=256."""

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


def _kernel_nopad(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=2, keepdims=True)
    out = jax.lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[...] = (out / denom).astype(o_ref.dtype)


def pallas_core(q, k, v, g=8):
    b, h, l, dh = q.shape
    n = b * h
    while n % g:
        g //= 2
    qf, kf, vf = (t.reshape(n, l, dh) for t in (q, k, v))
    kern = functools.partial(_kernel_nopad, scale=1.0 / dh**0.5)
    out = pl.pallas_call(
        kern,
        grid=(n // g,),
        in_specs=[pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, dh), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, l, dh)


def xla_core(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * (1.0 / np.sqrt(dh))
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def proj_split(x, attn, num_heads):
    """single qkv matmul + reshape/transpose split (round-1 style)."""
    b, l, d = x.shape
    dh = d // num_heads
    qkv = x @ attn["qkv_w"] + attn["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda t: t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)
    return sh(q), sh(k), sh(v)


def proj_einsum(x, attn, num_heads):
    b, l, d = x.shape
    dh = d // num_heads
    qkv_w = attn["qkv_w"].reshape(d, 3, num_heads, dh)
    qkv_b = attn["qkv_b"].reshape(3, num_heads, dh)
    qkv = jnp.einsum("bld,dshe->bshle", x, qkv_w) + qkv_b[None, :, :, None, :]
    return qkv[:, 0], qkv[:, 1], qkv[:, 2]


def out_plain(o, attn):
    b, h, l, dh = o.shape
    d = h * dh
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    return o @ attn["out_w"] + attn["out_b"]


def out_einsum(o, attn):
    b, h, l, dh = o.shape
    d = h * dh
    out_w = attn["out_w"].reshape(h, dh, d)
    return jnp.einsum("bhld,hdo->blo", o, out_w) + attn["out_b"]


def make_mha(proj, core, out):
    def mha(x, attn, num_heads, causal=False):
        q, k, v = proj(x, attn, num_heads)
        o = core(q, k, v)
        return out(o, attn)

    return mha


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
        ("split+xla+plain", make_mha(proj_split, xla_core, out_plain)),
        ("split+pallas8+plain", make_mha(proj_split, functools.partial(pallas_core, g=8), out_plain)),
        ("split+pallas8+einsum", make_mha(proj_split, functools.partial(pallas_core, g=8), out_einsum)),
        ("split+pallas16+plain", make_mha(proj_split, functools.partial(pallas_core, g=16), out_plain)),
        ("split+pallas4+plain", make_mha(proj_split, functools.partial(pallas_core, g=4), out_plain)),
        ("einsum+pallas8+einsum", make_mha(proj_einsum, functools.partial(pallas_core, g=8), out_einsum)),
    ]
    for name, fn in variants:
        @jax.jit
        def step(p, fr, carry, fn=fn):
            out = encode_with(fn, p, cfg, fr + carry.astype(jnp.bfloat16) * 0)
            return out[0, 0].astype(jnp.float32)

        try:
            dt = chain_time(step, (params, frames))
            print(f"{name:24s} b={batch}: {dt*1e3:7.2f} ms  {batch/dt:9,.0f} fps")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} b={batch}: FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
