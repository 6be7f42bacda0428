#!/usr/bin/env python
"""Zero-copy lane-sliced pallas attention: q,k,v as (B,L,D) blocks, heads split in VMEM."""

from __future__ import annotations

import functools
import math
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


def _kern_lanesliced(q_ref, k_ref, v_ref, o_ref, *, num_heads, scale):
    gb, l, d = q_ref.shape
    dh = d // num_heads
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        e = jnp.exp(s * scale).astype(jnp.bfloat16)
        denom = jnp.sum(e, axis=2, keepdims=True)
        o = jax.lax.dot_general(e, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = (o / denom).astype(o_ref.dtype)


def mha_lanesliced(x, attn, num_heads, causal=False, gb=8):
    b, l, d = x.shape
    dh = d // num_heads
    qkv = x @ attn["qkv_w"] + attn["qkv_b"]
    q = qkv[:, :, :d]
    k = qkv[:, :, d:2 * d]
    v = qkv[:, :, 2 * d:]
    kern = functools.partial(_kern_lanesliced, num_heads=num_heads, scale=1.0 / math.sqrt(dh))
    o = pl.pallas_call(
        kern,
        grid=(b // gb,),
        in_specs=[pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
    )(q, k, v)
    return o @ attn["out_w"] + attn["out_b"]


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
    params16 = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                      init_clip_params(jax.random.PRNGKey(0), cfg))
    batch = 256
    frames = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)
    N = 8

    fns = {}
    for gb in (4, 8, 16):
        @jax.jit
        def encN(p, fr, gb=gb):
            def body(i, carry):
                out = encode_with(functools.partial(mha_lanesliced, gb=gb), p, cfg,
                                  fr + carry.astype(jnp.bfloat16) * 0)
                return out[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))
        try:
            float(encN(params16, frames))
            fns[f"lanesliced gb={gb}"] = encN
        except Exception as e:  # noqa: BLE001
            print(f"lanesliced gb={gb}: FAILED {type(e).__name__}: {str(e)[:200]}")
            sys.stdout.flush()

    res = {k: [] for k in fns}
    for r in range(4):
        for name, f in fns.items():
            t0 = time.perf_counter(); float(f(params16, frames))
            res[name].append((time.perf_counter() - t0) / N * 1e3)
    for name, ts in res.items():
        t = min(ts)
        print(f"{name:20s}: min {t:7.2f} ms  {batch/t*1e3:9,.0f} fps")

    # numeric check vs xla
    def xla_mha(x, attn, num_heads, causal=False):
        b, l, d = x.shape
        dh = d // num_heads
        qkv = x @ attn["qkv_w"] + attn["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s * (1.0 / math.sqrt(dh)), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, l, d)
        return o @ attn["out_w"] + attn["out_b"]

    blk0 = jax.tree_util.tree_map(lambda t: t[0], params16["visual"]["blocks"])
    x = jnp.asarray(rng.standard_normal((8, 197, 768)), jnp.bfloat16)
    want = np.asarray(xla_mha(x, blk0["attn"], 12)).astype(np.float32)
    got = np.asarray(mha_lanesliced(x, blk0["attn"], 12, gb=8)).astype(np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"rel err lanesliced vs xla: {err:.4f}")


if __name__ == "__main__":
    main()
