#!/usr/bin/env python
"""Compare full-encode throughput across MHA formulations at ViT-B/16 batch 256."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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


def mha_einsum(x, attn, num_heads, causal=False):
    """No-transpose formulation: head split via reshape, transposes folded into einsums."""
    b, l, d = x.shape
    dh = d // num_heads
    qkv = x @ attn["qkv_w"] + attn["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, num_heads, dh)
    k = k.reshape(b, l, num_heads, dh)
    v = v.reshape(b, l, num_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / np.sqrt(dh))
    if causal:
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, l, d)
    return out @ attn["out_w"] + attn["out_b"]


def mha_flash(x, attn, num_heads, causal=False):
    """jax.experimental TPU flash-attention kernel; L padded to 256."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, l, d = x.shape
    dh = d // num_heads
    qkv = x @ attn["qkv_w"] + attn["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    lp = 256
    pad = ((0, 0), (0, 0), (0, lp - l), (0, 0))
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    # mask padded keys via segment ids
    seg = (jnp.arange(lp) < l).astype(jnp.int32)[None, :]
    seg = jnp.broadcast_to(seg, (b, lp))
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    out = flash_attention(
        qp, kp, vp,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=causal,
        sm_scale=1.0 / np.sqrt(dh),
    )
    out = out[:, :, :l, :].transpose(0, 2, 1, 3).reshape(b, l, d)
    return out @ attn["out_w"] + attn["out_b"]


def encode_with(mha_fn, params, cfg, frames):
    """encode_image with a custom MHA."""
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

    variants = {
        "einsum": mha_einsum,
        "flash": mha_flash,
    }
    for name, fn in variants.items():
        @jax.jit
        def step(p, fr, carry, fn=fn):
            out = encode_with(fn, p, cfg, fr + carry.astype(jnp.bfloat16) * 0)
            return out[0, 0].astype(jnp.float32)

        try:
            dt = chain_time(step, (params, frames))
            print(f"encode {name:8s} b={batch}: {dt*1e3:7.2f} ms  {batch/dt:9,.0f} fps")
        except Exception as e:  # noqa: BLE001
            print(f"encode {name:8s} b={batch}: FAILED {type(e).__name__}: {str(e)[:300]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
