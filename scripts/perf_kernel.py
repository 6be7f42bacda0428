#!/usr/bin/env python
"""Standalone attention-kernel variant sweep at ViT-B/16 shape (256,12,197,64)."""

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


def chain_time(step_fn, args, iters=20):
    carry = jnp.zeros((), jnp.float32)
    float(step_fn(*args, carry))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


# V0: current batched-3D, divide at end
def kern_v0(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    g, l, dh = q.shape
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * (1.0 / dh**0.5)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=2, keepdims=True)
    out = jax.lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[...] = (out / denom).astype(o_ref.dtype)


# V1: q pre-scaled, reciprocal multiply
def kern_v1(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    g, l, dh = q.shape
    qs = (q.astype(jnp.float32) * (1.0 / dh**0.5)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=2, keepdims=True)
    out = jax.lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[...] = (out * (1.0 / denom)).astype(o_ref.dtype)


# V2: unrolled python loop over G, 2D ops
def kern_v2(q_ref, k_ref, v_ref, o_ref):
    g, l, dh = q_ref.shape
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        qs = (q.astype(jnp.float32) * (1.0 / dh**0.5)).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        out = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[i] = (out * (1.0 / denom)).astype(o_ref.dtype)


# V3: exp via bf16 after fp32 max-sub
def kern_v3(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    g, l, dh = q.shape
    qs = (q.astype(jnp.float32) * (1.0 / dh**0.5)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp((s - m).astype(jnp.bfloat16).astype(jnp.float32))
    denom = jnp.sum(e, axis=2, keepdims=True)
    out = jax.lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[...] = (out * (1.0 / denom)).astype(o_ref.dtype)


def build(kern, g):
    def run(q, k, v, carry):
        b, h, l, dh = q.shape
        n = b * h
        qf = (q + carry.astype(q.dtype) * 0).reshape(n, l, dh)
        kf = k.reshape(n, l, dh)
        vf = v.reshape(n, l, dh)
        out = pl.pallas_call(
            kern,
            grid=(n // g,),
            in_specs=[pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, l, dh), q.dtype),
        )(qf, kf, vf)
        return out[0, 0, 0].astype(jnp.float32)

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    b, h, l, dh = 256, 12, 197, 64
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)

    for name, kern, gs in [
        ("v0 batched/div", kern_v0, (8, 16)),
        ("v1 prescale/recip", kern_v1, (8, 16)),
        ("v2 unrolled-2d", kern_v2, (4, 8)),
        ("v3 bf16-exp", kern_v3, (8, 16)),
    ]:
        for g in gs:
            try:
                dt = chain_time(build(kern, g), (q, k, v))
                print(f"{name:18s} G={g:2d}: {dt*1e3:7.2f} ms/call  ({dt*12*1e3:6.1f} ms/12-layer)")
            except Exception as e:  # noqa: BLE001
                print(f"{name:18s} G={g:2d}: FAILED {type(e).__name__}: {str(e)[:160]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
