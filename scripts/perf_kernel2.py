#!/usr/bin/env python
"""Diagnose the attention kernel: matmul-only vs softmax-only vs full."""

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


def kern_mm_only(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(s.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def kern_mm1_only(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    # reduce (G,L,L) -> (G,L,Dh) cheaply without a second matmul
    o_ref[...] = jnp.broadcast_to(jnp.sum(s, axis=2, keepdims=True), o_ref.shape).astype(o_ref.dtype)


def kern_softmax_only(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]
    g, l, dh = q.shape
    # fabricate an (G,L,L) array without matmul: broadcast
    s = jnp.broadcast_to(q[:, :, :1], (g, l, l)).astype(jnp.float32)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=2, keepdims=True)
    o_ref[...] = jnp.broadcast_to((e / denom)[:, :, :dh], (g, l, dh)).astype(o_ref.dtype)


def kern_copy(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...] + v_ref[...]


def build(kern, g, l_pad=None):
    def run(q, k, v, carry):
        b, h, l, dh = q.shape
        n = b * h
        qf = (q + carry.astype(q.dtype) * 0).reshape(n, l, dh)
        kf = k.reshape(n, l, dh)
        vf = v.reshape(n, l, dh)
        if l_pad:
            qf = jnp.pad(qf, ((0, 0), (0, l_pad - l), (0, 0)))
            kf = jnp.pad(kf, ((0, 0), (0, l_pad - l), (0, 0)))
            vf = jnp.pad(vf, ((0, 0), (0, l_pad - l), (0, 0)))
            l = l_pad
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

    for name, kern, g, lp in [
        ("copy", kern_copy, 8, None),
        ("mm1-only", kern_mm1_only, 8, None),
        ("mm-both", kern_mm_only, 8, None),
        ("softmax-only", kern_softmax_only, 8, None),
        ("mm-both L=256", kern_mm_only, 8, 256),
        ("mm-both L=128", kern_mm_only, 8, 128),
    ]:
        try:
            dt = chain_time(build(kern, g, lp), (q, k, v))
            print(f"{name:16s} G={g:2d}: {dt*1e3:7.2f} ms/call")
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} G={g:2d}: FAILED {type(e).__name__}: {str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
