#!/usr/bin/env python
"""Layout experiments: DMA cost vs minor-dim width; in-kernel reshape cost."""

from __future__ import annotations

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


def copy3(shape_block, arr_shape, g):
    def kern(a_ref, o_ref):
        o_ref[...] = a_ref[...]

    def run(a, carry):
        a = a + carry.astype(a.dtype) * 0
        nblocks = arr_shape[0] // g
        out = pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(shape_block, lambda i: (i,) + (0,) * (len(shape_block) - 1), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape_block, lambda i: (i,) + (0,) * (len(shape_block) - 1), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(arr_shape, a.dtype),
        )(a)
        return out.reshape(-1)[0].astype(jnp.float32)

    return jax.jit(run)


def attn_2dload(g):
    """Load (G, L*Dh) aligned blocks, reshape in VMEM, full attention."""
    l, dh = 197, 64

    def kern(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[...].reshape(g, l, dh)
        k = k_ref[...].reshape(g, l, dh)
        v = v_ref[...].reshape(g, l, dh)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        s = s * (1.0 / dh**0.5)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=2, keepdims=True)
        out = jax.lax.dot_general(e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        o_ref[...] = (out / denom).reshape(g, l * dh).astype(o_ref.dtype)

    def run(q, k, v, carry):
        b, h, l_, dh_ = q.shape
        n = b * h
        qf = (q + carry.astype(q.dtype) * 0).reshape(n, l_ * dh_)
        kf = k.reshape(n, l_ * dh_)
        vf = v.reshape(n, l_ * dh_)
        out = pl.pallas_call(
            kern,
            grid=(n // g,),
            in_specs=[pl.BlockSpec((g, l * dh), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((g, l * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, l * dh), q.dtype),
        )(qf, kf, vf)
        return out[0, 0].astype(jnp.float32)

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    b, h, l, dh = 256, 12, 197, 64
    n = b * h
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    flat = q.reshape(n, l * dh)

    # copy experiments (single input, so ~2/4 of attention traffic)
    dt = chain_time(copy3((8, l, dh), (n, l, dh), 8), (q.reshape(n, l, dh),))
    print(f"copy (8,197,64) 3d   : {dt*1e3:7.2f} ms")
    dt = chain_time(copy3((8, l * dh), (n, l * dh), 8), (flat,))
    print(f"copy (8,12608) 2d    : {dt*1e3:7.2f} ms")
    dt = chain_time(copy3((64, l * dh), (n, l * dh), 64), (flat,))
    print(f"copy (64,12608) 2d   : {dt*1e3:7.2f} ms")
    half = q.reshape(n // 2, l, 128)
    dt = chain_time(copy3((8, l, 128), (n // 2, l, 128), 8), (half,))
    print(f"copy (8,197,128) 3d  : {dt*1e3:7.2f} ms")

    for g in (8, 16):
        try:
            dt = chain_time(attn_2dload(g), (q, k, v))
            print(f"attn 2d-load G={g:2d}   : {dt*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"attn 2d-load G={g:2d}   : FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
