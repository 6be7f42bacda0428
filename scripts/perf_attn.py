#!/usr/bin/env python
"""Isolate fused-attention kernel cost at ViT-B/16 shape; sweep G (heads/program)."""

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

from anomalyclip_tpu.ops.pallas import attention as A


def chain_time(step_fn, args, iters=10):
    carry = jnp.zeros((), jnp.float32)
    float(step_fn(*args, carry))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def variant(g_heads: int):
    @functools.partial(jax.jit, static_argnames=())
    def run(q, k, v, carry):
        b, h, l, dh = q.shape
        n = b * h
        lp = A._round_up(l, 16)
        qc = q + carry.astype(q.dtype) * 0

        def fold(t):
            t = t.reshape(n, l, dh)
            return jnp.pad(t, ((0, 0), (0, lp - l), (0, 0)))

        qp, kp, vp = fold(qc), fold(k), fold(v)
        kernel = functools.partial(
            A._attn_kernel, scale=1.0 / dh**0.5, causal=False, valid_len=l
        )
        out = pl.pallas_call(
            kernel,
            grid=(n // g_heads,),
            in_specs=[
                pl.BlockSpec((g_heads, lp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec((g_heads, lp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, lp, dh), q.dtype),
        )(qp, kp, vp)
        return out[0, 0, 0].astype(jnp.float32)

    return run


def main():
    rng = np.random.default_rng(0)
    b, h, l, dh = 256, 12, 197, 64
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.bfloat16)

    # pad/reshape-only baseline
    @jax.jit
    def fold_only(q, k, v, carry):
        n = b * h
        lp = A._round_up(l, 16)

        def fold(t):
            t = t.reshape(n, l, dh)
            return jnp.pad(t, ((0, 0), (0, lp - l), (0, 0)))

        outs = [fold(q + carry.astype(q.dtype) * 0), fold(k), fold(v)]
        return sum(o[0, 0, 0].astype(jnp.float32) for o in outs)

    dt = chain_time(fold_only, (q, k, v))
    print(f"fold-only: {dt*1e3:7.2f} ms")

    # xla attention baseline
    @jax.jit
    def xla_run(q, k, v, carry):
        out = A._xla_attention(q + carry.astype(q.dtype) * 0, k, v, False)
        return out[0, 0, 0, 0].astype(jnp.float32)

    dt = chain_time(xla_run, (q, k, v))
    print(f"xla-attn : {dt*1e3:7.2f} ms")

    for g in (1, 2, 4, 8, 16, 32):
        try:
            dt = chain_time(variant(g), (q, k, v))
            print(f"pallas G={g:2d}: {dt*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"pallas G={g:2d}: FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
