#!/usr/bin/env python
"""Probe the q-tiled kernel at raised per-kernel VMEM limits.

The default XLA scoped-vmem limit is 16MB, but v5e VMEM is far larger and a
pallas_call can raise its own cap via CompilerParams(vmem_limit_bytes=...).
This measures gb in {1,2,4,8} x lq in {120,128} at the ViT-L/14@336 per-layer
shape, carry-chained, with numerics checked vs the XLA formulation."""
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anomalyclip_tpu.ops.pallas import attention as A

B, L, D, H = 32, 577, 1024, 16
LIMIT = 64 * 1024 * 1024


def make(gb: int, lq: int):
    kern = functools.partial(
        A._mha_qtile_kernel, num_heads=H, scale=1.0 / math.sqrt(D // H)
    )

    @jax.jit
    def run(q, kv):
        return pl.pallas_call(
            kern,
            grid=(B // gb, pl.cdiv(L, lq)),
            in_specs=[
                pl.BlockSpec((gb, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, L, 2 * D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gb, lq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=LIMIT),
        )(q, kv)

    return run


def bench(fn, q, kv, iters=40):
    from _bench_util import carry_bench

    return carry_bench(fn, q, kv, iters=iters)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, D)) * 0.02, jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((B, L, 2 * D)) * 0.02, jnp.bfloat16)
    want = np.asarray(
        A._xla_mha_bld(q, kv[..., :D], kv[..., D:], H, False)
    ).astype(np.float32)
    configs = [
        (int(a.split(",")[0]), int(a.split(",")[1])) for a in sys.argv[1:]
    ] or [(g, lq) for g in (2, 4, 8) for lq in (120, 128)]
    for gb, lq in configs:
            try:
                fn = make(gb, lq)
                got = np.asarray(fn(q, kv)).astype(np.float32)
                err = np.max(np.abs(got - want))
                ms = bench(fn, q, kv)
                print(f"gb={gb} lq={lq}: {ms:.3f} ms/layer  max|Δ|={err:.5f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"gb={gb} lq={lq}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
