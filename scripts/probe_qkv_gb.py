#!/usr/bin/env python
"""Probe the whole-block qkv kernel at raised per-kernel VMEM limits.

The qtile kernel's round-4 tuning (gb=4 under CompilerParams.vmem_limit_bytes
=64MB) asked the obvious follow-up: do the *whole-block* kernels behind the
B/16 headline and the L/14 tower also gain from batch groups past their 12MB
estimated budget? This sweeps gb at the two production shapes, carry-chained,
numerics checked vs the XLA formulation.

Usage: python scripts/probe_qkv_gb.py [b16|l14] [fp32|bf16] [gb ...]

The fp32 mode (round 5, VERDICT r4 item 6) answers whether the raised 19MB
budget should extend to itemsize==4: fp32 is the checkpoint-parity compute
mode, and its footprints double — e.g. L/14 gb=2 estimates 17.9MB fp32, the
same footprint as the bf16 (32, 448) shape that hard-crashes Mosaic.
"""
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

SHAPES = {
    "b16": (256, 197, 768, 12, False),
    "l14": (64, 257, 1024, 16, False),
    "b32": (512, 50, 768, 12, False),
    "text": (256, 77, 512, 8, True),
}
LIMIT = 64 * 1024 * 1024


def make(b, l, d, h, gb, limit, causal=False):
    # a non-divisor gb would silently benchmark only floor(B/gb)*gb rows and
    # leave the output tail uninitialized — fail loudly instead
    assert b % gb == 0, f"gb={gb} does not divide B={b}"
    kern = functools.partial(
        A._mha_qkv_kernel, num_heads=h, scale=1.0 / math.sqrt(d // h), causal=causal
    )

    @jax.jit
    def run(qkv):
        return pl.pallas_call(
            kern,
            grid=(b // gb,),
            in_specs=[
                pl.BlockSpec((gb, l, 3 * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
            compiler_params=None
            if limit is None
            else pltpu.CompilerParams(vmem_limit_bytes=limit),
        )(qkv)

    return run


def bench(fn, qkv, iters=40):
    from _bench_util import carry_bench

    return carry_bench(fn, qkv, iters=iters)


def main():
    shape = SHAPES[sys.argv[1] if len(sys.argv) > 1 else "b16"]
    rest = sys.argv[2:]
    dtype = jnp.bfloat16
    if rest and rest[0] in ("fp32", "bf16"):
        dtype = jnp.float32 if rest[0] == "fp32" else jnp.bfloat16
        rest = rest[1:]
    gbs = [int(a) for a in rest] or [4, 8]
    b, l, d, h, causal = shape
    itemsize = jnp.dtype(dtype).itemsize
    print(f"shape B={b} L={l} D={d} H={h} causal={causal} dtype={jnp.dtype(dtype).name}; "
          f"shipped gb={A._pick_gb(b, l, d, itemsize)}", flush=True)
    # generate on device (host->tunnel transfer of a (B, L, 3D) fp32 operand
    # would dominate) and jit the reference (eager op-by-op over the remote
    # tunnel pays a round-trip per op)
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (b, l, 3 * d)) * 0.02).astype(dtype)
    want = np.asarray(
        jax.jit(
            lambda x: A._xla_mha_bld(x[..., :d], x[..., d : 2 * d], x[..., 2 * d :], h, causal)
        )(qkv)
    ).astype(np.float32)
    print("reference computed", flush=True)
    for gb in gbs:
        for limit in (None, LIMIT):
            tag = "default-16MB" if limit is None else "limit-64MB"
            try:
                fn = make(b, l, d, h, gb, limit, causal)
                got = np.asarray(fn(qkv)).astype(np.float32)
                err = np.max(np.abs(got - want))
                ms = bench(fn, qkv)
                print(f"gb={gb} {tag}: {ms:.3f} ms/layer  max|Δ|={err:.5f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"gb={gb} {tag}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
