"""Shared carry-chained benchmark helper for the scripts/ harnesses.

One methodology for every kernel timing in scripts/ (bench_attn_l14,
probe_qkv_gb, probe_qtile_vmem, validate_pickgb, validate_qtile_config):
each iteration splices a scalar of the previous output back into one input
element, so successive calls can neither be elided nor overlapped by the
runtime — `block_until_ready` is unreliable for timing on the remote-TPU
tunnel (see bench.py). The splice uses dynamic_update_slice of the carry
VALUE (a `carry * 0` term could legally be constant-folded away, leaving
only device-queue serialization as the ordering guarantee).
"""
import time

import jax
import jax.numpy as jnp


def carry_bench(fn, *arrays, iters: int = 30) -> float:
    """Wall-clock ms per call of ``fn(*arrays)``, carry-chained through the
    first array. Works for any array ranks; the chained scalar rides element
    (0, ..., 0) of the first operand and of the output."""

    @jax.jit
    def step(carry, first, *rest):
        first = jax.lax.dynamic_update_slice(
            first,
            carry.astype(first.dtype).reshape((1,) * first.ndim),
            (0,) * first.ndim,
        )
        out = fn(first, *rest)
        return out[(0,) * out.ndim].astype(jnp.float32)

    carry = jnp.zeros((), jnp.float32)
    float(step(carry, *arrays))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry, *arrays)
    float(carry)
    return (time.perf_counter() - t0) / iters * 1e3
