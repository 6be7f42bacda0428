#!/usr/bin/env python
"""Micro-benchmarks with carry-chained iterations (reliable under async dispatch).

Every iteration's input depends on the previous output, so the timed loop cannot
be elided or overlapped away; a final float() blocks on the whole chain. All big
arrays are jit *arguments* (closed-over constants blow up the remote-compile
payload on the axon tunnel).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(step_fn, args, carry0, iters=10):
    """step_fn(*args, carry) -> scalar fp32 carry. Returns sec/iter."""
    float(step_fn(*args, carry0))  # compile + warmup
    carry = carry0
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}")
    rng = np.random.default_rng(0)

    from anomalyclip_tpu.models.clip import model as M
    from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params

    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    batch = int(os.environ.get("BATCH", "256"))
    frames = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)
    gflops_frame = 35.2

    # 1. peak bf16 matmul (8k cube)
    a = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)

    @jax.jit
    def mm_step(a, b, carry):
        out = (a + carry.astype(jnp.bfloat16)) @ b
        return out[0, 0].astype(jnp.float32)

    dt = chain_time(mm_step, (a, b), jnp.zeros((), jnp.float32))
    print(f"matmul 8192^3 bf16: {dt*1e3:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s")

    def encode_bench(label):
        @jax.jit
        def step(p, fr, carry):
            out = M.encode_image(p, cfg, fr + carry.astype(jnp.bfloat16) * 0,
                                 compute_dtype=jnp.bfloat16)
            return out[0, 0].astype(jnp.float32)

        dt = chain_time(step, (params, frames), jnp.zeros((), jnp.float32))
        print(f"encode {label:9s} b={batch}: {dt*1e3:7.2f} ms  {batch/dt:9,.0f} fps  "
              f"{batch*gflops_frame/dt/1e3:5.1f} TFLOP/s")
        return dt

    M.set_attention_impl("xla")
    encode_bench("XLA-attn")

    orig = M.attention_core
    M.attention_core = lambda q, k, v, causal=False: v
    try:
        encode_bench("NO-attn")
    finally:
        M.attention_core = orig

    M.set_attention_impl("pallas")
    encode_bench("PALLAS")
    M.set_attention_impl("auto")


if __name__ == "__main__":
    main()
