#!/usr/bin/env python
"""One-off hardware validation for the re-tuned q-tiled kernel config
(balanced lq, 12MB gb budget): compile + numerics vs the XLA formulation at
every shape whose group/tile selection changed, and a qtile-vs-flash timing
at (32, 1024, 1024) — the shape the new budget newly routes to qtile."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from anomalyclip_tpu.ops.pallas.attention import (
    _qtile_gb,
    _qtile_lq,
    _xla_mha_bld,
    flash_attention_heads,
    fused_mha_qtile,
)


def check(b, l, d, h):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, l, d)) * 0.02, jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, l, 2 * d)) * 0.02, jnp.bfloat16)
    try:
        got = np.asarray(fused_mha_qtile(q, kv, h)).astype(np.float32)
    except Exception as e:  # noqa: BLE001
        print(f"(B={b}, L={l}, D={d}, H={h}) lq={_qtile_lq(l)} gb={_qtile_gb(b, l, d, 2)}"
              f"  COMPILE/RUN FAILED: {type(e).__name__}: {str(e)[:200]}")
        return False
    want = np.asarray(
        _xla_mha_bld(q, kv[..., :d], kv[..., d:], h, False)
    ).astype(np.float32)
    err = np.max(np.abs(got - want))
    print(f"(B={b}, L={l}, D={d}, H={h}) lq={_qtile_lq(l)} gb={_qtile_gb(b, l, d, 2)}"
          f"  max|Δ| vs XLA = {err:.5f}  {'OK' if err < 5e-2 else 'FAIL'}")
    return err < 5e-2


def bench(fn, *arrays, iters=30):
    # same carry-chained methodology as every other scripts/ timing — a plain
    # block_until_ready loop can overlap iterations on the remote-TPU tunnel
    from _bench_util import carry_bench

    return carry_bench(fn, *arrays, iters=iters)


def main():
    print("devices:", jax.devices())
    ok = True
    for shape in [
        (32, 577, 1024, 16),
        (32, 1024, 512, 8),
        (32, 1024, 1024, 16),
        (32, 1536, 1024, 16),
    ]:
        ok &= check(*shape)

    # qtile vs flash at the newly-eligible long shape
    b, l, d, h = 32, 1024, 1024, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, l, d)) * 0.02, jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, l, 2 * d)) * 0.02, jnp.bfloat16)
    dh = d // h
    qh = q.reshape(b, l, h, dh).transpose(0, 2, 1, 3).reshape(b * h, l, dh)
    kh = kv[..., :d].reshape(b, l, h, dh).transpose(0, 2, 1, 3).reshape(b * h, l, dh)
    vh = kv[..., d:].reshape(b, l, h, dh).transpose(0, 2, 1, 3).reshape(b * h, l, dh)
    try:
        t_q = bench(lambda q_, kv_: fused_mha_qtile(q_, kv_, h), q, kv)
        print(f"qtile  (32,1024,1024): {t_q:.3f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"qtile  (32,1024,1024): FAILED {type(e).__name__}: {str(e)[:200]}")
        t_q = None
    t_f = bench(flash_attention_heads, qh, kh, vh)
    print(f"flash  (32,1024,1024): {t_f:.3f} ms (excl. head-split transposes)")
    print("ALL OK" if ok else "NUMERIC/COMPILE FAILURES ABOVE")


if __name__ == "__main__":
    main()
