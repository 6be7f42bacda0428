#!/usr/bin/env python
"""Hardware validation for the whole-block kernels' 19MB group budget.

Runs every production CLIP shape plus the selection-boundary shapes whose
batch group changed when the budget moved 12MB -> 19MB, through the
*production* fused_mha_qkv path: compile + numerics vs the XLA formulation,
and a carry-chained per-layer time."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from anomalyclip_tpu.ops.pallas.attention import (
    _pick_gb,
    _xla_mha_bld,
    fused_mha_qkv,
    mha_eligible,
)

# (B, L, D, H, causal, tag)
SHAPES = [
    (256, 197, 768, 12, False, "ViT-B/16 vision (gb unchanged: 4)"),
    (64, 257, 1024, 16, False, "ViT-L/14 vision (gb 2 -> 4)"),
    (32, 448, 1024, 16, False, "envelope max-L (gb stays 1: 19MB budget is L-gated)"),
    (512, 50, 768, 12, False, "ViT-B/32 vision (gb unchanged: 8)"),
    (256, 77, 512, 8, True, "text tower, causal (gb unchanged: 8)"),
]


def bench(fn, qkv, iters=30):
    from _bench_util import carry_bench

    return carry_bench(fn, qkv, iters=iters)


def main():
    print("devices:", jax.devices())
    only = sys.argv[1:]  # optional substring filters on the shape tag
    ok = True
    for b, l, d, h, causal, tag in SHAPES:
        if only and not any(s in tag for s in only):
            continue
        gb = _pick_gb(b, l, d, 2)
        assert mha_eligible(b, l, d, h, 2), f"{tag}: not eligible?!"
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)) * 0.02, jnp.bfloat16)
        try:
            fn = lambda x: fused_mha_qkv(x, h, causal)  # noqa: E731
            got = np.asarray(jax.jit(fn)(qkv)).astype(np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: gb={gb}  COMPILE/RUN FAILED: {type(e).__name__}: {str(e)[:160]}")
            ok = False
            continue
        want = np.asarray(
            _xla_mha_bld(qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :], h, causal)
        ).astype(np.float32)
        err = np.max(np.abs(got - want))
        ms = bench(jax.jit(fn), qkv)
        good = err < 5e-2
        ok &= good
        print(f"{tag}: gb={gb}  {ms:.3f} ms/layer  max|Δ|={err:.5f}  "
              f"{'OK' if good else 'FAIL'}", flush=True)
    print("ALL OK" if ok else "FAILURES ABOVE")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
