"""Fused multi-head attention kernels (Pallas / Mosaic TPU).

The ViT-B/16 encoder is the framework's dominant FLOP consumer (SURVEY.md §3 hot
loops; reference hot loop: src/models/components/clip/model.py:188-217). Profiling
the plain-XLA encoder on v5e showed the attention *layout* — not its FLOPs — as the
cost: per layer, XLA materializes three (B, H, L, Dh) transpose copies, an fp32
(B, H, L, L) score tensor, a reduce and a divide fusion, ~2.1 ms/layer of pure HBM
traffic at batch 256 against ~0.15 ms of attention matmul time.

``fused_mha_bld`` removes all of it. It consumes q, k, v in their natural
(B, L, D) layout (contiguous lane-slices of the fused qkv projection — no
transposes anywhere), splits heads *inside* VMEM via static lane slices, and keeps
scores/softmax/weighted-sum resident in VMEM:

    grid = (B / gb,); per program: q,k,v (gb, L, D) -> out (gb, L, D)

Per-head work inside a program is a (gb, L, Dh) batched dot — small, but it
overlaps with the next block's DMA, and its output never touches HBM. Measured at
ViT-B/16 batch 256 on v5e: 71.7 ms/iter full encode vs 98.4 ms for the best XLA
formulation (+37% throughput).

Numerics: scores accumulate in fp32 on the MXU; softmax subtracts the row max
(exactly the reference softmax) and exponentiates in fp32; the normalizing divide
happens on the (gb, L, Dh) output, not the (gb, L, L) weights. This matches the
XLA path to ~1e-5 in fp32 and ~5e-2 in bf16 (tests/test_pallas_attention.py).

Gradient support: every kernel family ships a fused Pallas BACKWARD on its
supported shapes. The whole-block kernels (``fused_mha_bld``, ``fused_mha_qkv``,
``fused_attention``) recompute scores/softmax per head in VMEM and emit exact
dq/dk/dv via the softmax VJP (mha_bwd_eligible mirrors the forward envelope);
``fused_mha_qtile`` accumulates dk|dv across its resident-KV q-tile sweep
(mha_qtile_bwd_eligible); ``flash_attention_heads`` runs KV-blocked dq and
dk/dv passes whose VMEM is independent of L (no length cap). None materialize
a (B, H, L, L) tensor in HBM. Only shapes outside every fused-backward
envelope fall back to jax.vjp of the XLA formulation (which does materialize
fp32 scores in HBM) — each entry point's docstring states its exact backward
path. The production gradient consumers (CoOp text tower L=77, temporal grid
L=32/16, reference: src/models/components/coop.py:49) all take the
whole-block fused backward.

``fused_attention`` (q, k, v already split into (B, H, L, Dh)) remains for callers
that hold per-head tensors; it shares the same in-VMEM softmax design.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# ---------------------------------------------------------------------------
# (B, L, D) lane-sliced fused MHA — the production path
# ---------------------------------------------------------------------------


def _causal_mask(gb: int, l: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (gb, l, l), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (gb, l, l), 2)
    return col <= row


def _attend_head(q, k, v, scale: float, causal_mask, out_dtype):
    """One head's softmax attention, scores/exp resident in VMEM registers:
    fp32 MXU accumulation, row-max-subtracted fp32 softmax, normalizing divide
    on the (gb, L, Dh) output instead of the (gb, L, L) weights."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    if causal_mask is not None:
        s = jnp.where(causal_mask, s, NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=2, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return (o / denom).astype(out_dtype)


def _mha_bld_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float, causal: bool):
    gb, l, d = q_ref.shape
    dh = d // num_heads
    mask = _causal_mask(gb, l) if causal else None
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        o_ref[:, :, sl] = _attend_head(
            q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl], scale, mask, o_ref.dtype
        )


def _pick_group(n: int, l: int, d: int, itemsize: int, budget: int) -> int:
    """Largest grid group whose estimated working set fits ``budget`` bytes of
    VMEM: 4 (g, L, D) blocks double-buffered plus the fp32 (g, L, L) score/exp
    scratch for one head. The estimate undershoots real scoped-VMEM usage by
    ~1.6x at long sequences (see mha_eligible / _pick_g callers), so budgets
    carry that margin."""
    for g in (8, 4, 2, 1):
        if n % g:
            continue
        blocks = 4 * g * l * d * itemsize * 2
        scratch = 2 * g * l * l * 4
        if blocks + scratch <= budget:
            return g
    return 0


def _pick_gb(b: int, l: int, d: int, itemsize: int) -> int:
    """Batch-block for the (B, L, D) kernels — L-gated estimated budget.

    Hardware-calibrated on v5e (round 4): the working-set estimate overshoots
    Mosaic's actual allocation at moderate L, so configs estimating up to
    ~19MB compile fine under the default 16MB scoped-VMEM limit — at the
    ViT-L/14 shape (B=64, L=257, D=1024) gb=4 (est. 18.9MB) compiles and runs
    1.45-1.61 ms/layer vs 2.34 at the old 12MB budget's gb=2, a ~35% per-layer
    cut. But the relationship inverts at long L: the envelope shape
    (B=32, L=448, D=1024) at gb=2 estimates 17.9MB and HARD-CRASHES the
    Mosaic compile (same failure class as the L=512 cap in mha_eligible), so
    the raised budget applies only up to L=288 — above the largest validated
    winner (L=257) and far below the first measured failure (L=448), where
    the original 12MB budget's selections are all hardware-proven. The
    ViT-B/16 shape keeps selecting gb=4 under either budget (its measured
    optimum: gb=8 needs a raised VMEM cap and is 29% slower; a raised cap
    even at gb=4 costs 16% — so the whole-block kernels raise
    vmem_limit_bytes only for selections whose estimate exceeds the 12MB
    budget, where it is needed to compile at all; see _whole_block_params).
    Per-shape validation:
    scripts/validate_pickgb.py — which sweeps bf16 only, so the raised budget
    is additionally gated on itemsize==2. The fp32 sweep
    (scripts/probe_qkv_gb.py {l14,b16} fp32, v5e round 5) proves the gate
    right rather than merely cautious: at the L/14 shape the gb=2 the raised
    budget would newly admit (est. 17.9MB fp32) is a measured REGRESSION —
    1.90 ms/layer (1.88 under a 64MB cap) vs the shipped gb=1's 1.81 — and
    at the B/16 shape the raised budget admits nothing new (gb=4 estimates
    20.6MB fp32 > 19MB). The fastest fp32 configs at both shapes (L/14 gb=4
    1.70, B/16 gb=4 3.02) hard-crash the default-cap compile and need
    vmem_limit_bytes=64MB plus a ~36MB budget class with no other validated
    member; fp32 is the checkpoint-parity eval mode, not a throughput path,
    and isolated wins of 3-6% compose to well under 1% in-tower (cf. the
    bf16 L/14 case: -38% isolated -> +1.5% end-to-end), so the shipped
    selections stay on the hardware-proven 12MB budget — where both
    production fp32 configs (L/14 gb=1, B/16 gb=2) compile at the default
    cap and validate to max|Δ| <= 2e-5."""
    raised = l <= 288 and itemsize == 2
    budget = 19 * 1024 * 1024 if raised else 12 * 1024 * 1024
    return _pick_group(b, l, d, itemsize, budget)


def _whole_block_params(gb: int, l: int, d: int, itemsize: int, interpret: bool):
    """CompilerParams for the whole-block kernels at a chosen batch group.

    Selections whose estimated working set exceeds the original 12MB budget
    (i.e. the ones the raised 19MB budget newly admits, like ViT-L/14's gb=4)
    compile standalone under the default 16MB scoped-VMEM limit but OOM when
    composed inside the full encoder — Mosaic's stack allocation for the same
    pallas_call grows to 22.25M inside jit(encode) (measured r4, identical to
    the q-tiled kernel's 11.0MB-estimate/19.3MB-composed behavior). Those
    selections ship with the raised 64MB cap. Selections within the 12MB
    budget keep the default cap: hardware-measured at the ViT-B/16 shape,
    raising the cap there costs 16% (2.17 -> 2.51 ms/layer) while at the
    ViT-L/14 shape it costs nothing (1.446 vs 1.450) — so the cap is raised
    only where it is needed to compile."""
    if interpret:
        return None  # CPU interpret mode: TPU compiler params don't apply
    est = 4 * gb * l * d * itemsize * 2 + 2 * gb * l * l * 4
    if est > 12 * 1024 * 1024:
        return pltpu.CompilerParams(vmem_limit_bytes=_QTILE_VMEM_LIMIT)
    return None


def mha_eligible(b: int, l: int, d: int, num_heads: int, itemsize: int) -> bool:
    """Whether fused_mha_bld can run this shape (static check).

    The sequence cap is empirical: the Mosaic compile hard-crashes (not a clean
    VMEM error) at L=512/577 with D=1024 even though the working-set estimate
    fits, while every shape up to L=448 compiles and validates. All supported
    CLIP towers sit well inside it (B/32: 50, text: 77, B/16: 197, L/14: 257);
    ViT-L/14@336 (L=577) takes the XLA formulation instead.
    """
    return d % num_heads == 0 and l <= 448 and _pick_gb(b, l, d, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("num_heads", "causal", "interpret"))
def _mha_bld_impl(q, k, v, num_heads: int, causal: bool, interpret: bool):
    b, l, d = q.shape
    dh = d // num_heads
    gb = _pick_gb(b, l, d, q.dtype.itemsize)
    assert gb > 0, f"shape (B={b}, L={l}, D={d}) does not fit the fused MHA kernel"
    kern = functools.partial(
        _mha_bld_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh), causal=causal
    )
    return pl.pallas_call(
        kern,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=interpret,
        compiler_params=_whole_block_params(gb, l, d, q.dtype.itemsize, interpret),
    )(q, k, v)


def _xla_mha_bld(q, k, v, num_heads, causal):
    """(B, L, D) wrapper over the single XLA reference formulation (one source of
    truth for the custom-VJP fallback backward passes)."""
    b, l, d = q.shape
    dh = d // num_heads

    def split(t):
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    out = _xla_attention(split(q), split(k), split(v), causal)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d)


# ---------------------------------------------------------------------------
# Fused whole-block BACKWARD — dq/dk/dv with scores recomputed in VMEM
# ---------------------------------------------------------------------------
#
# The forward kernels' historical backward fell back to jax.vjp of the XLA
# formulation, which materializes the fp32 (B, H, L, L) score tensor in HBM —
# measured noise for THIS model (only the 77-token text tower differentiates
# through attention; the ViT is frozen) but a real cliff for any unfrozen-
# encoder or long-grid training. This kernel closes it: per batch-group
# program, per head, recompute s = qk^T, softmax, then the exact softmax VJP
#
#     dV = P^T g,   dS = P * (gV^T - rowsum(P * gV^T)),  dQ = dS K,  dK = dS^T Q
#
# entirely in VMEM (rowsum(P*dP) == rowsum(g*o), so the forward needs no extra
# residuals — q/k/v are enough). All matmuls accumulate fp32 on the MXU; for
# low-precision inputs the P/dS operands are cast back to the input dtype
# before the second-stage matmuls, mirroring the forward's e.astype(v.dtype).


def _mha_bwd_head(q, k, v, g, scale: float, causal_mask):
    """One head's (dq, dk, dv), fp32 math, nothing leaves VMEM."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    if causal_mask is not None:
        s = jnp.where(causal_mask, s, NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=2, keepdims=True)  # (gb, Lq, Lk) fp32
    dp = jax.lax.dot_general(  # g[b,q,d] . v[b,k,d] -> (gb, Lq, Lk)
        g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(p * dp, axis=2, keepdims=True)  # == rowsum(g * o)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    pc = p.astype(v.dtype)
    dq = jax.lax.dot_general(  # ds[b,q,k] . k[b,k,d] -> (gb, Lq, Dh)
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(  # ds[b,q,k] . q[b,q,d] -> (gb, Lk, Dh)
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dv = jax.lax.dot_general(  # p[b,q,k] . g[b,q,d] -> (gb, Lk, Dh)
        pc, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return dq, dk, dv


def _mha_bld_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads: int, scale: float, causal: bool,
):
    gb, l, d = q_ref.shape
    dh = d // num_heads
    mask = _causal_mask(gb, l) if causal else None
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        dq, dk, dv = _mha_bwd_head(
            q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl], g_ref[:, :, sl],
            scale, mask,
        )
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _mha_qkv_bwd_kernel(
    qkv_ref, g_ref, dqkv_ref, *, num_heads: int, scale: float, causal: bool
):
    """Packed variant: reads the (gb, L, 3D) qkv block, writes the (gb, L, 3D)
    gradient block — the packed projection's VJP without ever splitting q/k/v
    into HBM buffers (the same profiling rationale as the forward qkv kernel)."""
    gb, l, d3 = qkv_ref.shape
    d = d3 // 3
    dh = d // num_heads
    mask = _causal_mask(gb, l) if causal else None
    for h in range(num_heads):
        sq = slice(h * dh, (h + 1) * dh)
        sk = slice(d + h * dh, d + (h + 1) * dh)
        sv = slice(2 * d + h * dh, 2 * d + (h + 1) * dh)
        dq, dk, dv = _mha_bwd_head(
            qkv_ref[:, :, sq], qkv_ref[:, :, sk], qkv_ref[:, :, sv],
            g_ref[:, :, sq], scale, mask,
        )
        dqkv_ref[:, :, sq] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, sk] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, sv] = dv.astype(dqkv_ref.dtype)


def _pick_gb_bwd(b: int, l: int, d: int, itemsize: int) -> int:
    """Batch-block for the backward kernels. Working set per program: 7 (g, L, D)
    blocks (q, k, v, g, dq, dk, dv — the packed variant's 2x(g, L, 3D) + (g, L, D)
    is the same total) double-buffered, plus ~3 fp32 (g, L, L) score/dp/ds
    scratch tensors for one head. The 12MB estimated budget is the
    hardware-conservative tier (same margin story as _pick_gb's un-raised
    tier); shapes past it fall back to the XLA-recompute VJP rather than risk
    an unvalidated Mosaic compile."""
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = 7 * g * l * d * itemsize * 2
        scratch = 3 * g * l * l * 4
        if blocks + scratch <= 12 * 1024 * 1024:
            return g
    return 0


def mha_bwd_eligible(b: int, l: int, d: int, num_heads: int, itemsize: int) -> bool:
    """Static check for the fused whole-block backward: same L<=448 Mosaic
    envelope as the forward (mha_eligible), with the backward's larger working
    set. Ineligible shapes take the XLA-recompute VJP."""
    return d % num_heads == 0 and l <= 448 and _pick_gb_bwd(b, l, d, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("num_heads", "causal", "interpret"))
def _mha_bld_bwd_impl(q, k, v, g, num_heads: int, causal: bool, interpret: bool):
    b, l, d = q.shape
    dh = d // num_heads
    gb = _pick_gb_bwd(b, l, d, q.dtype.itemsize)
    assert gb > 0, f"shape (B={b}, L={l}, D={d}) does not fit the fused MHA backward"
    kern = functools.partial(
        _mha_bld_bwd_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh),
        causal=causal,
    )
    spec = pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, l, d), q.dtype)
    return pl.pallas_call(
        kern,
        grid=(b // gb,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, g.astype(q.dtype))


@functools.partial(jax.jit, static_argnames=("num_heads", "causal", "interpret"))
def _mha_qkv_bwd_impl(qkv, g, num_heads: int, causal: bool, interpret: bool):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    gb = _pick_gb_bwd(b, l, d, qkv.dtype.itemsize)
    assert gb > 0, f"shape (B={b}, L={l}, D={d}) does not fit the fused MHA backward"
    kern = functools.partial(
        _mha_qkv_bwd_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh),
        causal=causal,
    )
    return pl.pallas_call(
        kern,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, l, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, l, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d3), qkv.dtype),
        interpret=interpret,
    )(qkv, g.astype(qkv.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mha_bld(q, k, v, num_heads: int, causal: bool = False, interpret: bool = False):
    """Fused attention over (B, L, D) q/k/v; heads split in VMEM; softmax in fp32.

    BACKWARD: a fused Pallas kernel when the shape fits (mha_bwd_eligible —
    the same L<=448 envelope with the backward's 7-block working set):
    scores/softmax recomputed per head in VMEM, exact dq/dk/dv via the softmax
    VJP, no (B, H, L, L) tensor in HBM. Ineligible shapes fall back to
    jax.vjp of the XLA formulation, which DOES materialize the fp32
    (B, H, L, L) score tensor in HBM on the backward — identical math, exact
    to rounding, but HBM-bound at scale.
    """
    return _mha_bld_impl(q, k, v, num_heads, causal, interpret)


def _mha_bld_fwd(q, k, v, num_heads, causal, interpret):
    return _mha_bld_impl(q, k, v, num_heads, causal, interpret), (q, k, v)


def _mha_bld_bwd(num_heads, causal, interpret, res, g):
    q, k, v = res
    b, l, d = q.shape
    if mha_bwd_eligible(b, l, d, num_heads, q.dtype.itemsize):
        return _mha_bld_bwd_impl(q, k, v, g, num_heads, causal, interpret)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_mha_bld(q_, k_, v_, num_heads, causal), q, k, v
    )
    return vjp(g)


fused_mha_bld.defvjp(_mha_bld_fwd, _mha_bld_bwd)


# ---------------------------------------------------------------------------
# (B, L, 3D) qkv-fused MHA — consumes the qkv projection output directly
# ---------------------------------------------------------------------------


def _mha_qkv_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float, causal: bool):
    """Like ``_mha_bld_kernel`` but q/k/v are static lane-slices of the single
    fused (gb, L, 3D) qkv block, so XLA never materializes split q/k/v HBM
    buffers (profiled: the 3-input form spent 8% of encode time in a kLoop
    fusion copying bf16[B,197,2304] into three bf16[B,197,768] buffers at
    960 GB/s purely to feed the pallas_call)."""
    gb, l, d3 = qkv_ref.shape
    d = d3 // 3
    dh = d // num_heads
    mask = _causal_mask(gb, l) if causal else None
    for h in range(num_heads):
        q = qkv_ref[:, :, h * dh : (h + 1) * dh]
        k = qkv_ref[:, :, d + h * dh : d + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        o_ref[:, :, h * dh : (h + 1) * dh] = _attend_head(
            q, k, v, scale, mask, o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("num_heads", "causal", "interpret"))
def _mha_qkv_impl(qkv, num_heads: int, causal: bool, interpret: bool):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    gb = _pick_gb(b, l, d, qkv.dtype.itemsize)
    assert gb > 0, f"shape (B={b}, L={l}, D={d}) does not fit the fused MHA kernel"
    kern = functools.partial(
        _mha_qkv_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh), causal=causal
    )
    return pl.pallas_call(
        kern,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, l, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((gb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        interpret=interpret,
        compiler_params=_whole_block_params(gb, l, d, qkv.dtype.itemsize, interpret),
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_mha_qkv(qkv, num_heads: int, causal: bool = False, interpret: bool = False):
    """Fused attention over a packed (B, L, 3D) qkv tensor (lane order q|k|v,
    matching ``x @ qkv_w``); heads split in VMEM; softmax in fp32. The packed
    input keeps the qkv projection's output as the kernel's only operand —
    zero intermediate HBM copies between the GEMM and attention.

    BACKWARD: the packed fused Pallas backward when the shape fits
    (mha_bwd_eligible) — (B, L, 3D) gradient written directly, scores
    recomputed in VMEM, no (B, H, L, L) HBM tensor. Otherwise jax.vjp of the
    XLA formulation (exact, but materializes fp32 scores in HBM)."""
    return _mha_qkv_impl(qkv, num_heads, causal, interpret)


def _mha_qkv_fwd(qkv, num_heads, causal, interpret):
    return _mha_qkv_impl(qkv, num_heads, causal, interpret), (qkv,)


def _mha_qkv_bwd(num_heads, causal, interpret, res, g):
    (qkv,) = res
    b, l, d3 = qkv.shape
    d = d3 // 3
    if mha_bwd_eligible(b, l, d, num_heads, qkv.dtype.itemsize):
        return (_mha_qkv_bwd_impl(qkv, g, num_heads, causal, interpret),)

    def ref_fn(qkv_):
        return _xla_mha_bld(
            qkv_[..., :d], qkv_[..., d : 2 * d], qkv_[..., 2 * d :], num_heads, causal
        )

    _, vjp = jax.vjp(ref_fn, qkv)
    return vjp(g)


fused_mha_qkv.defvjp(_mha_qkv_fwd, _mha_qkv_bwd)


# ---------------------------------------------------------------------------
# q-tiled MHA with resident KV — long sequences (ViT-L/14@336's L=577)
# ---------------------------------------------------------------------------
#
# The whole-block kernels above keep every (gb, L, ·) operand in VMEM at once,
# which Mosaic hard-caps near L=448 at ViT-L widths (see mha_eligible). Past
# that, instead of a full flash decomposition (running max/sum over KV blocks),
# the sequence lengths in scope (≤ ~1.5k) admit a simpler exact scheme: tile
# the *queries* over a second grid dimension and keep the whole K|V block
# resident in VMEM across those steps. Each program computes complete softmax
# rows (no rescaling passes), and the KV block is fetched from HBM once per
# batch group — the (B, H, L, L) score tensor still never exists in HBM.
# Measured at ViT-L/14@336 shape (B=32, L=577, D=1024, bf16, carry-chained) on
# v5e: 1.72-1.79 ms/layer at the tuned config (gb=4, balanced lq=120, raised
# VMEM limit) vs 3.3-3.4 for the XLA formulation — and within ~6% of a
# no-softmax dot+DMA ablation of the same kernel in the same run (1.79 vs
# 1.69), so nearly all remaining time is the memory/matmul floor itself.
#
# The caller supplies q and the packed k|v as *separate* arrays (two GEMMs of
# the same fused weight — same FLOPs) because one packed q|k|v input cannot be
# block-specced two ways: q needs L-tiling, k|v needs full L.


def _mha_qtile_kernel(q_ref, kv_ref, o_ref, *, num_heads: int, scale: float):
    gb, lq, d = q_ref.shape
    dh = d // num_heads
    for h in range(num_heads):
        q = q_ref[:, :, h * dh : (h + 1) * dh]
        k = kv_ref[:, :, h * dh : (h + 1) * dh]
        v = kv_ref[:, :, d + h * dh : d + (h + 1) * dh]
        o_ref[:, :, h * dh : (h + 1) * dh] = _attend_head(q, k, v, scale, None, o_ref.dtype)


def _qtile_lq(l: int) -> int:
    """Balanced q-tile: the smallest sublane-aligned tile that covers ``l`` in
    ceil(l/128) grid steps, capped at 128. A fixed lq=128 pads L=577's 5-tile
    sweep to 640 rows (11% wasted q work, 577 being prime); the balanced tile
    is 120, padding only to 600 (4%). Measured at the ViT-L/14@336 shape
    (B=32, bf16, carry-chained, 40 iters): 1.72 ms/layer vs 1.82 at lq=128."""
    steps = -(-l // 128)
    return min(128, (-(-l // steps) + 7) // 8 * 8)


# Per-kernel scoped-VMEM cap for the q-tiled kernel. XLA's default scoped limit
# is 16MB, but v5e VMEM is 128MB and a pallas_call may raise its own cap
# (CompilerParams.vmem_limit_bytes) — JAX's reference TPU attention kernels do
# the same. 64MB leaves half the physical VMEM for XLA's surrounding fusions
# and covers the budget below at Mosaic's measured ~1.75x actual/estimate
# margin (gb=2 at the L/14@336 shape estimates 11.0MB and Mosaic allocates
# 19.3MB when composed inside the full tower).
_QTILE_VMEM_LIMIT = 64 * 1024 * 1024


def _qtile_gb(b: int, l: int, d: int, itemsize: int) -> int:
    """Batch group for the q-tiled kernel. Working set per program: the resident
    (gb, L, 2D) k|v block plus (gb, lq, D) q/out blocks (each double-buffered)
    and the fp32 (gb, lq, L) score/exp scratch for one head. The 24MB estimated
    budget is hardware-calibrated at the ViT-L/14@336 shape under the raised
    _QTILE_VMEM_LIMIT: gb=4 (est. 22MB) compiles, validates, and runs 1.72
    ms/layer vs 1.82 at gb=2 and 2.01 at gb=1 — fewer, larger programs amortize
    the resident-KV DMA — while gb=8 (est. 44MB, ~77MB actual at Mosaic's
    ~1.75x margin) hard-crashes the Mosaic compile and is correctly excluded.
    The calibration (scripts/validate_qtile_config.py) swept bf16 only and up
    to L=1536, so the raised budget is doubly gated: on itemsize==2 AND on
    L<=1536 (the largest hardware-validated sequence — the 24MB budget alone
    would admit L≈2700 at D=1024, an unvalidated Mosaic compile whose failure
    mode elsewhere in this file is a hard crash, not a clean fallback).
    Outside either gate the conservative round-3 6MB budget applies, under
    which e.g. the fp32 @336 shape returns 0 and routes to the flash/XLA
    fallback instead."""
    raised = itemsize == 2 and l <= 1536
    budget = 24 * 1024 * 1024 if raised else 6 * 1024 * 1024
    lq = _qtile_lq(l)
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = 2 * g * (lq * d + l * 2 * d) * itemsize
        scratch = 2 * g * lq * l * 4
        if blocks + scratch <= budget:
            return g
    return 0


def mha_qtile_eligible(b: int, l: int, d: int, num_heads: int, itemsize: int) -> bool:
    """Static check for fused_mha_qtile: heads divide D and the resident-KV
    working set fits VMEM. No sequence cap of its own — the whole-block kernel
    (mha_eligible) is preferred below L=448; this covers the tail above it."""
    return d % num_heads == 0 and _qtile_gb(b, l, d, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _mha_qtile_impl(q, kv, num_heads: int, interpret: bool):
    b, l, d = q.shape
    dh = d // num_heads
    gb = _qtile_gb(b, l, d, q.dtype.itemsize)
    lq = _qtile_lq(l)
    if interpret and gb == 0:
        gb = 1  # interpret mode executes on CPU: no VMEM constraint to honor
    assert gb > 0, f"shape (B={b}, L={l}, D={d}) does not fit the q-tiled kernel"
    kern = functools.partial(
        _mha_qtile_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh)
    )
    return pl.pallas_call(
        kern,
        grid=(b // gb, pl.cdiv(l, lq)),
        in_specs=[
            pl.BlockSpec((gb, lq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            # index_map constant in j: the K|V block stays resident across q tiles
            pl.BlockSpec((gb, l, 2 * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb, lq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=interpret,
        # raise the scoped-VMEM cap past XLA's 16MB default (see _QTILE_VMEM_LIMIT);
        # interpret mode executes on CPU where TPU compiler params don't apply
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_QTILE_VMEM_LIMIT),
    )(q, kv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mha_qtile(q, kv, num_heads: int, interpret: bool = False):
    """Exact attention over q (B, L, D) and packed k|v (B, L, 2D), queries tiled
    over a grid with the K|V block resident in VMEM; softmax in fp32. For
    sequences past the whole-block kernels' VMEM cap. Non-causal only (the only
    long-L consumer is the vision tower; the causal text stack is L=77).

    BACKWARD: a q-tiled fused Pallas kernel when the shape fits
    (mha_qtile_bwd_eligible) — dq written per q-tile, dk|dv accumulated in an
    fp32 VMEM scratch across the resident-KV q-tile sweep, no (B, H, L, L)
    tensor in HBM. Otherwise jax.vjp of the XLA formulation (exact, but
    materializes fp32 scores in HBM — nothing in the supported model
    differentiates through this rung: the ViT is frozen, the trainable text
    tower is L=77 whole-block)."""
    return _mha_qtile_impl(q, kv, num_heads, interpret)


def _mha_qtile_fwd(q, kv, num_heads, interpret):
    return _mha_qtile_impl(q, kv, num_heads, interpret), (q, kv)


def _mha_qtile_bwd_kernel(
    q_ref, kv_ref, g_ref, dq_ref, dkv_ref, acc_ref,
    *, num_heads: int, scale: float, seq_len: int,
):
    """Backward over the q-tiled layout: grid (B/gb, n_q) with KV resident.

    Per q-tile: complete softmax rows (no rescaling — KV is whole), the exact
    softmax VJP for dq, and the tile's dk/dv contributions accumulated into an
    fp32 scratch that is flushed to the dkv output block on the last tile.
    Padded rows of the final partial q-tile are masked OUT of the dk/dv sums
    (they would otherwise contribute garbage: block padding is undefined)."""
    gb, lq, d = q_ref.shape
    dh = d // num_heads
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # valid-row mask for the final partial tile (gb, lq, 1)
    row = j * lq + jax.lax.broadcasted_iota(jnp.int32, (gb, lq, 1), 1)
    valid = row < seq_len

    for h in range(num_heads):
        sq = slice(h * dh, (h + 1) * dh)
        sk = slice(h * dh, (h + 1) * dh)
        sv = slice(d + h * dh, d + (h + 1) * dh)
        q = q_ref[:, :, sq]
        k = kv_ref[:, :, sk]
        v = kv_ref[:, :, sv]
        g = g_ref[:, :, sq]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        # padded q rows can hold undefined data: clamp before exp so p stays
        # finite, then zero their contributions explicitly below
        s = jnp.where(valid, s, 0.0)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=2, keepdims=True)
        dp = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=2, keepdims=True)
        ds = jnp.where(valid, p * (dp - delta) * scale, 0.0).astype(q.dtype)
        pm = jnp.where(valid, p, 0.0).astype(v.dtype)
        # zero padded q/g rows too: ds/pm are 0 there, but 0 * garbage
        # (undefined block padding) would still poison the contractions
        qm = jnp.where(valid, q, 0).astype(q.dtype)
        gm = jnp.where(valid, g, 0).astype(g.dtype)
        dq_ref[:, :, sq] = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        acc_ref[:, :, sk] += jax.lax.dot_general(  # dk contribution
            ds, qm, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        acc_ref[:, :, sv] += jax.lax.dot_general(  # dv contribution
            pm, gm, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        dkv_ref[...] = acc_ref[...].astype(dkv_ref.dtype)


def _qtile_bwd_gb(b: int, l: int, d: int, itemsize: int) -> int:
    """Batch group for the q-tiled backward. Working set per program: the
    resident (g, L, 2D) kv block + the (g, L, 2D) dkv output + the fp32
    (g, L, 2D) accumulator scratch, plus 3 double-buffered (g, lq, D) tiles
    (q, g, dq) and ~3 fp32 (g, lq, L) score/dp/ds tensors for one head. The
    conservative 20MB estimated budget admits gb=1 at the ViT-L/14@336 shape
    (est. ~17MB) under the raised _QTILE_VMEM_LIMIT; larger groups wait for a
    hardware sweep (scripts/bench_attn_bwd.py --qtile validates the compile +
    parity on the chip)."""
    lq = _qtile_lq(l)
    for g in (4, 2, 1):
        if b % g:
            continue
        resident = g * l * 2 * d * (2 * itemsize + 4)  # kv + dkv + fp32 acc
        tiles = 3 * 2 * g * lq * d * itemsize
        scratch = 3 * g * lq * l * 4
        if resident + tiles + scratch <= 20 * 1024 * 1024:
            return g
    return 0


def mha_qtile_bwd_eligible(b: int, l: int, d: int, num_heads: int, itemsize: int) -> bool:
    """Static check for the q-tiled fused backward; ineligible shapes take the
    XLA-recompute VJP."""
    return d % num_heads == 0 and _qtile_bwd_gb(b, l, d, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _mha_qtile_bwd_impl(q, kv, g, num_heads: int, interpret: bool):
    b, l, d = q.shape
    dh = d // num_heads
    gb = _qtile_bwd_gb(b, l, d, q.dtype.itemsize)
    lq = _qtile_lq(l)
    if interpret and gb == 0:
        gb = 1  # interpret mode executes on CPU: no VMEM constraint to honor
    assert gb > 0, f"shape (B={b}, L={l}, D={d}) does not fit the q-tiled backward"
    kern = functools.partial(
        _mha_qtile_bwd_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh),
        seq_len=l,
    )
    q_spec = pl.BlockSpec((gb, lq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((gb, l, 2 * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dkv = pl.pallas_call(
        kern,
        grid=(b // gb, pl.cdiv(l, lq)),
        in_specs=[q_spec, kv_spec, q_spec],
        out_specs=(q_spec, kv_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, l, 2 * d), kv.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((gb, l, 2 * d), jnp.float32)],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_QTILE_VMEM_LIMIT),
    )(q, kv, g.astype(q.dtype))
    return dq, dkv


def _mha_qtile_bwd(num_heads, interpret, res, g):
    q, kv = res
    b, l, d = q.shape
    if mha_qtile_bwd_eligible(b, l, d, num_heads, q.dtype.itemsize):
        return _mha_qtile_bwd_impl(q, kv, g, num_heads, interpret)
    _, vjp = jax.vjp(
        lambda q_, kv_: _xla_mha_bld(q_, kv_[..., :d], kv_[..., d:], num_heads, False),
        q, kv,
    )
    return vjp(g)


fused_mha_qtile.defvjp(_mha_qtile_fwd, _mha_qtile_bwd)


# ---------------------------------------------------------------------------
# Flash attention (KV-blocked, online softmax) — unbounded sequence length
# ---------------------------------------------------------------------------
#
# Above the q-tiled kernel's resident-KV envelope (L ≳ 2700 at D=1024) the KV
# block itself no longer fits VMEM, so both block dimensions must tile: the
# classic flash decomposition with a running (max, sum, accumulator) triple
# updated per KV block. Per-head layout (BH, L, dh) — at these lengths the
# one-off head-split transposes are noise next to the O(L²) score traffic the
# kernel avoids. Grid is (BH/g, n_q, n_kv) with KV innermost: the q block and
# the scratch stay resident across the KV sweep, and the output block is
# written once at the final KV step.


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest,
    scale: float, seq_len: int, save_lse: bool,
):
    if save_lse:
        lse_ref, acc_ref, m_ref, s_ref = rest
    else:
        lse_ref, (acc_ref, m_ref, s_ref) = None, rest
    g, lq, dh = q_ref.shape
    lkv = k_ref.shape[1]
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)

    s_blk = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (g, lq, lkv)
    # mask the final partial KV block: padded key rows must not enter softmax
    col = k_step * lkv + jax.lax.broadcasted_iota(jnp.int32, (g, lq, lkv), 2)
    s_blk = jnp.where(col < seq_len, s_blk, NEG_INF)

    m_old = m_ref[:, :, :1]
    m_new = jnp.maximum(m_old, jnp.max(s_blk, axis=2, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(s_blk - m_new)
    # zero padded V rows too: p is 0 there, but 0 * garbage (NaN/inf padding)
    # would still poison the contraction
    vrow = k_step * lkv + jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1)
    v_blk = jnp.where(vrow < seq_len, v_ref[...], 0).astype(v_ref.dtype)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_blk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s_ref[:, :, :1] = s_ref[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
    m_ref[:, :, :1] = m_new

    @pl.when(k_step == pl.num_programs(2) - 1)
    def _finish():
        o_ref[...] = (acc_ref[...] / s_ref[:, :, :1]).astype(o_ref.dtype)
        if save_lse:
            # log-sum-exp per row: the backward's residual (p = exp(s - lse)
            # is the exact softmax without re-running the online rescaling).
            # Broadcast across the 128-lane trailing dim: Mosaic requires
            # output blocks' last two dims (8, 128)-aligned, so a 2D (N, L)
            # residual with a (1, lq) block cannot lower — the (N, L, 128)
            # layout is the same one
            # jax.experimental.pallas.ops.tpu.flash_attention uses for l/m
            lse_ref[...] = jnp.broadcast_to(
                m_ref[:, :, :1] + jnp.log(s_ref[:, :, :1]), lse_ref.shape
            )


_FLASH_LQ = 256
_FLASH_LKV = 512


def flash_eligible(n: int, l: int, dh: int, itemsize: int) -> bool:
    """Static check for flash_attention_heads: practical envelope is any L —
    per-program VMEM is O(lq·lkv + lq·dh), independent of L."""
    return dh <= 256 and l >= 2


@functools.partial(jax.jit, static_argnames=("interpret", "save_lse"))
def _flash_impl(q, k, v, interpret: bool, save_lse: bool = False):
    """-> out (N, L, dh), or (out, lse) with ``save_lse`` — the differentiated
    path's residual. lse is (N, L, 128) fp32, lane-broadcast: Mosaic's
    (8, 128) output-block alignment rule rejects a 2D (N, L) residual with a
    (1, lq) block, so it rides in the same layout the reference JAX TPU flash
    kernel uses for its l/m residuals. The primal/inference path skips the
    write entirely (one O(N*L*128) HBM stream it never needs)."""
    n, l, dh = q.shape
    g = 1
    lq, lkv = min(_FLASH_LQ, l), min(_FLASH_LKV, l)
    kern = functools.partial(
        _flash_kernel, scale=1.0 / math.sqrt(dh), seq_len=l, save_lse=save_lse
    )
    o_spec = pl.BlockSpec((g, lq, dh), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((g, lq, 128), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((n, l, dh), q.dtype)
    lse_shape = jax.ShapeDtypeStruct((n, l, 128), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(n // g, pl.cdiv(l, lq), pl.cdiv(l, lkv)),
        in_specs=[
            pl.BlockSpec((g, lq, dh), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lkv, dh), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lkv, dh), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec, lse_spec) if save_lse else o_spec,
        out_shape=(o_shape, lse_shape) if save_lse else o_shape,
        scratch_shapes=[
            pltpu.VMEM((g, lq, dh), jnp.float32),   # acc
            pltpu.VMEM((g, lq, 128), jnp.float32),  # running max (lane 0)
            pltpu.VMEM((g, lq, 128), jnp.float32),  # running sum (lane 0)
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, scale: float, seq_len: int,
):
    """dq pass: grid (N, n_q, n_kv), KV innermost. The q/g/lse/delta blocks and
    the fp32 dq accumulator stay resident across the KV sweep; p is rebuilt
    exactly from the forward's saved log-sum-exp (no online rescaling)."""
    g_, lq, dh = q_ref.shape
    lkv = k_ref.shape[1]
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s_blk = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    col = k_step * lkv + jax.lax.broadcasted_iota(jnp.int32, (g_, lq, lkv), 2)
    s_blk = jnp.where(col < seq_len, s_blk, NEG_INF)
    p = jnp.exp(s_blk - lse_ref[:, :, :1])  # exact softmax rows (lse lane 0)
    krow = k_step * lkv + jax.lax.broadcasted_iota(jnp.int32, k_ref.shape, 1)
    vm = jnp.where(krow < seq_len, v_ref[...], 0).astype(v_ref.dtype)
    km = jnp.where(krow < seq_len, k_ref[...], 0).astype(k_ref.dtype)
    dp = jax.lax.dot_general(
        g_ref[...], vm, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta_ref[:, :, :1]) * scale).astype(q_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        ds, km, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )

    @pl.when(k_step == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[...] = acc_ref[...].astype(dq_ref.dtype)


def _flash_dkv_kernel(
    k_ref, v_ref, q_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale: float, seq_len: int,
):
    """dk/dv pass: grid (N, n_kv, n_q), Q innermost. The k/v blocks and the
    fp32 dk/dv accumulators stay resident across the q sweep; padded q rows
    are masked out of every contraction (p/ds zeroed AND the q/g operands
    zeroed — 0 * undefined block padding still poisons the sums)."""
    g_, lkv, dh = k_ref.shape
    lq = q_ref.shape[1]
    j_kv = pl.program_id(1)
    q_step = pl.program_id(2)

    @pl.when(q_step == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    row = q_step * lq + jax.lax.broadcasted_iota(jnp.int32, (g_, lq, 1), 1)
    rvalid = row < seq_len
    qm = jnp.where(rvalid, q_ref[...], 0).astype(q_ref.dtype)
    gm = jnp.where(rvalid, g_ref[...], 0).astype(g_ref.dtype)

    s_blk = jax.lax.dot_general(
        qm, k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    col = j_kv * lkv + jax.lax.broadcasted_iota(jnp.int32, (g_, lq, lkv), 2)
    s_blk = jnp.where(col < seq_len, s_blk, NEG_INF)
    # padded q rows carry garbage lse (trimmed in the forward's output): build
    # p/ds through where() so their NaN/inf never reaches the accumulators
    p = jnp.where(rvalid, jnp.exp(s_blk - lse_ref[:, :, :1]), 0.0)
    dp = jax.lax.dot_general(
        gm, v_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = jnp.where(
        rvalid, p * (dp - delta_ref[:, :, :1]) * scale, 0.0
    ).astype(q_ref.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, qm, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dv_acc[...] += jax.lax.dot_general(
        p.astype(v_ref.dtype), gm, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_step == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_bwd_impl(q, k, v, g, lse, o, interpret: bool):
    """KV-blocked backward: two passes (dq with KV innermost, dk/dv with Q
    innermost — each pass's fp32 accumulators live in VMEM while its outer
    block is resident), per-program VMEM independent of L like the forward.

    delta = rowsum(p∘dp) needs the FULL row, which a blocked pass never sees
    at once — but it equals rowsum(g∘o), and the primal output is already in
    hand at defvjp time, so it rides along as one (N, L, dh) residual (same
    size as q) and delta reduces in one elementwise XLA pass — no third
    O(L²) forward-recompute sweep."""
    n, l, dh = q.shape
    gsz = 1
    lq, lkv = min(_FLASH_LQ, l), min(_FLASH_LKV, l)
    scale = 1.0 / math.sqrt(dh)

    # lane-broadcast to the same Mosaic-compliant (N, L, 128) layout as lse
    delta = jnp.broadcast_to(
        jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[:, :, None],
        (n, l, 128),
    )

    row_spec = pl.BlockSpec((gsz, lq, dh), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((gsz, lkv, dh), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((gsz, lq, 128), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, seq_len=l),
        grid=(n // gsz, pl.cdiv(l, lq), pl.cdiv(l, lkv)),
        in_specs=[row_spec, kv_spec, kv_spec, row_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec(
            (gsz, lq, dh), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, l, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((gsz, lq, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    # dkv pass: grid dims (i, kv-block, q-step)
    kvb_spec = pl.BlockSpec((gsz, lkv, dh), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM)
    qb_spec = pl.BlockSpec((gsz, lq, dh), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM)
    vecb_spec = pl.BlockSpec((gsz, lq, 128), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, seq_len=l),
        grid=(n // gsz, pl.cdiv(l, lkv), pl.cdiv(l, lq)),
        in_specs=[kvb_spec, kvb_spec, qb_spec, qb_spec, vecb_spec, vecb_spec],
        out_specs=(kvb_spec, kvb_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, l, dh), k.dtype),
            jax.ShapeDtypeStruct((n, l, dh), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((gsz, lkv, dh), jnp.float32),
            pltpu.VMEM((gsz, lkv, dh), jnp.float32),
        ],
        interpret=interpret,
    )(k, v, q, g, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_heads(q, k, v, interpret: bool = False):
    """Exact attention over per-head (BH, L, dh) operands with KV-blocked online
    softmax — no sequence-length cap (VMEM use is independent of L). Non-causal
    (the only long-L consumer is the vision tower).

    BACKWARD: KV-blocked fused Pallas kernels — a dq pass (KV innermost, fp32
    dq accumulator resident) and a dk/dv pass (Q innermost, fp32 accumulators
    resident), p rebuilt exactly from the forward's saved log-sum-exp. Like
    the forward, per-program VMEM is independent of L, so training through
    this rung never materializes the (BH, L, L) score tensor the XLA VJP
    would need (which can exceed HBM outright at the lengths this kernel
    exists for)."""
    return _flash_impl(q, k, v, interpret)


def _flash_fwd(q, k, v, interpret):
    out, lse = _flash_impl(q, k, v, interpret, save_lse=True)
    return out, (q, k, v, lse, out)


def _flash_bwd(interpret, res, g):
    q, k, v, lse, out = res
    return _flash_bwd_impl(q, k, v, g.astype(q.dtype), lse, out, interpret)


flash_attention_heads.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# (B, H, L, Dh) per-head fused attention — for callers holding split heads
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool):
    q = q_ref[...]  # (G, L, Dh)
    g, l, _ = q.shape
    mask = _causal_mask(g, l) if causal else None
    o_ref[...] = _attend_head(q, k_ref[...], v_ref[...], scale, mask, o_ref.dtype)


def _xla_attention(q, k, v, causal):
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(head_dim))
    if causal:
        l = q.shape[2]
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _pick_g(n: int, l: int, dh: int, itemsize: int) -> int:
    """(batch*head)-group for the per-head kernel. The 6MB budget is tighter
    than _pick_gb's: measured scoped-VMEM runs ~1.6x the estimate (the L=577
    ViT-L/14@336 shape OOMed at 18.5M real vs ~21M estimated scratch with g=8),
    so 6MB estimated keeps the real footprint under ~10MB of the 16MB total."""
    return _pick_group(n, l, dh, itemsize, 6 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def _fused_attention_impl(q, k, v, causal: bool, interpret: bool):
    b, h, l, dh = q.shape
    n = b * h
    g = _pick_g(n, l, dh, q.dtype.itemsize)
    if g < 4:
        # shape outside the whole-block kernel's efficient envelope: g<4 means
        # either VMEM wouldn't fit at all (g=0) or the grid degenerates into
        # thousands of under-sized serialized programs (measured: L=577 at g=1
        # is orders of magnitude slower than XLA). Long non-causal sequences
        # take the KV-blocked flash kernel (VMEM use independent of L); causal
        # or tiny shapes take the XLA formulation — same math, fp32 softmax.
        if not causal and flash_eligible(b * h, l, dh, q.dtype.itemsize):
            return flash_attention_heads(
                q.reshape(b * h, l, dh),
                k.reshape(b * h, l, dh),
                v.reshape(b * h, l, dh),
                interpret,
            ).reshape(b, h, l, dh)
        return _xla_attention(q, k, v, causal)
    qf, kf, vf = (t.reshape(n, l, dh) for t in (q, k, v))
    kernel = functools.partial(_attn_kernel, scale=1.0 / math.sqrt(dh), causal=causal)
    out = pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, dh), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, l, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, causal: bool = False, interpret: bool = False):
    """Fused attention over (B, H, L, Dh); softmax in fp32; scores stay in VMEM.

    BACKWARD: heads fold into the batch axis and run the fused whole-block
    Pallas backward (single-head (B*H, L, Dh) layout) when mha_bwd_eligible;
    past that envelope, non-causal shapes mirror the forward's routing and
    differentiate through flash_attention_heads' KV-blocked fused backward
    (VMEM independent of L, at the cost of one forward re-run to rebuild its
    lse residual); only causal shapes past the whole-block envelope fall to
    jax.vjp of the XLA formulation, which materializes the fp32 (B, H, L, L)
    score tensor in HBM (no supported model has one: the causal text stack
    is L=77)."""
    return _fused_attention_impl(q, k, v, causal, interpret)


def _fused_attention_fwd(q, k, v, causal, interpret):
    return _fused_attention_impl(q, k, v, causal, interpret), (q, k, v)


def _fused_attention_bwd(causal, interpret, res, g):
    q, k, v = res
    b, h, l, dh = q.shape
    if mha_bwd_eligible(b * h, l, dh, 1, q.dtype.itemsize):
        dq, dk, dv = _mha_bld_bwd_impl(
            q.reshape(b * h, l, dh), k.reshape(b * h, l, dh),
            v.reshape(b * h, l, dh), g.reshape(b * h, l, dh),
            1, causal, interpret,
        )
        return (dq.reshape(b, h, l, dh), dk.reshape(b, h, l, dh),
                dv.reshape(b, h, l, dh))
    if not causal and flash_eligible(b * h, l, dh, q.dtype.itemsize):
        # mirror the forward's routing: long non-causal shapes differentiate
        # through flash_attention_heads' KV-blocked fused backward (VMEM
        # independent of L) — the XLA VJP below would materialize an fp32
        # (B, H, L, L) score tensor that can exceed HBM outright here
        qf, kf, vf = (t.reshape(b * h, l, dh) for t in (q, k, v))
        _, vjp = jax.vjp(
            lambda q_, k_, v_: flash_attention_heads(q_, k_, v_, interpret),
            qf, kf, vf,
        )
        dq, dk, dv = vjp(g.reshape(b * h, l, dh))
        return (dq.reshape(b, h, l, dh), dk.reshape(b, h, l, dh),
                dv.reshape(b, h, l, dh))
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, causal), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
