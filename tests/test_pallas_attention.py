"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _reference_attention(q, k, v, causal=False):
    b, h, l, dh = q.shape
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / np.sqrt(dh))
    if causal:
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@pytest.mark.parametrize("l,dh", [(197, 64), (77, 64), (16, 32), (32, 16)])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_matches_reference_fp32(l, dh, causal):
    from anomalyclip_tpu.ops.pallas.attention import fused_attention

    rng = np.random.default_rng(0)
    b, h = 2, 3
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.float32)

    want = np.asarray(_reference_attention(q, k, v, causal))
    got = np.asarray(fused_attention(q, k, v, causal=causal, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_matches_reference_bf16():
    from anomalyclip_tpu.ops.pallas.attention import fused_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 4, 197, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 4, 197, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 4, 197, 64)), jnp.bfloat16)
    want = np.asarray(_reference_attention(q, k, v)).astype(np.float32)
    got = np.asarray(fused_attention(q, k, v, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def _reference_mha_bld(q, k, v, num_heads, causal=False):
    b, l, d = q.shape
    dh = d // num_heads
    sh = lambda t: t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)
    out = _reference_attention(sh(q), sh(k), sh(v), causal)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d)


@pytest.mark.parametrize("b,l,d,h", [(8, 197, 768, 12), (14, 77, 512, 8), (4, 32, 64, 4)])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_bld_matches_reference_fp32(b, l, d, h, causal):
    """The production (B, L, D) lane-sliced kernel vs the reference formulation."""
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_bld, mha_eligible

    assert mha_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    want = np.asarray(_reference_mha_bld(q, k, v, h, causal))
    got = np.asarray(fused_mha_bld(q, k, v, h, causal, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_mha_bld_grad_matches_xla():
    """Custom-VJP backward (XLA recompute) vs autodiff through the reference."""
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_bld

    rng = np.random.default_rng(3)
    b, l, d, h = 2, 16, 32, 4
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_mha_bld(q, k, v, h, True, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_mha_bld(q, k, v, h, causal=True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)

@pytest.mark.parametrize("b,l,d,h", [(8, 197, 768, 12), (14, 77, 512, 8), (4, 32, 64, 4)])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_qkv_matches_reference_fp32(b, l, d, h, causal):
    """The packed (B, L, 3D) kernel (zero q/k/v HBM splits) vs the reference."""
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_qkv, mha_eligible

    assert mha_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)), jnp.float32)
    want = np.asarray(
        _reference_mha_bld(qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :], h, causal)
    )
    got = np.asarray(fused_mha_qkv(qkv, h, causal, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_mha_qkv_grad_matches_xla():
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_qkv

    rng = np.random.default_rng(6)
    b, l, d, h = 2, 16, 32, 4
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)), jnp.float32)

    def loss_fused(qkv):
        return jnp.sum(fused_mha_qkv(qkv, h, True, True) ** 2)

    def loss_ref(qkv):
        return jnp.sum(
            _reference_mha_bld(
                qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :], h, causal=True
            )
            ** 2
        )

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "b,l,d,h",
    [
        (2, 577, 1024, 16),  # ViT-L/14@336 (partial final q tile: 577 = 4*128+65)
        (2, 512, 256, 4),    # exact tiling
        (4, 197, 768, 12),   # short-L sanity (same math as the whole-block path)
    ],
)
def test_fused_mha_qtile_matches_reference_fp32(b, l, d, h):
    """The q-tiled resident-KV kernel (long sequences) vs the reference."""
    from anomalyclip_tpu.ops.pallas.attention import (
        fused_mha_qtile,
        mha_qtile_eligible,
    )

    # the hardware path runs bf16; fp32 here is for interpret-mode exactness
    assert mha_qtile_eligible(b, l, d, h, 2)
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, l, 2 * d)), jnp.float32)
    want = np.asarray(_reference_mha_bld(q, kv[..., :d], kv[..., d:], h, causal=False))
    got = np.asarray(fused_mha_qtile(q, kv, h, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_mha_qtile_grad_matches_xla():
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_qtile

    rng = np.random.default_rng(10)
    b, l, d, h = 2, 16, 32, 4
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, l, 2 * d)), jnp.float32)

    def loss_fused(q, kv):
        return jnp.sum(fused_mha_qtile(q, kv, h, True) ** 2)

    def loss_ref(q, kv):
        return jnp.sum(_reference_mha_bld(q, kv[..., :d], kv[..., d:], h, False) ** 2)

    gq, gkv = jax.grad(loss_fused, argnums=(0, 1))(q, kv)
    rq, rkv = jax.grad(loss_ref, argnums=(0, 1))(q, kv)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gkv), np.asarray(rkv), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "n,l,dh",
    [
        (4, 64, 64),     # single KV block (degenerate flash = plain softmax)
        (2, 577, 64),    # partial final q and KV blocks (577 = 2*256 + 65)
        (2, 1536, 64),   # multi-block KV sweep
        (3, 300, 32),    # non-128 dh, ragged everything
    ],
)
def test_flash_attention_matches_reference_fp32(n, l, dh):
    """KV-blocked online-softmax kernel vs the reference, incl. ragged tails."""
    from anomalyclip_tpu.ops.pallas.attention import flash_attention_heads

    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((n, l, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, l, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, l, dh)), jnp.float32)
    want = np.asarray(
        _reference_attention(q[:, None], k[:, None], v[:, None], causal=False)[:, 0]
    )
    got = np.asarray(flash_attention_heads(q, k, v, True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_attention_grad_matches_xla():
    from anomalyclip_tpu.ops.pallas.attention import flash_attention_heads

    rng = np.random.default_rng(12)
    n, l, dh = 2, 48, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, l, dh)), jnp.float32) for _ in range(3)
    )

    def loss_fused(q, k, v):
        return jnp.sum(flash_attention_heads(q, k, v, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            _reference_attention(q[:, None], k[:, None], v[:, None], False)[:, 0] ** 2
        )

    for gf, gr in zip(
        jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v),
        jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v),
    ):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_qtile_eligibility_covers_the_long_tail():
    """Shapes past the whole-block cap route to the q-tiled kernel; shapes whose
    resident KV cannot fit VMEM still fall back to XLA."""
    from anomalyclip_tpu.ops.pallas.attention import mha_qtile_eligible

    assert mha_qtile_eligible(32, 577, 1024, 16, 2)  # ViT-L/14@336 bf16
    assert mha_qtile_eligible(32, 1024, 512, 8, 2)  # longer L at smaller width
    # L=1024 and L=1536 at D=1024 fit the 24MB budget — hardware-validated
    # (compile, match XLA to bf16 rounding, and beat the flash kernel there:
    # 3.06 vs 6.17 ms at L=1024 on v5e, carry-chained)
    assert mha_qtile_eligible(32, 1024, 1024, 16, 2)
    assert mha_qtile_eligible(32, 1536, 1024, 16, 2)
    assert not mha_qtile_eligible(32, 3072, 1024, 16, 2)  # resident KV > budget
    assert not mha_qtile_eligible(32, 577, 1000, 16, 2)  # heads don't divide D


def test_raised_group_budgets_are_bf16_only():
    """The round-4 raised VMEM budgets (19MB whole-block, 24MB q-tiled) are
    hardware-calibrated with bf16 sweeps only (scripts/validate_pickgb.py,
    scripts/validate_qtile_config.py); float32 must keep the conservative,
    proven selections rather than inherit an unvalidated Mosaic compile."""
    from anomalyclip_tpu.ops.pallas.attention import (
        _pick_gb,
        _qtile_gb,
        mha_qtile_eligible,
    )

    # ViT-L/14 shape: bf16 gets the raised-budget gb=4; fp32 stays at gb=1
    # (its 12MB-budget selection — gb=2 would estimate 17.9MB, the same
    # footprint as the bf16 (32, 448) config that hard-crashes Mosaic)
    assert _pick_gb(64, 257, 1024, 2) == 4
    assert _pick_gb(64, 257, 1024, 4) == 1
    # ViT-L/14@336 shape: bf16 q-tiles at gb=4; fp32 exceeds the 6MB
    # conservative budget entirely and routes to the flash/XLA fallback
    assert _qtile_gb(32, 577, 1024, 2) == 4
    assert _qtile_gb(32, 577, 1024, 4) == 0
    assert not mha_qtile_eligible(32, 577, 1024, 16, 4)


def test_mha_eligibility_rejects_long_sequences():
    """The Mosaic compile hard-crashes at L>=512 (ViT-L/14@336's L=577 hits it);
    the static check must route those shapes to the XLA formulation."""
    from anomalyclip_tpu.ops.pallas.attention import mha_eligible

    assert mha_eligible(8, 448, 1024, 16, 2)  # largest validated on hardware
    assert not mha_eligible(8, 512, 1024, 16, 2)
    assert not mha_eligible(8, 577, 1024, 16, 2)


def test_per_head_kernel_routes_degenerate_groups(monkeypatch):
    """At L=577 (ViT-L/14@336) _pick_g degenerates to g<4; _fused_attention_impl
    must not serialize a tiny-group grid (or OOM the Mosaic compile, as L>=512
    does on hardware): non-causal shapes route to the KV-blocked flash kernel,
    causal ones to the XLA formulation."""
    import jax
    import numpy as np

    from anomalyclip_tpu.ops.pallas import attention as A

    assert A._pick_g(8 * 16, 577, 64, 2) < 4
    assert A._pick_g(8 * 16, 197, 64, 2) >= 4  # ViT-B/16 stays on the kernel

    flash_calls, xla_calls = [], []
    real_flash, real_xla = A.flash_attention_heads, A._xla_attention

    def rec_flash(q, k, v, interpret=False):
        flash_calls.append(q.shape)
        return real_flash(q, k, v, interpret)

    def rec_xla(q, k, v, causal):
        xla_calls.append(q.shape)
        return real_xla(q, k, v, causal)

    monkeypatch.setattr(A, "flash_attention_heads", rec_flash)
    monkeypatch.setattr(A, "_xla_attention", rec_xla)
    rng = np.random.default_rng(0)
    q, k, v = (
        jax.numpy.asarray(rng.standard_normal((1, 2, 577, 8)), jax.numpy.float32)
        for _ in range(3)
    )
    out = A.fused_attention(q, k, v, False, True)  # interpret=True: CPU-safe
    np.testing.assert_allclose(np.asarray(out), np.asarray(real_xla(q, k, v, False)),
                               rtol=1e-5, atol=1e-5)
    assert flash_calls, "non-causal degenerate shape must take the flash kernel"

    out_c = A.fused_attention(q, k, v, True, True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(real_xla(q, k, v, True)),
                               rtol=1e-5, atol=1e-5)
    assert xla_calls, "causal degenerate shape must take the XLA fallback"


# ---------------------------------------------------------------------------
# Fused whole-block BACKWARD (VERDICT r4 item 2): Pallas dq/dk/dv vs XLA VJP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "b,l,d,h,causal",
    [
        (14, 77, 512, 8, True),    # CoOp prompt-learning text tower (n_cls=14)
        (32, 32, 256, 8, False),   # temporal axial: segment axis (b*l, n, emb)
        (64, 16, 256, 8, False),   # temporal axial: frame axis (b*n, l, emb)
        (4, 197, 768, 12, False),  # unfrozen-ViT-B/16 regime
    ],
)
def test_fused_bwd_kernel_matches_xla_vjp_fp32(b, l, d, h, causal):
    """The fused Pallas backward (scores recomputed in VMEM, softmax VJP) must
    match autodiff through the XLA formulation at fp32 to ~1e-5 relative, at
    the shapes the model actually differentiates (text L=77, temporal 32/16)
    plus the unfrozen-encoder regime."""
    from anomalyclip_tpu.ops.pallas.attention import (
        _mha_bld_bwd_impl,
        mha_bwd_eligible,
    )

    assert mha_bwd_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(11)
    q, k, v, g = (
        jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32) for _ in range(4)
    )
    dq, dk, dv = _mha_bld_bwd_impl(q, k, v, g, h, causal, True)

    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_mha_bld(q_, k_, v_, h, causal), q, k, v)
    rq, rk, rv = vjp(g)
    scale = max(float(jnp.abs(t).max()) for t in (rq, rk, rv))
    for got, want, name in ((dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            rtol=1e-5, atol=1e-5 * scale, err_msg=name,
        )


def test_fused_qkv_bwd_kernel_matches_xla_vjp_fp32():
    """The packed (B, L, 3D) backward writes dqkv directly; parity vs autodiff
    through the reference at the text-tower shape."""
    from anomalyclip_tpu.ops.pallas.attention import (
        _mha_qkv_bwd_impl,
        mha_bwd_eligible,
    )

    b, l, d, h = 14, 77, 512, 8
    assert mha_bwd_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(12)
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    dqkv = _mha_qkv_bwd_impl(qkv, g, h, True, True)

    def ref_fn(qkv_):
        return _reference_mha_bld(
            qkv_[..., :d], qkv_[..., d : 2 * d], qkv_[..., 2 * d :], h, causal=True
        )

    _, vjp = jax.vjp(ref_fn, qkv)
    (want,) = vjp(g)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(dqkv), np.asarray(want), rtol=1e-5, atol=1e-5 * scale
    )


def test_fused_attention_bwd_folds_heads_through_kernel():
    """fused_attention's backward folds (B, H) into the kernel's batch axis;
    grads must match autodiff through the split-head reference."""
    from anomalyclip_tpu.ops.pallas.attention import fused_attention

    rng = np.random.default_rng(13)
    b, h, l, dh = 2, 8, 77, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.float32)
        for _ in range(3)
    )

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, True, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, causal=True) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(got, want):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_fused_bwd_bf16_sane():
    """bf16 inputs through the fused backward: fp32-accumulated, so agreement
    with an fp32 reference is bf16-rounding-bounded."""
    from anomalyclip_tpu.ops.pallas.attention import _mha_bld_bwd_impl

    rng = np.random.default_rng(14)
    b, l, d, h = 8, 77, 512, 8
    qf, kf, vf, gf = (rng.standard_normal((b, l, d)).astype(np.float32) for _ in range(4))
    dq, dk, dv = _mha_bld_bwd_impl(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16), jnp.asarray(gf, jnp.bfloat16),
        h, False, True,
    )
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_mha_bld(q_, k_, v_, h, False),
        jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf),
    )
    rq, rk, rv = vjp(jnp.asarray(gf))
    for got, want in ((dq, rq), (dk, rk), (dv, rv)):
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            rtol=0.05, atol=0.05 * scale,
        )


def test_bwd_ineligible_shape_falls_back_to_xla():
    """Past the L<=448 Mosaic envelope the custom VJP must route to the XLA
    recompute and stay correct (the qtile forward + XLA backward pairing)."""
    from anomalyclip_tpu.ops.pallas.attention import fused_mha_bld, mha_bwd_eligible

    b, l, d, h = 1, 512, 64, 2
    assert not mha_bwd_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(15)
    q, k, v = (jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32) for _ in range(3))

    def loss_fused(q, k, v):
        return jnp.sum(fused_mha_bld(q, k, v, h, False, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_mha_bld(q, k, v, h, causal=False) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(got, want):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "b,l,d,h",
    [
        (2, 577, 256, 4),  # partial final q tile (577 prime), the @336 regime
        (2, 512, 256, 4),  # exact tiling
    ],
)
def test_qtile_bwd_kernel_matches_xla_vjp_fp32(b, l, d, h):
    """The q-tiled fused backward (dq per tile, dk|dv accumulated in fp32
    scratch across the resident-KV sweep) vs autodiff through the reference.
    The padded rows of the final partial tile must contribute nothing."""
    from anomalyclip_tpu.ops.pallas.attention import (
        _mha_qtile_bwd_impl,
        mha_qtile_bwd_eligible,
    )

    assert mha_qtile_bwd_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, l, 2 * d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    dq, dkv = _mha_qtile_bwd_impl(q, kv, g, h, True)

    def ref_fn(q_, kv_):
        return _reference_mha_bld(q_, kv_[..., :d], kv_[..., d:], h, causal=False)

    _, vjp = jax.vjp(ref_fn, q, kv)
    rq, rkv = vjp(g)
    scale = max(float(jnp.abs(rq).max()), float(jnp.abs(rkv).max()))
    np.testing.assert_allclose(
        np.asarray(dq), np.asarray(rq), rtol=1e-5, atol=1e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(dkv), np.asarray(rkv), rtol=1e-5, atol=1e-5 * scale
    )


def test_fused_mha_qtile_grad_routes_through_kernel():
    """jax.grad through fused_mha_qtile takes the fused backward on eligible
    shapes and still matches autodiff through the reference."""
    from anomalyclip_tpu.ops.pallas.attention import (
        fused_mha_qtile,
        mha_qtile_bwd_eligible,
    )

    b, l, d, h = 2, 300, 128, 2
    assert mha_qtile_bwd_eligible(b, l, d, h, 4)
    rng = np.random.default_rng(22)
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, l, 2 * d)), jnp.float32)

    def loss_fused(q_, kv_):
        return jnp.sum(fused_mha_qtile(q_, kv_, h, True) ** 2)

    def loss_ref(q_, kv_):
        return jnp.sum(_reference_mha_bld(q_, kv_[..., :d], kv_[..., d:], h) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1))(q, kv)
    want = jax.grad(loss_ref, argnums=(0, 1))(q, kv)
    for gf, gr in zip(got, want):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_flash_bwd_multiblock_matches_xla_vjp_fp32():
    """The KV-blocked backward across MULTIPLE q and kv blocks with partial
    tails (L=1100: 5 q-tiles of 256 + 3 kv-blocks of 512, both ragged) —
    dq accumulation over kv, dk/dv accumulation over q, lse-exact p rebuild."""
    from anomalyclip_tpu.ops.pallas.attention import flash_attention_heads

    rng = np.random.default_rng(31)
    n, l, dh = 1, 1100, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, l, dh)), jnp.float32) for _ in range(3)
    )
    gout = jnp.asarray(rng.standard_normal((n, l, dh)), jnp.float32)

    out, vjp = jax.vjp(lambda a, b, c: flash_attention_heads(a, b, c, True), q, k, v)
    dq, dk, dv = vjp(gout)

    ref_out, ref_vjp = jax.vjp(
        lambda a, b, c: _reference_attention(a[:, None], b[:, None], c[:, None], False)[:, 0],
        q, k, v,
    )
    rq, rk, rv = ref_vjp(gout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    scale = max(float(jnp.abs(t).max()) for t in (rq, rk, rv))
    for got, want, name in ((dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            rtol=1e-5, atol=1e-5 * scale, err_msg=name,
        )


def test_fused_attention_long_bwd_routes_through_flash(monkeypatch):
    """Past the whole-block backward envelope, non-causal fused_attention
    gradients must mirror the forward's routing into the KV-blocked flash
    backward (VMEM independent of L) instead of the XLA VJP that materializes
    the fp32 (B, H, L, L) score tensor — and stay exact."""
    from anomalyclip_tpu.ops.pallas import attention as A

    b, h, l, dh = 1, 2, 512, 64
    assert not A.mha_bwd_eligible(b * h, l, dh, 1, 4)
    assert A.flash_eligible(b * h, l, dh, 4)

    rng = np.random.default_rng(33)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, l, dh)), jnp.float32) for _ in range(3)
    )

    hits = []
    real_bwd = A._flash_bwd_impl
    monkeypatch.setattr(
        A, "_flash_bwd_impl",
        lambda *a, **kw: (hits.append(1), real_bwd(*a, **kw))[1],
    )

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v, causal=False, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, causal=False) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    assert hits, "long non-causal backward did not route through the flash kernel"
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4, err_msg=name
        )
