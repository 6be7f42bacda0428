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
