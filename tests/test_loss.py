"""Loss parity vs the reference ComputeLoss (torch oracle; fully deterministic)."""

import numpy as np
import pytest

from anomalyclip_tpu.models.losses import LossConfig, compute_loss
from tests.helpers.reference_oracle import load_reference_loss, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

B, N, L, C = 8, 4, 3, 6  # C includes the normal class
NORMAL_ID = 2
K = 2

CFG = LossConfig(
    normal_id=NORMAL_ID,
    num_topk=K,
    lambda_dir_abn=1.0,
    lambda_dir_nor=1.0,
    lambda_topk_abn=1.0,
    lambda_bottomk_abn=1.0,
    lambda_topk_nor=1.0,
    lambda_smooth=8e-4,
    lambda_sparse=8e-3,
    frames_per_segment=L,
    num_segments=N,
)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    similarity = rng.standard_normal((B * N * L, C - 1)).astype(np.float32)
    similarity_topk = rng.standard_normal((B * K * L, C - 1)).astype(np.float32)
    labels = np.concatenate(
        [rng.choice([0, 1, 3, 4, 5], size=B // 2), np.full(B // 2, NORMAL_ID)]
    ).astype(np.int64)
    scores = rng.uniform(0.05, 0.95, size=(B * N * L,)).astype(np.float32)
    idx_topk_abn = np.stack([rng.choice(N, K, replace=False) for _ in range(B // 2)]).astype(np.int64)
    idx_topk_nor = np.stack([rng.choice(N, K, replace=False) for _ in range(B // 2)]).astype(np.int64)
    idx_bottomk_abn = np.stack([rng.choice(N, K, replace=False) for _ in range(B // 2)]).astype(np.int64)
    return similarity, similarity_topk, labels, scores, idx_topk_abn, idx_topk_nor, idx_bottomk_abn


def test_all_terms_match_reference():
    import torch

    ref = load_reference_loss()
    oracle = ref.ComputeLoss(
        normal_id=NORMAL_ID,
        num_topk=K,
        lambda_dir_abn=1.0,
        lambda_dir_nor=1.0,
        lambda_topk_abn=1.0,
        lambda_bottomk_abn=1.0,
        lambda_topk_nor=1.0,
        lambda_smooth=8e-4,
        lambda_sparse=8e-3,
        frames_per_segment=L,
        num_segments=N,
    )

    sim, sim_topk, labels, scores, ia, inr, ib = _inputs()
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(sim),
            torch.from_numpy(sim_topk),
            torch.from_numpy(labels),
            torch.from_numpy(scores),
            torch.from_numpy(ia),
            torch.from_numpy(inr),
            torch.from_numpy(ib),
        )
    got = compute_loss(sim, sim_topk, labels, scores, ia, inr, ib, CFG)

    names = [
        "total",
        "ldir_abn",
        "ldir_nor",
        "ltopk_abn",
        "lbottomk_abn",
        "ltopk_nor",
        "lsmooth",
        "lsparse",
    ]
    for name, got_term, want_term in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(got_term),
            want_term.numpy(),
            rtol=1e-4,
            atol=1e-5,
            err_msg=name,
        )


def test_loss_is_differentiable():
    """Grad flows through similarity/scores with no NaNs (jit + grad compose)."""
    import jax
    import jax.numpy as jnp

    sim, sim_topk, labels, scores, ia, inr, ib = _inputs(1)

    def fn(sim, sim_topk, scores):
        return compute_loss(sim, sim_topk, labels, scores, ia, inr, ib, CFG).total

    grads = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))(
        jnp.asarray(sim), jnp.asarray(sim_topk), jnp.asarray(scores)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_saturated_scores_stay_finite():
    """A sigmoid score of exactly 0.0/1.0 (routine once the temporal logit
    passes ~16.7 in fp32) must not -inf the NLL terms or NaN the gradient —
    the log is clamped (a deliberate, numerically invisible parity deviation
    from the reference's raw NLLLoss-on-log(probs))."""
    import jax
    import jax.numpy as jnp

    sim, sim_topk, labels, scores, ia, inr, ib = _inputs(3)
    scores = scores.copy()
    scores[::2] = 1.0  # saturated anomalous frames -> normal_probs == 0
    scores[1::2] = 0.0  # saturated normal frames -> class_probs == 0

    terms = compute_loss(sim, sim_topk, labels, scores, ia, inr, ib, CFG)
    assert np.isfinite(float(terms.total))

    def total(s):
        return compute_loss(sim, sim_topk, labels, s, ia, inr, ib, CFG).total

    grad = jax.grad(lambda s: total(s))(jnp.asarray(scores))
    assert bool(jnp.all(jnp.isfinite(grad)))
