"""The 7-term AnomalyCLIP training loss, as one pure jit-friendly function.

Re-design of the reference ComputeLoss (reference:
src/models/components/loss.py:5-195). All terms are computed with static shapes and
batched gathers; the reference's per-class Python loop for the abnormal direction
term (loss.py:87-96) collapses to a label-column gather with the same mean.

Terms (weights from configs/model/*.yaml:48-58):
    ldir_abn    -λ · mean of top-k abnormal logits at the GT class column
    ldir_nor    λ · mean over normal frames of the per-frame max logit
    ltopk_abn   NLL of joint class probs at GT class on top-k abnormal frames
    lbottomk_abn NLL at the normal class on bottom-k abnormal frames
    ltopk_nor   NLL at the normal class on top-k normal frames
    lsmooth     λ · Σ (s[t+1]-s[t])² over the flattened abnormal scores
    lsparse     λ · mean of abnormal scores

Batch convention: abnormal first half, normal second half
(anomaly_clip_module.py:177).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    normal_id: int
    num_topk: int = 3
    lambda_dir_abn: float = 1.0
    lambda_dir_nor: float = 1.0
    lambda_topk_abn: float = 1.0
    lambda_bottomk_abn: float = 1.0
    lambda_topk_nor: float = 1.0
    lambda_smooth: float = 8e-4
    lambda_sparse: float = 8e-3
    frames_per_segment: int = 16
    num_segments: int = 32


class LossTerms(NamedTuple):
    total: jnp.ndarray
    ldir_abn: jnp.ndarray
    ldir_nor: jnp.ndarray
    ltopk_abn: jnp.ndarray
    lbottomk_abn: jnp.ndarray
    ltopk_nor: jnp.ndarray
    lsmooth: jnp.ndarray
    lsparse: jnp.ndarray


def _smoothness(scores: jnp.ndarray) -> jnp.ndarray:
    """Σ (s[t+1] - s[t])² over the flat array, last element paired with itself
    (loss.py:10-17). The reference flattens across videos, so video boundaries
    contribute — reproduced as-is for parity."""
    shifted = jnp.concatenate([scores[1:], scores[-1:]], axis=0)
    return jnp.sum((shifted - scores) ** 2)


def _nll(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood (torch NLLLoss default reduction)."""
    picked = jnp.take_along_axis(log_probs, targets[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def compute_loss(
    similarity: jnp.ndarray,
    similarity_topk: jnp.ndarray,
    labels: jnp.ndarray,
    scores: jnp.ndarray,
    idx_topk_abn: jnp.ndarray,
    idx_topk_nor: jnp.ndarray,
    idx_bottomk_abn: jnp.ndarray,
    cfg: LossConfig,
) -> LossTerms:
    """Args mirror the selector outputs (loss.py:51-60):

    similarity: (b*n*l, C-1) batch-normed direction logits.
    similarity_topk: (b*k*l, C-1), abnormal rows first.
    labels: (b,) video labels; scores: (b*n*l,) sigmoid frame scores.
    idx_*: (b/2, k) selected segment indices.
    """
    b = labels.shape[0]
    half = b // 2
    n, l, k = cfg.num_segments, cfg.frames_per_segment, cfg.num_topk
    c_abn = similarity.shape[1]  # n_cls - 1
    num_classes = c_abn + 1

    alabels = labels[:half]
    # label -> column index in the normal-row-dropped logits (loss.py:82-83)
    acols = jnp.where(alabels > cfg.normal_id, alabels - 1, alabels)
    acols_per_topk = jnp.repeat(acols, k * l)

    # --- direction terms -------------------------------------------------------
    asim_topk = similarity_topk[: half * k * l]
    picked = jnp.take_along_axis(asim_topk, acols_per_topk[:, None], axis=1)[:, 0]
    ldir_abn = cfg.lambda_dir_abn * (-jnp.mean(picked))

    nsim = similarity[similarity.shape[0] // 2 :]
    ldir_nor = cfg.lambda_dir_nor * jnp.mean(jnp.max(nsim, axis=1))

    # --- joint class probabilities (loss.py:105-120) ---------------------------
    softmax_sim = jnp.exp(similarity - jnp.max(similarity, axis=1, keepdims=True))
    softmax_sim = softmax_sim / jnp.sum(softmax_sim, axis=1, keepdims=True)
    class_probs = softmax_sim * scores[:, None]
    normal_probs = (1.0 - scores)[:, None]
    class_probs = jnp.concatenate(
        [
            class_probs[:, : cfg.normal_id],
            normal_probs,
            class_probs[:, cfg.normal_id :],
        ],
        axis=1,
    )
    class_probs = class_probs.reshape(b, n, l, num_classes)
    aprobs = class_probs[:half]
    nprobs = class_probs[half:]

    def gather_segments(probs, idx):
        picked = jnp.take_along_axis(probs, idx[:, :, None, None], axis=1)
        return picked.reshape(-1, num_classes)

    # clamp before log: a saturated sigmoid score (exactly 0.0/1.0 in fp32, which
    # happens once the temporal logit passes ~16.7) would otherwise yield
    # log(0) = -inf and NaN the whole update. The torch reference's
    # NLLLoss-on-log(probs) shares the fragility (loss.py:121-147); the clamp is
    # a deliberate, numerically invisible (<1e-12) parity deviation.
    def safe_log(p):
        return jnp.log(jnp.maximum(p, 1e-12))

    log_topk_abn = safe_log(gather_segments(aprobs, idx_topk_abn))
    log_bottomk_abn = safe_log(gather_segments(aprobs, idx_bottomk_abn))
    log_topk_nor = safe_log(gather_segments(nprobs, idx_topk_nor))

    # targets: original labels in the full class space (loss.py:149 reverses the
    # earlier column shift for labels above normal_id)
    atargets = jnp.repeat(alabels, k * l)
    ltopk_abn = cfg.lambda_topk_abn * _nll(log_topk_abn, atargets)
    normal_targets = jnp.full((log_bottomk_abn.shape[0],), cfg.normal_id, dtype=jnp.int32)
    lbottomk_abn = cfg.lambda_bottomk_abn * _nll(log_bottomk_abn, normal_targets)
    ntargets = jnp.full((log_topk_nor.shape[0],), cfg.normal_id, dtype=jnp.int32)
    ltopk_nor = cfg.lambda_topk_nor * _nll(log_topk_nor, ntargets)

    # --- smoothness & sparsity on the abnormal half's scores -------------------
    abn_scores = scores[: scores.shape[0] // 2]
    lsmooth = cfg.lambda_smooth * _smoothness(abn_scores)
    lsparse = cfg.lambda_sparse * jnp.mean(abn_scores)

    total = ldir_abn + ldir_nor + ltopk_abn + lbottomk_abn + ltopk_nor + lsmooth + lsparse
    return LossTerms(total, ldir_abn, ldir_nor, ltopk_abn, lbottomk_abn, ltopk_nor, lsmooth, lsparse)
