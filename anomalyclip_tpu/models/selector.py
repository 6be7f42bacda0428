"""Direction scoring + MIL top-k/bottom-k selection, fully vectorized.

Re-design of the reference SelectorModel (reference:
src/models/components/selector_model.py:5-333) for TPU:

- The per-video Python loops of the reference's gathers (selector_model.py:139-150,
  179-189, ...) become batched ``lax.top_k`` + ``take_along_axis`` — one fused XLA
  program, no host round-trips.
- The non-affine BatchNorm1d (selector_model.py:30,65) is a pure function over an
  explicit :class:`BNState`; under a data-parallel mesh the batch statistics are
  computed over the *global* batch by XLA (jnp reductions over sharded arrays insert
  the collectives), which reproduces the reference's ``sync_batchnorm: True``
  (configs/trainer/ddp.yaml:8) by construction.
- Bernoulli segment-dropout masks take an explicit PRNG key instead of torch's
  global generator (selector_model.py:101-117).

Batch convention (pervasive in the reference): the first half of the batch is
abnormal videos, the second half normal (anomaly_clip_module.py:177).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

MASK_FILL = 1e6  # selector_model.py:127, 235


class BNState(NamedTuple):
    """Running statistics of the non-affine BatchNorm over the (n_cls-1) logit
    channels. torch semantics: normalization uses biased batch variance; the running
    variance stores the unbiased estimate; momentum 0.1."""

    mean: jnp.ndarray  # (n_cls - 1,)
    var: jnp.ndarray  # (n_cls - 1,)

    @staticmethod
    def create(num_channels: int) -> "BNState":
        return BNState(mean=jnp.zeros((num_channels,)), var=jnp.ones((num_channels,)))


@dataclasses.dataclass(frozen=True)
class SelectorConfig:
    normal_id: int
    num_segments: int = 32
    seg_length: int = 16
    select_idx_dropout_topk: float = 0.7
    select_idx_dropout_bottomk: float = 0.7
    num_topk: int = 3
    num_bottomk: int = 3
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5


class TopkSelection(NamedTuple):
    """Training-mode selector outputs (selector_model.py:92-99)."""

    logits: jnp.ndarray  # (b*n*l, C-1) batch-normalized direction logits
    logits_topk: jnp.ndarray  # (b*k*l, C-1) selected top-k segments (abn ∥ nor)
    logits_bottomk: jnp.ndarray  # (b*k*l, C-1) selected bottom-k segments
    idx_topk_abn: jnp.ndarray  # (b/2, k)
    idx_topk_nor: jnp.ndarray  # (b/2, k)
    idx_bottomk_abn: jnp.ndarray  # (b/2, k)


def direction_logits(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    ncentroid: jnp.ndarray,
    normal_id: int,
) -> jnp.ndarray:
    """Scalar projection of re-centered image features onto the re-centered,
    L2-normalized abnormal-class text directions (selector_model.py:44-62).

    Args:
        image_features: (T, D) CLIP image features (not yet re-centered).
        text_features: (C, D) per-class text features, normal row included.
        ncentroid: (D,) normality centroid.
    Returns:
        (T, C-1) raw direction logits (before batch norm).
    """
    text = jnp.concatenate(
        [text_features[:normal_id], text_features[normal_id + 1 :]], axis=0
    )
    text = text - ncentroid
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    image = image_features - ncentroid
    # The projection is tiny (T x D x C-1): full-precision fp32 passes cost nothing
    # and keep the logits bit-faithful for checkpoint parity.
    precision = (
        jax.lax.Precision.HIGHEST if image.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    return jnp.matmul(image, text.T, precision=precision)


def batch_norm_apply(
    logits: jnp.ndarray,
    state: BNState,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, BNState]:
    """Non-affine BatchNorm1d over channels (selector_model.py:30,65).

    In training mode the statistics are computed over the full (possibly sharded)
    batch axis, which under a data mesh is the global-batch sync-BN behavior.
    """
    if training:
        mean = jnp.mean(logits, axis=0)
        var = jnp.var(logits, axis=0)  # biased, used for normalization
        count = logits.shape[0]
        unbiased = var * (count / max(count - 1, 1))
        new_state = BNState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    normed = (logits - mean) * jax.lax.rsqrt(var + eps)
    return normed, new_state


def generate_masks(
    key: jax.Array, batch: int, cfg: SelectorConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bernoulli keep masks over segments, keep-prob = 1 - dropout
    (selector_model.py:101-117). When both dropout rates coincide the topk mask
    aliases the bottomk mask — a reference quirk (:114-115) that changes which
    segments survive, so it is reproduced exactly."""
    k_top, k_bottom = jax.random.split(key)
    shape = (batch, cfg.num_segments)
    bottomk_mask = jax.random.bernoulli(
        k_bottom, 1.0 - cfg.select_idx_dropout_bottomk, shape
    )
    if cfg.select_idx_dropout_topk == cfg.select_idx_dropout_bottomk:
        topk_mask = bottomk_mask
    else:
        topk_mask = jax.random.bernoulli(k_top, 1.0 - cfg.select_idx_dropout_topk, shape)
    return topk_mask, bottomk_mask


def _abnormal_class_column(labels: jnp.ndarray, normal_id: int) -> jnp.ndarray:
    """Map dataset labels to columns of the normal-row-dropped logits
    (selector_model.py:136)."""
    return jnp.where(labels > normal_id, labels - 1, labels)


def _segment_scores(logits: jnp.ndarray, cfg: SelectorConfig) -> jnp.ndarray:
    """(b, n*l, C-1) -> per-segment scores (b, n, C-1) by summing within segments
    (selector_model.py:123-125)."""
    b = logits.shape[0]
    return logits.reshape(b, cfg.num_segments, cfg.seg_length, -1).sum(axis=2)


def _gather_segments(
    logits: jnp.ndarray, idx: jnp.ndarray, cfg: SelectorConfig
) -> jnp.ndarray:
    """Gather selected segments: (b, n*l, C-1), (b, k) -> (b*k*l, C-1)
    (vectorized form of selector_model.py:160-225)."""
    b = logits.shape[0]
    c = logits.shape[-1]
    seg = logits.reshape(b, cfg.num_segments, cfg.seg_length, c)
    picked = jnp.take_along_axis(seg, idx[:, :, None, None], axis=1)
    return picked.reshape(-1, c)


def select_topk(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: SelectorConfig,
    largest: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k (or bottom-k) MIL segment selection.

    Abnormal half: ranked by the GT-class column of per-segment scores; normal half:
    ranked by the class-summed per-segment scores (selector_model.py:119-158 /
    227-266 for largest=False).

    Args:
        logits: (b, n*l, C-1) batch-normalized logits, abnormal-first convention.
        labels: (b,) video-level labels.
        mask: (b, n) bool keep mask; dropped segments are pushed to ∓MASK_FILL.
    Returns:
        (selected_logits (b*k*l, C-1), idx_abn (b/2, k), idx_nor (b/2, k))
    """
    k = cfg.num_topk if largest else cfg.num_bottomk
    b = logits.shape[0]
    half = b // 2

    seg_scores = _segment_scores(logits, cfg)  # (b, n, C-1)
    fill = -MASK_FILL if largest else MASK_FILL
    dropped = jnp.where(mask[:, :, None], seg_scores, fill)

    acols = _abnormal_class_column(labels[:half], cfg.normal_id)
    a_scores = jnp.take_along_axis(dropped[:half], acols[:, None, None], axis=2)[..., 0]
    n_scores = dropped[half:].sum(axis=2)

    sign = 1.0 if largest else -1.0
    _, idx_abn = jax.lax.top_k(sign * a_scores, k)
    _, idx_nor = jax.lax.top_k(sign * n_scores, k)

    selected = jnp.concatenate(
        [
            _gather_segments(logits[:half], idx_abn, cfg),
            _gather_segments(logits[half:], idx_nor, cfg),
        ],
        axis=0,
    )
    return selected, idx_abn, idx_nor


def selector_train(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    labels: jnp.ndarray,
    ncentroid: jnp.ndarray,
    bn_state: BNState,
    key: jax.Array,
    cfg: SelectorConfig,
) -> Tuple[TopkSelection, BNState]:
    """Training-mode selector (selector_model.py:70-99).

    Args:
        image_features: (b*n*l, D) flattened CLIP features, abnormal-first halves.
        labels: (b,) video labels.
    """
    raw = direction_logits(image_features, text_features, ncentroid, cfg.normal_id)
    normed, new_bn = batch_norm_apply(
        raw, bn_state, training=True, momentum=cfg.bn_momentum, eps=cfg.bn_eps
    )
    b = labels.shape[0]
    per_video = normed.reshape(b, cfg.num_segments * cfg.seg_length, -1)

    topk_mask, bottomk_mask = generate_masks(key, b, cfg)
    logits_topk, idx_topk_abn, idx_topk_nor = select_topk(
        per_video, labels, topk_mask, cfg, largest=True
    )
    logits_bottomk, idx_bottomk_abn, _ = select_topk(
        per_video, labels, bottomk_mask, cfg, largest=False
    )
    return (
        TopkSelection(
            logits=normed,
            logits_topk=logits_topk,
            logits_bottomk=logits_bottomk,
            idx_topk_abn=idx_topk_abn,
            idx_topk_nor=idx_topk_nor,
            idx_bottomk_abn=idx_bottomk_abn,
        ),
        new_bn,
    )


def selector_test(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    ncentroid: jnp.ndarray,
    bn_state: BNState,
    cfg: SelectorConfig,
) -> jnp.ndarray:
    """Test-mode selector: normalized similarity only (selector_model.py:68-69),
    using running BN statistics."""
    raw = direction_logits(image_features, text_features, ncentroid, cfg.normal_id)
    normed, _ = batch_norm_apply(raw, bn_state, training=False, eps=cfg.bn_eps)
    return normed
