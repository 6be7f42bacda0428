"""The AnomalyCLIP composite model: CLIP features -> text-driven direction scores ->
MIL selection -> axial temporal scoring.

Re-design of the reference composite net (reference:
src/models/components/anomaly_clip.py:17-233) as a set of pure functions over an
explicit parameter split:

    frozen      CLIP weights (visual tower, text blocks, token embedding) — frozen
                by *construction*: excluded from the trainable pytree, no gradients
                computed, no requires_grad bookkeeping (vs anomaly_clip_module.py:67-74).
    trainable   {"prompt_ctx", "text_projection", "temporal": {...}} — exactly the
                reference's four optimizer groups, minus the selector whose BatchNorm
                is non-affine and therefore parameterless (selector_model.py:30).
    bn_state    selector BatchNorm running statistics (mutable, non-gradient).

Both forward variants are single jit-compiled graphs with static shapes; test-mode
variable video length arrives as a static ``segment_size`` (shape-bucketed by the
evaluator, see anomalyclip_tpu/eval/evaluator.py).
"""

from __future__ import annotations

import csv
import dataclasses
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anomalyclip_tpu.models.clip.model import (
    CLIPConfig,
    encode_image,
    matmul_precision_for,
    text_transformer_on_embeddings,
)
from anomalyclip_tpu.models.prompt_learner import (
    PromptSpec,
    assemble_prompts,
    build_prompt_spec,
    init_prompt_params,
)
from anomalyclip_tpu.models.selector import (
    BNState,
    SelectorConfig,
    TopkSelection,
    selector_test,
    selector_train,
)
from anomalyclip_tpu.models.temporal import (
    TemporalConfig,
    init_temporal_params,
    temporal_scores,
)

Params = Dict[str, Any]


def read_classnames(labels_file: str | Path) -> List[str]:
    """Classnames sorted alphabetically (anomaly_clip.py:69-70); the shipped label
    tables are already in sorted order, so ids line up with csv ids."""
    with open(labels_file) as f:
        rows = list(csv.DictReader(f))
    return sorted(row["name"] for row in rows)


@dataclasses.dataclass(frozen=True)
class AnomalyCLIPConfig:
    """Mirror of the reference net config block (configs/model/*.yaml `net:`)."""

    arch: str = "ViT-B/16"
    labels_file: str = ""
    emb_size: int = 256
    depth: int = 1
    heads: int = 8
    dim_heads: Optional[int] = None
    num_segments: int = 32
    seg_length: int = 16
    concat_features: bool = False
    normal_id: int = 7
    stride: int = 1
    load_from_features: bool = True
    select_idx_dropout_topk: float = 0.7
    select_idx_dropout_bottomk: float = 0.7
    ncrops: int = 1
    num_topk: int = 3
    num_bottomk: int = 3
    n_ctx: int = 8
    shared_context: bool = False
    ctx_init: str = ""
    # "end" (every reference config; coop.py:82-90) | "middle" | "front"
    # (coop.py:92-133) — position of the classname tokens inside the prompt
    class_token_position: str = "end"
    # "none" | "int8": quantize the frozen visual tower's GEMMs for serving
    # (W8A8, models/clip/quant.py). Serving-only — enforced by the module's
    # encode routing (train/module.py:_int8_serving_active): fit(), incl. its
    # ncentroid bootstrap, always encodes on the fp tower so training never
    # mixes precisions; only post-fit eval/serve encodes go int8.
    quantize: str = "none"
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class TrainOutput(NamedTuple):
    """Training forward outputs (anomaly_clip.py:208-215)."""

    logits: jnp.ndarray  # (b*n*l, C-1)
    logits_topk: jnp.ndarray  # (b*k*l, C-1)
    scores: jnp.ndarray  # (b*n*l,)
    idx_topk_abn: jnp.ndarray
    idx_topk_nor: jnp.ndarray
    idx_bottomk_abn: jnp.ndarray


class AnomalyCLIP:
    """Static model description + pure apply functions.

    Holds only hashable/static state (configs, prompt spec, classnames); all array
    state lives in the params pytrees so every method jit-composes cleanly.
    """

    def __init__(
        self,
        cfg: AnomalyCLIPConfig,
        clip_cfg: CLIPConfig,
        classnames: List[str],
        prompt_spec: PromptSpec,
    ):
        self.cfg = cfg
        self.clip_cfg = clip_cfg
        self.classnames = classnames
        self.prompt_spec = prompt_spec
        self.embedding_dim = clip_cfg.embed_dim
        self.selector_cfg = SelectorConfig(
            normal_id=cfg.normal_id,
            num_segments=cfg.num_segments,
            seg_length=cfg.seg_length,
            select_idx_dropout_topk=cfg.select_idx_dropout_topk,
            select_idx_dropout_bottomk=cfg.select_idx_dropout_bottomk,
            num_topk=cfg.num_topk,
            num_bottomk=cfg.num_bottomk,
        )
        n_cls = len(classnames)
        self.temporal_cfg = TemporalConfig(
            # input = CLIP features, optionally with the (C-1) similarity logits
            # prepended (anomaly_clip.py:92-93, get_temporal_model_input :223-233)
            input_size=clip_cfg.embed_dim + (n_cls - 1) * int(cfg.concat_features),
            emb_size=cfg.emb_size,
            depth=cfg.depth,
            heads=cfg.heads,
            dim_heads=cfg.dim_heads,
            num_segments=cfg.num_segments,
            seg_length=cfg.seg_length,
        )

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(
        cfg: AnomalyCLIPConfig,
        clip_params: Params,
        clip_cfg: CLIPConfig,
    ) -> Tuple["AnomalyCLIP", Params]:
        """Build the static model from a loaded CLIP and split out frozen params.

        Returns (model, frozen_params). Trainable params come from init_trainable
        or a checkpoint restore.
        """
        classnames = read_classnames(cfg.labels_file)
        token_embedding = np.asarray(clip_params["text"]["token_embedding"])
        spec = build_prompt_spec(
            classnames,
            token_embedding,
            n_ctx=cfg.n_ctx,
            shared_context=cfg.shared_context,
            ctx_init=cfg.ctx_init,
            class_token_position=cfg.class_token_position,
        )
        model = AnomalyCLIP(cfg, clip_cfg, classnames, spec)
        frozen = {"clip": clip_params}
        return model, frozen

    def init_trainable(self, key: jax.Array, frozen: Params) -> Tuple[Params, BNState]:
        k_prompt, k_temporal = jax.random.split(key)
        token_embedding = np.asarray(frozen["clip"]["text"]["token_embedding"])
        trainable = {
            "prompt_ctx": init_prompt_params(
                k_prompt, self.prompt_spec, token_embedding, self.cfg.ctx_init
            ),
            # trainable copy of CLIP's text projection (anomaly_clip_module.py:72)
            "text_projection": jnp.asarray(
                frozen["clip"]["text"]["text_projection"], dtype=jnp.float32
            ),
            "temporal": init_temporal_params(k_temporal, self.temporal_cfg),
        }
        bn_state = BNState.create(len(self.classnames) - 1)
        return trainable, bn_state

    # -- forward pieces -----------------------------------------------------

    def text_features(self, frozen: Params, trainable: Params) -> jnp.ndarray:
        """Prompt assembly -> text transformer -> (n_cls, embed_dim)
        (anomaly_clip.py:217-221)."""
        prompts = assemble_prompts(trainable["prompt_ctx"], self.prompt_spec)
        return text_transformer_on_embeddings(
            frozen["clip"],
            self.clip_cfg,
            prompts,
            jnp.asarray(self.prompt_spec.eot_indices),
            text_projection=trainable["text_projection"],
            compute_dtype=self.cfg.dtype,
        )

    # ViT-B/16 throughput peaks at ~256 frames/dispatch on v5e (bench.py sweep);
    # a train step encodes thousands, so large batches are scanned in chunks at
    # the sweet spot instead of one oversized dispatch
    ENCODE_CHUNK = 256

    def encode_frames(self, frozen: Params, frames: jnp.ndarray) -> jnp.ndarray:
        """Frozen CLIP image encoding for the from-frames path
        (anomaly_clip.py:118-131, 157-169). frames: (N, H, W, 3) NHWC, CLIP-normalized."""
        n, chunk = frames.shape[0], self.ENCODE_CHUNK
        if n > chunk and n % chunk == 0:
            feats = jax.lax.map(
                lambda c: encode_image(frozen["clip"], self.clip_cfg, c, self.cfg.dtype),
                frames.reshape((n // chunk, chunk) + frames.shape[1:]),
            ).reshape(n, -1)
        else:
            feats = encode_image(frozen["clip"], self.clip_cfg, frames, self.cfg.dtype)
        return jax.lax.stop_gradient(feats)

    def _temporal_input(
        self, image_features: jnp.ndarray, similarity: jnp.ndarray, ncentroid: jnp.ndarray
    ) -> jnp.ndarray:
        """Re-center, optionally prepend similarity logits (anomaly_clip.py:200-203,
        223-233; similarity comes FIRST in the concat)."""
        recentered = image_features - ncentroid
        if self.cfg.concat_features:
            return jnp.concatenate([similarity, recentered], axis=-1)
        return recentered

    # -- full forwards ------------------------------------------------------

    def forward_train(
        self,
        frozen: Params,
        trainable: Params,
        bn_state: BNState,
        image_features: jnp.ndarray,
        labels: jnp.ndarray,
        ncentroid: jnp.ndarray,
        key: jax.Array,
    ) -> Tuple[TrainOutput, BNState]:
        """Training forward (anomaly_clip.py:156-215).

        Args:
            image_features: (b, t=n*l, D) CLIP features (abnormal-first halves), or
                (b, t, H, W, 3) frames when load_from_features=False.
            labels: (b,) video labels.
        """
        with matmul_precision_for(self.cfg.dtype):
            if not self.cfg.load_from_features:
                b, t = image_features.shape[:2]
                frames = image_features.reshape((-1,) + image_features.shape[2:])
                image_features = self.encode_frames(frozen, frames).reshape(b, t, -1)

            flat = image_features.reshape(-1, image_features.shape[-1])
            text_features = self.text_features(frozen, trainable)
            selection, new_bn = selector_train(
                flat, text_features, labels, ncentroid, bn_state, key, self.selector_cfg
            )
            features = self._temporal_input(flat, selection.logits, ncentroid)
            scores = temporal_scores(
                features, trainable["temporal"], self.temporal_cfg, test_mode=False
            ).reshape(-1)
            return (
                TrainOutput(
                    logits=selection.logits,
                    logits_topk=selection.logits_topk,
                    scores=scores,
                    idx_topk_abn=selection.idx_topk_abn,
                    idx_topk_nor=selection.idx_topk_nor,
                    idx_bottomk_abn=selection.idx_bottomk_abn,
                ),
                new_bn,
            )

    def forward_test(
        self,
        frozen: Params,
        trainable: Params,
        bn_state: BNState,
        image_features: jnp.ndarray,
        ncentroid: jnp.ndarray,
        segment_size: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Test forward for one (padded) video (anomaly_clip.py:117-154).

        Args:
            image_features: (b, t, D) with t = num_segments*segment_size*seg_length,
                crops folded into b; or (b, t, H, W, 3) frames.
            segment_size: static chunk count (shape-bucketed upstream).
        Returns:
            (similarity (t*stride, C-1), scores (t*stride,)) with frame-rate
            expansion by ``stride`` (anomaly_clip.py:149-152).
        """
        with matmul_precision_for(self.cfg.dtype):
            if not self.cfg.load_from_features:
                b, t = image_features.shape[:2]
                frames = image_features.reshape((-1,) + image_features.shape[2:])
                image_features = self.encode_frames(frozen, frames).reshape(b, t, -1)

            flat = image_features.reshape(-1, image_features.shape[-1])
            text_features = self.text_features(frozen, trainable)
            similarity = selector_test(
                flat, text_features, ncentroid, bn_state, self.selector_cfg
            )
            features = self._temporal_input(flat, similarity, ncentroid)
            scores = temporal_scores(
                features,
                trainable["temporal"],
                self.temporal_cfg,
                segment_size=segment_size,
                test_mode=True,
            ).reshape(-1)

            similarity = jnp.repeat(similarity, self.cfg.stride, axis=0)
            scores = jnp.repeat(scores, self.cfg.stride, axis=0)
            return similarity, scores
