"""CoOp prompt learner: learnable context vectors per class.

Re-design of the reference PromptLearner (reference:
src/models/components/coop.py:10-138). The frozen pieces (SOS prefix embedding,
classname+EOT suffix embeddings, tokenized prompt ids) are precomputed once at build
time into a static :class:`PromptSpec`; the only trainable tensor is ``ctx``:

- class-specific (``shared_context=False``, all reference configs):
  (n_cls, n_ctx, dim), random-normal init std 0.02 (coop.py:42-43)
- shared (``shared_context=True``): (n_ctx, dim), broadcast over classes at apply

Assembly is a static concatenation [prefix, ctx, suffix] along the token axis for
class_token_position="end" (coop.py:82-90, what every reference config runs). The
"middle"/"front" variants (coop.py:92-133) are carried too, the TPU way: instead
of the reference's per-class Python loop of concats over per-class name lengths,
each variant is a *static per-class row permutation* of the "end" layout,
precomputed at spec-build time and applied as one batched gather.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anomalyclip_tpu.models.clip.tokenizer import ClipTokenizer, tokenize


@dataclasses.dataclass(frozen=True)
class PromptSpec:
    """Static (non-trainable) prompt state, rebuilt from classnames at load time.

    The reference stores prefix/suffix as buffers that are saved but rebuilt on load
    (coop.py:62-66); here they are simply not part of the trainable pytree.
    """

    token_prefix: np.ndarray  # (n_cls, 1, dim) SOS embedding
    token_suffix: np.ndarray  # (n_cls, 77 - 1 - n_ctx, dim) classname + EOT + pad
    tokenized_prompts: np.ndarray  # (n_cls, 77) int32, for the EOT argmax gather
    n_cls: int
    n_ctx: int
    ctx_dim: int
    shared_context: bool
    # "end" | "middle" | "front" (coop.py:82-133); non-"end" variants carry a
    # (n_cls, 77) static row permutation of the "end" layout
    class_token_position: str = "end"
    position_perm: Optional[np.ndarray] = None
    name_lens: Optional[np.ndarray] = None  # (n_cls,) classname token counts

    @property
    def eot_indices(self) -> np.ndarray:
        return self.tokenized_prompts.argmax(axis=-1)


def _position_perm(
    position: str, n_ctx: int, name_lens: np.ndarray, context_length: int
) -> Optional[np.ndarray]:
    """(n_cls, 77) row permutation turning the "end"-layout prompt
    [SOS, ctx×n_ctx, suffix…] into the "middle"/"front" orderings
    (coop.py:92-133). The EOT index is invariant — only rows before the "."
    token move — so the tokenized-prompt argmax gather stays correct."""
    if position == "end":
        return None
    perms = []
    for name_len in np.asarray(name_lens, dtype=np.int64):
        sos = [0]
        ctx_rows = list(range(1, 1 + n_ctx))
        cls_rows = list(range(1 + n_ctx, 1 + n_ctx + name_len))
        rest = list(range(1 + n_ctx + name_len, context_length))
        if position == "middle":
            half = n_ctx // 2
            order = sos + ctx_rows[:half] + cls_rows + ctx_rows[half:] + rest
        elif position == "front":
            order = sos + cls_rows + ctx_rows + rest
        else:
            raise ValueError(f"unknown class_token_position {position!r}")
        perms.append(order)
    return np.asarray(perms, dtype=np.int32)


def build_prompt_spec(
    classnames: List[str],
    token_embedding: np.ndarray,
    n_ctx: int = 8,
    shared_context: bool = False,
    ctx_init: str = "",
    tokenizer: Optional[ClipTokenizer] = None,
    class_token_position: str = "end",
) -> PromptSpec:
    """Tokenize "X ... X <classname>." prompts and slice out the frozen embeddings
    (coop.py:51-66)."""
    if ctx_init:
        # ctx_init defines both the number of context tokens and their init values;
        # handled by init_prompt_params below. Prompt text uses the given words.
        prompt_prefix = ctx_init.replace("_", " ")
        n_ctx = len(prompt_prefix.split(" "))
    else:
        prompt_prefix = " ".join(["X"] * n_ctx)

    classnames = [name.replace("_", " ") for name in classnames]
    prompts = [f"{prompt_prefix} {name}." for name in classnames]
    tokenized = tokenize(prompts, tokenizer=tokenizer)  # (n_cls, 77) int32
    from anomalyclip_tpu.models.clip.tokenizer import _get_default_tokenizer

    tok = tokenizer or _get_default_tokenizer()
    name_lens = np.asarray([len(tok.encode(name)) for name in classnames], np.int32)

    embedding = np.asarray(token_embedding)[tokenized]  # (n_cls, 77, dim)
    return PromptSpec(
        token_prefix=embedding[:, :1, :],
        token_suffix=embedding[:, 1 + n_ctx :, :],
        tokenized_prompts=tokenized,
        n_cls=len(classnames),
        n_ctx=n_ctx,
        ctx_dim=embedding.shape[-1],
        shared_context=shared_context,
        class_token_position=class_token_position,
        position_perm=_position_perm(
            class_token_position, n_ctx, name_lens, tokenized.shape[1]
        ),
        name_lens=name_lens,
    )


def init_prompt_params(
    key: jax.Array,
    spec: PromptSpec,
    token_embedding: Optional[np.ndarray] = None,
    ctx_init: str = "",
    tokenizer: Optional[ClipTokenizer] = None,
) -> jnp.ndarray:
    """The trainable context tensor ``ctx`` (coop.py:36-49)."""
    if ctx_init:
        prompt = tokenize(ctx_init.replace("_", " "), tokenizer=tokenizer)
        vectors = np.asarray(token_embedding)[prompt[0, 1 : 1 + spec.n_ctx]]
        ctx = jnp.asarray(vectors, dtype=jnp.float32)
        if not spec.shared_context:
            ctx = jnp.tile(ctx[None], (spec.n_cls, 1, 1))
        return ctx
    shape = (
        (spec.n_ctx, spec.ctx_dim)
        if spec.shared_context
        else (spec.n_cls, spec.n_ctx, spec.ctx_dim)
    )
    return 0.02 * jax.random.normal(key, shape, dtype=jnp.float32)


def assemble_prompts(ctx: jnp.ndarray, spec: PromptSpec) -> jnp.ndarray:
    """[prefix, ctx, suffix] -> (n_cls, 77, dim) prompt embeddings (coop.py:74-90);
    "middle"/"front" orderings (coop.py:92-133) apply the spec's precomputed
    per-class row permutation as one batched gather — no per-class loop."""
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (spec.n_cls, spec.n_ctx, spec.ctx_dim))
    prefix = jnp.asarray(spec.token_prefix, dtype=ctx.dtype)
    suffix = jnp.asarray(spec.token_suffix, dtype=ctx.dtype)
    prompts = jnp.concatenate([prefix, ctx, suffix], axis=1)
    if spec.position_perm is not None:
        perm = jnp.asarray(spec.position_perm)  # (n_cls, 77)
        prompts = jnp.take_along_axis(prompts, perm[:, :, None], axis=1)
    return prompts
