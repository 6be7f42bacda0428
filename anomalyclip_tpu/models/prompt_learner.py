"""CoOp prompt learner: learnable context vectors per class.

Re-design of the reference PromptLearner (reference:
src/models/components/coop.py:10-138). The frozen pieces (SOS prefix embedding,
classname+EOT suffix embeddings, tokenized prompt ids) are precomputed once at build
time into a static :class:`PromptSpec`; the only trainable tensor is ``ctx``:

- class-specific (``shared_context=False``, all reference configs):
  (n_cls, n_ctx, dim), random-normal init std 0.02 (coop.py:42-43)
- shared (``shared_context=True``): (n_ctx, dim), broadcast over classes at apply

Assembly is a static concatenation [prefix, ctx, suffix] along the token axis
(class_token_position="end", coop.py:82-90 — the only position the reference uses;
"middle"/"front" are dead branches there and are intentionally not carried over).
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

    @property
    def eot_indices(self) -> np.ndarray:
        return self.tokenized_prompts.argmax(axis=-1)


def build_prompt_spec(
    classnames: List[str],
    token_embedding: np.ndarray,
    n_ctx: int = 8,
    shared_context: bool = False,
    ctx_init: str = "",
    tokenizer: Optional[ClipTokenizer] = None,
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

    embedding = np.asarray(token_embedding)[tokenized]  # (n_cls, 77, dim)
    return PromptSpec(
        token_prefix=embedding[:, :1, :],
        token_suffix=embedding[:, 1 + n_ctx :, :],
        tokenized_prompts=tokenized,
        n_cls=len(classnames),
        n_ctx=n_ctx,
        ctx_dim=embedding.shape[-1],
        shared_context=shared_context,
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
    """[prefix, ctx, suffix] -> (n_cls, 77, dim) prompt embeddings (coop.py:74-90)."""
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (spec.n_cls, spec.n_ctx, spec.ctx_dim))
    prefix = jnp.asarray(spec.token_prefix, dtype=ctx.dtype)
    suffix = jnp.asarray(spec.token_suffix, dtype=ctx.dtype)
    return jnp.concatenate([prefix, ctx, suffix], axis=1)
