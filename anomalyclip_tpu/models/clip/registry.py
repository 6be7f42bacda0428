"""CLIP weight resolution.

Replaces the reference's download-on-demand ``clip.load`` (reference:
src/models/components/clip/clip.py:31-81, 108-163). This environment has no
network egress, so weights resolve from local files:

    1. explicit ``clip_ckpt_path`` config / CLIP_CKPT_PATH env var
    2. ~/.cache/clip/<arch>.pt (the reference's own cache location)
    3. ``clip_init: random`` -> randomly initialized params (tiny config for the
       synthetic experiment, full-size otherwise) — tests/bench only.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import jax

from anomalyclip_tpu.models.clip.convert import load_torch_clip_checkpoint
from anomalyclip_tpu.models.clip.model import CLIPConfig, Params, init_clip_params

_ARCH_CONFIGS = {
    "ViT-B/16": CLIPConfig.vit_b16,
    "ViT-B/32": CLIPConfig.vit_b32,
    "ViT-L/14": CLIPConfig.vit_l14,
    "ViT-L/14@336px": CLIPConfig.vit_l14_336,
    "RN50": CLIPConfig.rn50,
}


def available_models() -> list:
    """Architectures with a named config (the reference's clip.available_models,
    clip.py:103-105; any other OpenAI arch still loads via checkpoint shape
    inference in convert.config_from_state_dict)."""
    return sorted(_ARCH_CONFIGS)


def _cache_candidates(arch: str) -> list:
    fname = arch.replace("/", "-") + ".pt"
    return [
        Path.home() / ".cache" / "clip" / fname,
        Path("/usr/src/app/.cache/clip") / fname,
    ]


def resolve_clip(
    arch: str = "ViT-B/16",
    clip_init: str = "pretrained",
    clip_ckpt_path: Optional[str] = None,
    seed: int = 0,
) -> Tuple[Params, CLIPConfig]:
    """-> (params pytree (numpy/jnp), CLIPConfig)."""
    if clip_init == "random":
        cfg = CLIPConfig.tiny()
        return init_clip_params(jax.random.PRNGKey(seed), cfg), cfg
    if clip_init == "random-full":
        cfg = _ARCH_CONFIGS.get(arch, CLIPConfig.vit_b16)()
        return init_clip_params(jax.random.PRNGKey(seed), cfg), cfg

    candidates = []
    if clip_ckpt_path:
        candidates.append(Path(clip_ckpt_path))
    env = os.environ.get("CLIP_CKPT_PATH")
    if env:
        candidates.append(Path(env))
    candidates.extend(_cache_candidates(arch))
    for path in candidates:
        if path.is_file():
            return load_torch_clip_checkpoint(path)
    raise FileNotFoundError(
        f"No CLIP checkpoint found for {arch}. Provide model.net.clip_ckpt_path or "
        f"set CLIP_CKPT_PATH, or use model.net.clip_init=random-full for random "
        f"weights. Searched: {[str(c) for c in candidates]}"
    )
