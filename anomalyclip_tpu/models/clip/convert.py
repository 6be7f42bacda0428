"""OpenAI CLIP checkpoint -> JAX parameter pytree conversion.

Replaces the reference's ``clip.load`` + ``build_model`` path (reference:
src/models/components/clip/clip.py:108-222, model.py:462-519): the architecture is
inferred from state-dict shapes and the torch tensors are re-laid-out into the
stacked/scan-friendly pytree of :mod:`anomalyclip_tpu.models.clip.model`.

torch is used only here (CPU, load-time); nothing in the compute path depends on it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

from anomalyclip_tpu.models.clip.model import CLIPConfig, Params


def _to_numpy(t: Any) -> np.ndarray:
    return np.asarray(t.detach().cpu().float().numpy())


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a CLIP checkpoint (TorchScript archive or plain state dict) to numpy."""
    import torch

    path = str(path)
    try:
        model = torch.jit.load(path, map_location="cpu")
        state_dict = model.state_dict()
    except RuntimeError:
        state_dict = torch.load(path, map_location="cpu")
        if hasattr(state_dict, "state_dict"):
            state_dict = state_dict.state_dict()
    return {k: _to_numpy(v) for k, v in state_dict.items()}


def config_from_state_dict(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer CLIPConfig from checkpoint shapes (model.py:462-499). ViT only."""
    if "visual.proj" not in sd:
        raise ValueError(
            "Only ViT CLIP architectures are supported (every reference config uses "
            "ViT-B/16; the ModifiedResNet tower is unused there)."
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
    )
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid_size,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
    )


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> Params:
    """Stack per-layer resblock weights along a leading axis, transposing linear
    weights for right-multiplication."""

    def gather(fmt: str, transpose: bool = False) -> np.ndarray:
        mats = [sd[fmt.format(prefix=prefix, i=i)] for i in range(layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    return {
        "ln_1": {
            "scale": gather("{prefix}.resblocks.{i}.ln_1.weight"),
            "bias": gather("{prefix}.resblocks.{i}.ln_1.bias"),
        },
        "attn": {
            "qkv_w": gather("{prefix}.resblocks.{i}.attn.in_proj_weight", transpose=True),
            "qkv_b": gather("{prefix}.resblocks.{i}.attn.in_proj_bias"),
            "out_w": gather("{prefix}.resblocks.{i}.attn.out_proj.weight", transpose=True),
            "out_b": gather("{prefix}.resblocks.{i}.attn.out_proj.bias"),
        },
        "ln_2": {
            "scale": gather("{prefix}.resblocks.{i}.ln_2.weight"),
            "bias": gather("{prefix}.resblocks.{i}.ln_2.bias"),
        },
        "mlp": {
            "fc_w": gather("{prefix}.resblocks.{i}.mlp.c_fc.weight", transpose=True),
            "fc_b": gather("{prefix}.resblocks.{i}.mlp.c_fc.bias"),
            "proj_w": gather("{prefix}.resblocks.{i}.mlp.c_proj.weight", transpose=True),
            "proj_b": gather("{prefix}.resblocks.{i}.mlp.c_proj.bias"),
        },
    }


def torch_state_dict_to_params(
    sd: Dict[str, np.ndarray],
) -> Tuple[Params, CLIPConfig]:
    """Convert an OpenAI CLIP state dict (numpy values) into the JAX pytree."""
    cfg = config_from_state_dict(sd)
    conv = sd["visual.conv1.weight"]  # (width, 3, p, p), flattens channel-major
    visual = {
        "patch_embed": conv.reshape(cfg.vision_width, -1).T.copy(),
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "blocks": _stack_blocks(sd, "visual.transformer", cfg.vision_layers),
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
    }
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "blocks": _stack_blocks(sd, "transformer", cfg.transformer_layers),
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    params: Params = {
        "visual": visual,
        "text": text,
        "logit_scale": np.asarray(sd["logit_scale"], dtype=np.float32),
    }
    return params, cfg


def load_torch_clip_checkpoint(path: str | Path) -> Tuple[Params, CLIPConfig]:
    """One-call loader: torch checkpoint file -> (jax-ready numpy pytree, config)."""
    return torch_state_dict_to_params(load_torch_state_dict(path))
