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
    """Infer CLIPConfig from checkpoint shapes (model.py:462-499): ViT when
    ``visual.proj`` exists, ModifiedResNet otherwise."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid_size
    else:
        vision_layers = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        )
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        output_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        vision_patch_size = None
        image_resolution = output_width * 32
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
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


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> HWIO."""
    return w.transpose(2, 3, 1, 0).copy()


def _bn_params(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _resnet_visual_params(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Params:
    """ModifiedResNet weights -> the pytree of models/clip/resnet.py."""

    def bottleneck(prefix: str) -> Params:
        p = {
            "conv1_w": _conv_hwio(sd[f"{prefix}.conv1.weight"]),
            "bn1": _bn_params(sd, f"{prefix}.bn1"),
            "conv2_w": _conv_hwio(sd[f"{prefix}.conv2.weight"]),
            "bn2": _bn_params(sd, f"{prefix}.bn2"),
            "conv3_w": _conv_hwio(sd[f"{prefix}.conv3.weight"]),
            "bn3": _bn_params(sd, f"{prefix}.bn3"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            p["down_conv_w"] = _conv_hwio(sd[f"{prefix}.downsample.0.weight"])
            p["down_bn"] = _bn_params(sd, f"{prefix}.downsample.1")
        return p

    visual: Params = {
        "stem": {
            "conv1_w": _conv_hwio(sd["visual.conv1.weight"]),
            "bn1": _bn_params(sd, "visual.bn1"),
            "conv2_w": _conv_hwio(sd["visual.conv2.weight"]),
            "bn2": _bn_params(sd, "visual.bn2"),
            "conv3_w": _conv_hwio(sd["visual.conv3.weight"]),
            "bn3": _bn_params(sd, "visual.bn3"),
        },
        "attnpool": {
            "positional_embedding": sd["visual.attnpool.positional_embedding"],
            "q_w": sd["visual.attnpool.q_proj.weight"].T.copy(),
            "q_b": sd["visual.attnpool.q_proj.bias"],
            "k_w": sd["visual.attnpool.k_proj.weight"].T.copy(),
            "k_b": sd["visual.attnpool.k_proj.bias"],
            "v_w": sd["visual.attnpool.v_proj.weight"].T.copy(),
            "v_b": sd["visual.attnpool.v_proj.bias"],
            "c_w": sd["visual.attnpool.c_proj.weight"].T.copy(),
            "c_b": sd["visual.attnpool.c_proj.bias"],
        },
    }
    for li, blocks in enumerate(cfg.vision_layers, start=1):
        visual[f"layer{li}"] = [
            bottleneck(f"visual.layer{li}.{bi}") for bi in range(blocks)
        ]
    return visual


def torch_state_dict_to_params(
    sd: Dict[str, np.ndarray],
) -> Tuple[Params, CLIPConfig]:
    """Convert an OpenAI CLIP state dict (numpy values) into the JAX pytree."""
    cfg = config_from_state_dict(sd)
    if cfg.is_resnet:
        visual = _resnet_visual_params(sd, cfg)
    else:
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
