"""Assemble the reference's COMPLETE torch pipeline as a numeric oracle.

reference_oracle.py loads single reference files for per-component parity; this
helper goes further and imports the reference's *composed* net and data layer —
`src.models.components.anomaly_clip.AnomalyCLIP` (anomaly_clip.py:18-233) with its
real PromptLearner / TextEncoder / SelectorModel / TemporalModel submodules, plus
`src.data.components.feature_dataset.VideoFrameDataset` (feature_dataset.py:124-383)
— so tests can run the reference end-to-end on the same inputs as the JAX pipeline.

Missing third-party dependencies are stubbed only where the stub provably cannot
affect the oracle's numerics:

- ``dotmap``: a plain attribute-dict (the reference only reads keys it is given).
- ``ftfy``: identity ``fix_text`` (exact for the ASCII classnames we test).
- ``torchvision.transforms`` / ``pkg_resources``: used only to build the image
  *preprocess* pipeline inside ``clip.load`` — never invoked on the features path.
- ``axial_attention``: tests/helpers/axial_torch.py, the in-repo faithful torch
  re-implementation of the pip package (itself parity-pinned in
  tests/test_temporal.py); the reference's own TemporalModel module wraps it.
- ``src.utils``: ``get_pylogger`` -> stdlib logging (console logging only).

``clip.load`` (which downloads; zero egress here) is monkeypatched to hand the
net a small randomly-initialized instance of the reference's own ``CLIP`` class
(model.py:293) with exactly the shapes of our ``CLIPConfig.tiny()``.
"""

from __future__ import annotations

import importlib
import logging
import sys
import types
from pathlib import Path

import numpy as np
import torch

from tests.helpers.reference_oracle import REFERENCE_ROOT

# Tiny-but-real CLIP: (embed_dim, image_resolution, vision_layers, vision_width,
# vision_patch_size, context_length, vocab_size, transformer_width,
# transformer_heads, transformer_layers). Constraints: the reference takes
# ``embedding_dim = ln_final.weight.shape[0]`` (anomaly_clip.py:72), i.e. it
# assumes embed_dim == transformer_width (true for every OpenAI arch it runs);
# the converter infers heads as ``width // 64`` (models/clip/convert.py:71, the
# OpenAI convention); and the synthetic corpus is generated at the session
# CLIP's embed dim (CLIPConfig.tiny() -> 64). Hence width 64 with 1 head here —
# the multi-head lane-split parity is pinned separately at full ViT-B/16 shape
# in tests/test_clip_parity.py.
TINY_CLIP_ARGS = (64, 32, 2, 64, 16, 77, 49408, 64, 1, 2)

# The real ViT-B/16 shapes (reference model.py:462-519 inferred from the OpenAI
# checkpoint): embed 512, 224px, 12 vision layers x width 768 / patch 16, text
# 77 ctx x vocab 49408 x width 512 x 8 heads x 12 layers. Used by the slow
# full-shape composed oracle (tests/test_full_shape_oracle.py) — randomly
# initialized, but every shape-dependent code path (197-token attention,
# 14x14+1 position-embedding grid, 512-dim selector/temporal composition) is
# the released-checkpoint path.
VIT_B16_CLIP_ARGS = (512, 224, 12, 768, 16, 77, 49408, 512, 8, 12)


class _DotMap(dict):
    """Just-enough DotMap: attribute access over the ctor kwargs."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:  # pragma: no cover - config typo guard
            raise AttributeError(key) from e


def _install_stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return

    class _Transform:  # placeholder: preprocess is never called on features
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tf = types.ModuleType("torchvision.transforms")
    for n in ("CenterCrop", "Compose", "Normalize", "Resize", "ToTensor"):
        setattr(tf, n, _Transform)

    class InterpolationMode:
        BICUBIC = "bicubic"

    tf.InterpolationMode = InterpolationMode
    tv = types.ModuleType("torchvision")
    tv.transforms = tf
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tf


def _install_pkg_resources_stub() -> None:
    if "pkg_resources" in sys.modules:
        return
    import packaging as _packaging
    import packaging.version  # noqa: F401 - clip.py uses packaging.version.parse

    mod = types.ModuleType("pkg_resources")
    mod.packaging = _packaging
    sys.modules["pkg_resources"] = mod


def load_reference_pipeline():
    """-> (anomaly_clip module, feature_dataset module), reference code throughout."""
    if "src.models.components.anomaly_clip" in sys.modules:
        return (
            sys.modules["src.models.components.anomaly_clip"],
            sys.modules["src.data.components.feature_dataset"],
        )

    from tests.helpers import axial_torch

    _install_stub("dotmap", DotMap=_DotMap)
    _install_stub("ftfy", fix_text=lambda text: text)
    _install_stub(
        "axial_attention", AxialImageTransformer=axial_torch.AxialImageTransformer
    )
    _install_torchvision_stub()
    _install_pkg_resources_stub()

    # tests/test_data.py installs its own pathless "src" stub for the isolated
    # feature-dataset oracle; upgrade whatever is present into a package rooted
    # at the reference checkout instead of fighting over the name
    src = sys.modules.get("src")
    if src is None:
        src = types.ModuleType("src")
        sys.modules["src"] = src
    src.__path__ = [str(REFERENCE_ROOT / "src")]
    utils = sys.modules.get("src.utils")
    if utils is None:
        utils = types.ModuleType("src.utils")
        sys.modules["src.utils"] = utils
    if not hasattr(utils, "get_pylogger"):
        utils.get_pylogger = logging.getLogger
    src.utils = utils

    anomaly_clip = importlib.import_module("src.models.components.anomaly_clip")
    feature_dataset = importlib.import_module("src.data.components.feature_dataset")
    return anomaly_clip, feature_dataset


def build_reference_net(
    net_cfg: dict, *, clip_seed: int = 0, clip_args: tuple = TINY_CLIP_ARGS
) -> torch.nn.Module:
    """The reference's composed AnomalyCLIP with a seeded torch CLIP.

    ``net_cfg`` is the reference net-config dict (the keys of
    configs/model/*.yaml `net:`); ``clip_args`` picks the CLIP shape — tiny by
    default, ``VIT_B16_CLIP_ARGS`` for the full-shape oracle. The JAX side
    needs no matching config: the converter infers it from the state dict.
    """
    anomaly_clip_mod, _ = load_reference_pipeline()
    clip_pkg = sys.modules["src.models.components.clip.clip"]
    clip_model_mod = sys.modules["src.models.components.clip.model"]

    torch.manual_seed(clip_seed)
    tiny = clip_model_mod.CLIP(*clip_args).float()

    orig_load = clip_pkg.load
    clip_pkg.load = lambda *a, **k: (tiny, None)
    try:
        torch.manual_seed(clip_seed + 1)  # PromptLearner ctx init draws RNG
        net = anomaly_clip_mod.AnomalyCLIP(**net_cfg)
    finally:
        clip_pkg.load = orig_load
    net.eval()
    return net


def reference_test_dataset(data_cfg, feature_dataset_mod):
    """The reference test dataset over a (synthetic) corpus on disk
    (anomaly_clip_datamodule.py:116-129)."""
    return feature_dataset_mod.VideoFrameDataset(
        root_path=str(data_cfg["frames_root"]),
        annotationfile_path=str(data_cfg["annotation_file_test"]),
        normal_id=int(data_cfg["normal_id"]),
        num_segments=int(data_cfg["num_segments"]),
        frames_per_segment=int(data_cfg["seg_length"]),
        test_mode=True,
        ncrops=int(data_cfg["ncrops"]),
        temporal_annotation_file=str(data_cfg["annotation_file_temporal_test"]),
        labels_file=str(data_cfg["labels_file"]),
        stride=int(data_cfg["stride"]),
    )


def reference_normal_test_mode_dataset(data_cfg, feature_dataset_mod):
    """Normal-train videos in test mode — the ncentroid bootstrap's loader
    (anomaly_clip_datamodule.py:131-142)."""
    return feature_dataset_mod.VideoFrameDataset(
        root_path=str(data_cfg["frames_root"]),
        annotationfile_path=str(data_cfg["annotation_file_normal"]),
        normal_id=int(data_cfg["normal_id"]),
        num_segments=int(data_cfg["num_segments"]),
        frames_per_segment=int(data_cfg["seg_length"]),
        test_mode=True,
        ncrops=int(data_cfg["ncrops"]),
        stride=int(data_cfg["stride"]),
    )


def reference_ncentroid(dataset, embedding_dim: int) -> torch.Tensor:
    """The reference ncentroid bootstrap over a test-mode normal dataset: sum the
    *unpadded* frame features of every normal training video, divide by count
    (anomaly_clip_module.py:147-170)."""
    embedding_sum = torch.zeros(embedding_dim)
    count = 0
    with torch.no_grad():
        for i in range(len(dataset)):
            features, frame_labels, _label, _segment_size, _path = dataset[i]
            flat = features.reshape(-1, features.shape[-1])
            flat = flat[: len(frame_labels)]  # drop the padding frames
            embedding_sum += flat.sum(dim=0)
            count += flat.shape[0]
    return embedding_sum / count


def reference_eval_epoch(net, dataset, ncentroid: torch.Tensor):
    """The reference test epoch: per-video test-mode forward + the module's
    test_step composition (softmax -> joint probs -> padding trim,
    anomaly_clip_module.py:459-498), concatenated over videos (:500-504).

    Returns dict of numpy arrays {abnormal_scores, labels, class_probs} plus the
    per-video lists for sharper error localization.
    """
    per_video = []
    with torch.no_grad():
        for i in range(len(dataset)):
            features, frame_labels, _label, segment_size, path = dataset[i]
            labels = torch.as_tensor(np.asarray(frame_labels))
            similarity, abnormal_scores = net(
                features.unsqueeze(0),  # batch dim (batch_size_test=1)
                labels,
                ncentroid,
                segment_size,
                test_mode=True,
            )
            softmax_similarity = torch.softmax(similarity, dim=1)
            class_probs = softmax_similarity * abnormal_scores.unsqueeze(1)
            num_labels = labels.shape[0]
            per_video.append(
                {
                    "path": path,
                    "abnormal_scores": abnormal_scores[:num_labels].numpy(),
                    "class_probs": class_probs[:num_labels].numpy(),
                    "labels": labels.numpy(),
                }
            )
    return {
        "abnormal_scores": np.concatenate([v["abnormal_scores"] for v in per_video]),
        "labels": np.concatenate([v["labels"] for v in per_video]),
        "class_probs": np.concatenate([v["class_probs"] for v in per_video]),
        "per_video": per_video,
    }


def lightning_checkpoint_from_net(net: torch.nn.Module, path: Path) -> Path:
    """Serialize the torch net as a Lightning-style .ckpt (state_dict keys rooted
    at ``net.``, matching anomaly_clip_module.py:60 / the released checkpoints)."""
    sd = {"net." + k: v for k, v in net.state_dict().items()}
    torch.save({"state_dict": sd}, str(path))
    return path
