"""Released-checkpoint converter: synthetic Lightning state dict round trip.

Builds the exact key structure of a reference Lightning ``.ckpt`` state_dict
(``net.image_encoder.*`` / ``net.text_encoder.*`` / ``net.prompt_learner.ctx`` /
``net.selector_model.bn_layer.*`` / ``net.temporal_model.*`` incl. the lucidrains
axial-attention paths) from torch modules, converts it, and checks:

- CLIP image/text encoders produce the torch model's outputs,
- the temporal pytree matches the torch oracle's forward,
- prompt ctx / text_projection / BN stats land in the right pytree slots,
- fp16-stored state dicts (how the released checkpoints ship) convert losslessly.
"""

import io

import numpy as np
import pytest

from tests.helpers.reference_oracle import load_reference_clip_model, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

VOCAB = 512


@pytest.fixture(scope="module")
def synthetic_lightning_ckpt(tmp_path_factory):
    """A Lightning-style checkpoint file with the reference's key structure."""
    import torch

    from tests.helpers.axial_torch import TemporalModel as TorchTemporalModel

    ref = load_reference_clip_model()
    torch.manual_seed(0)
    clip_model = ref.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=128,
        vision_patch_size=16,
        context_length=77,
        vocab_size=VOCAB,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
    ).float().eval()

    temporal = TorchTemporalModel(
        input_size=64, emb_size=32, output_size=1, heads=4, dim_heads=None,
        depth=1, num_segments=8, seg_length=4,
    ).float().eval()

    n_cls, n_ctx, ctx_dim = 5, 8, 128
    state = {}
    clip_sd = clip_model.state_dict()
    for k, v in clip_sd.items():
        if k.startswith("visual."):
            state["net.image_encoder." + k[len("visual."):]] = v
        elif k.startswith("transformer."):
            state["net.text_encoder.transformer." + k[len("transformer."):]] = v
        elif k == "positional_embedding":
            state["net.text_encoder.positional_embedding"] = v
        elif k.startswith("ln_final."):
            state["net.text_encoder." + k] = v
        elif k == "text_projection":
            state["net.text_encoder.text_projection"] = v
        elif k == "token_embedding.weight":
            state["net.token_embedding.weight"] = v
        elif k == "logit_scale":
            state["net.selector_model.logit_scale"] = v
    torch.manual_seed(1)
    state["net.prompt_learner.ctx"] = 0.02 * torch.randn(n_cls, n_ctx, ctx_dim)
    state["net.prompt_learner.token_prefix"] = torch.randn(n_cls, 1, ctx_dim)
    state["net.prompt_learner.token_suffix"] = torch.randn(n_cls, 77 - 1 - n_ctx, ctx_dim)
    state["net.selector_model.bn_layer.running_mean"] = torch.randn(n_cls - 1)
    state["net.selector_model.bn_layer.running_var"] = torch.rand(n_cls - 1) + 0.5
    state["net.selector_model.bn_layer.num_batches_tracked"] = torch.tensor(42)
    for k, v in temporal.state_dict().items():
        state["net.temporal_model." + k] = v

    path = tmp_path_factory.mktemp("ckpt") / "epoch_042.ckpt"
    torch.save({"state_dict": state, "epoch": 42}, str(path))
    return path, clip_model, temporal, state


def test_full_conversion_structure(synthetic_lightning_ckpt):
    from anomalyclip_tpu.convert_ckpt import convert_lightning_checkpoint

    path, clip_model, temporal, state = synthetic_lightning_ckpt
    frozen, trainable, bn_state = convert_lightning_checkpoint(path)

    np.testing.assert_array_equal(
        trainable["prompt_ctx"], state["net.prompt_learner.ctx"].numpy()
    )
    np.testing.assert_array_equal(
        trainable["text_projection"], state["net.text_encoder.text_projection"].numpy()
    )
    np.testing.assert_array_equal(
        bn_state.mean, state["net.selector_model.bn_layer.running_mean"].numpy()
    )
    np.testing.assert_array_equal(
        bn_state.var, state["net.selector_model.bn_layer.running_var"].numpy()
    )
    assert frozen["clip"]["text"]["token_embedding"].shape == (VOCAB, 128)


def test_converted_clip_matches_torch(synthetic_lightning_ckpt):
    import torch

    from anomalyclip_tpu.convert_ckpt import (
        convert_lightning_checkpoint,
        converted_clip_config,
    )
    from anomalyclip_tpu.models.clip.model import encode_image, encode_text

    path, clip_model, _, _ = synthetic_lightning_ckpt
    frozen, _, _ = convert_lightning_checkpoint(path)
    cfg = converted_clip_config(path)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want_img = clip_model.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    got_img = np.asarray(encode_image(frozen["clip"], cfg, images))
    np.testing.assert_allclose(got_img, want_img, rtol=1e-4, atol=1e-5)

    tokens = rng.integers(1, VOCAB - 1, size=(3, 77)).astype(np.int64)
    tokens[:, -1] = VOCAB - 1  # EOT = argmax position at the end
    with torch.no_grad():
        want_txt = clip_model.encode_text(torch.from_numpy(tokens)).numpy()
    got_txt = np.asarray(encode_text(frozen["clip"], cfg, tokens.astype(np.int32)))
    np.testing.assert_allclose(got_txt, want_txt, rtol=1e-4, atol=1e-5)


def test_converted_temporal_matches_oracle(synthetic_lightning_ckpt):
    import torch

    from anomalyclip_tpu.convert_ckpt import convert_lightning_checkpoint
    from anomalyclip_tpu.models.temporal import TemporalConfig, temporal_scores

    import jax.numpy as jnp

    path, _, temporal, _ = synthetic_lightning_ckpt
    _, trainable, _ = convert_lightning_checkpoint(path)
    cfg = TemporalConfig(
        input_size=64, emb_size=32, depth=1, heads=4, dim_heads=None,
        num_segments=8, seg_length=4,
    )
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2 * 8 * 4, 64)).astype(np.float32)
    with torch.no_grad():
        want = temporal(torch.from_numpy(feats), segment_size=1, test_mode=False).numpy()
    got = np.asarray(
        temporal_scores(jnp.asarray(feats), trainable["temporal"], cfg, test_mode=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fp16_checkpoint_roundtrip(synthetic_lightning_ckpt, tmp_path):
    """Released checkpoints store fp16 weights (reference model.py:433-459):
    conversion must upcast to fp32 and preserve values exactly."""
    import torch

    from anomalyclip_tpu.convert_ckpt import (
        convert_lightning_checkpoint,
        load_lightning_state_dict,
    )

    path, _, _, state = synthetic_lightning_ckpt
    half_state = {
        k: (v.half() if v.is_floating_point() else v) for k, v in state.items()
    }
    half_path = tmp_path / "fp16.ckpt"
    torch.save({"state_dict": half_state}, str(half_path))

    sd = load_lightning_state_dict(half_path)
    assert all(v.dtype == np.float32 for v in sd.values() if v.dtype.kind == "f")

    frozen, trainable, bn_state = convert_lightning_checkpoint(half_path)
    np.testing.assert_array_equal(
        trainable["prompt_ctx"],
        state["net.prompt_learner.ctx"].half().float().numpy(),
    )


def test_arch_registry_matches_openai_shapes():
    """Named configs cover the reference's _MODELS registry families
    (reference: clip.py:31-41, 103-105); exotic archs load via shape
    inference either way."""
    from anomalyclip_tpu.models.clip.model import CLIPConfig
    from anomalyclip_tpu.models.clip.registry import available_models

    assert available_models() == ["RN50", "ViT-B/16", "ViT-B/32", "ViT-L/14", "ViT-L/14@336px"]
    l14 = CLIPConfig.vit_l14()
    assert (l14.vision_layers, l14.vision_width, l14.vision_patch_size) == (24, 1024, 14)
    assert (l14.embed_dim, l14.transformer_width, l14.transformer_heads) == (768, 768, 12)
    assert l14.vision_heads == 16
    assert CLIPConfig.vit_l14_336().image_resolution == 336
    assert CLIPConfig.vit_l14_336().grid_size == 24
    rn = CLIPConfig.rn50()
    assert rn.is_resnet and rn.vision_layers == (3, 4, 6, 3) and rn.vision_heads == 32
