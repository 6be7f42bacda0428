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


def _lightning_sd(clip_model, temporal, n_cls: int, n_ctx: int, ctx_dim: int):
    """Reference Lightning state-dict key structure from torch modules."""
    import torch

    state = {}
    for k, v in clip_model.state_dict().items():
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
    return state


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

    state = _lightning_sd(clip_model, temporal, n_cls=5, n_ctx=8, ctx_dim=128)
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


def test_load_state_rebuilds_prompt_spec_from_checkpoint_clip(tmp_path):
    """module.load_state on a Lightning .ckpt must rebuild the prompt spec from
    the *checkpoint's* token embedding even when the session CLIP has the
    identical config: the spec's prefix/suffix embeddings come from the token
    embedding, and a same-shape session model would otherwise silently mix its
    own (different) embeddings with the checkpoint's transformer weights.

    Uses a full-vocab tiny CLIP (the BPE tokenizer emits real 49k-range ids, so
    the module-level path cannot run on the truncated-vocab fixture)."""
    import torch

    from tests.helpers.axial_torch import TemporalModel as TorchTemporalModel
    from tests.helpers.synthetic_run import synthetic_cfg
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    ref = load_reference_clip_model()
    torch.manual_seed(0)
    clip_model = ref.CLIP(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    ).float().eval()
    temporal = TorchTemporalModel(
        input_size=64, emb_size=32, output_size=1, heads=4, dim_heads=None,
        depth=1, num_segments=8, seg_length=4,
    ).float().eval()
    state = _lightning_sd(clip_model, temporal, n_cls=6, n_ctx=8, ctx_dim=64)
    ckpt = tmp_path / "released.ckpt"
    torch.save({"state_dict": state, "epoch": 7}, str(ckpt))

    # the checkpoint's own CLIP weights, and a same-config perturbed copy
    sd_ref = {k: v.clone() for k, v in clip_model.state_dict().items()}
    sd_pert = {k: v.clone() for k, v in sd_ref.items()}
    torch.manual_seed(7)
    sd_pert["token_embedding.weight"] += 0.5 * torch.randn_like(
        sd_pert["token_embedding.weight"]
    )
    ref_pt, pert_pt = tmp_path / "clip_ref.pt", tmp_path / "clip_pert.pt"
    torch.save(sd_ref, str(ref_pt))
    torch.save(sd_pert, str(pert_pt))

    def build(ckpt_pt):
        cfg = synthetic_cfg(
            tmp_path,
            f"model.net.clip_ckpt_path={ckpt_pt}",
            "model.net.clip_init=pretrained",
            "model.net.n_ctx=8",
        )
        return AnomalyCLIPTrainModule(cfg)

    # ground truth: a module built directly around the checkpoint's CLIP
    want = build(ref_pt).model.prompt_spec

    # session built around the perturbed same-config CLIP, then .ckpt loaded
    module = build(pert_pt)
    before = module.model.prompt_spec
    assert not np.allclose(before.token_suffix, want.token_suffix, atol=1e-5)
    module.load_state(str(ckpt))
    after = module.model.prompt_spec
    np.testing.assert_allclose(after.token_prefix, want.token_prefix, atol=1e-5)
    np.testing.assert_allclose(after.token_suffix, want.token_suffix, atol=1e-5)
