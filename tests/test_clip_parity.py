"""CLIP numeric parity: our JAX encoders vs the reference torch model.

A small randomly-initialized torch CLIP is built from the reference architecture,
its state dict converted through our converter, and image/text encodings compared to
~1e-5 in fp32. This validates QuickGELU, fp32 LayerNorm, attention layout, the
patchify-as-matmul embedding, and the EOT gather without needing the (offline-
unavailable) OpenAI checkpoint.
"""

import numpy as np
import pytest

from anomalyclip_tpu.models.clip.convert import torch_state_dict_to_params
from anomalyclip_tpu.models.clip.model import (
    encode_image,
    encode_text,
    text_transformer_on_embeddings,
)
from tests.helpers.reference_oracle import load_reference_clip_model, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

VOCAB = 512  # small vocab keeps the torch model light; ids must stay below this


@pytest.fixture(scope="module")
def torch_and_jax():
    import torch

    ref = load_reference_clip_model()
    torch.manual_seed(0)
    model = ref.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=128,
        vision_patch_size=16,
        context_length=77,
        vocab_size=VOCAB,
        transformer_width=128,
        transformer_heads=2,  # must equal width//64: config inference uses that rule
        transformer_layers=2,
    ).float()
    model.eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in model.state_dict().items()}
    params, cfg = torch_state_dict_to_params(sd)
    return model, params, cfg


def test_config_inference(torch_and_jax):
    _, _, cfg = torch_and_jax
    assert cfg.vision_width == 128
    assert cfg.vision_layers == 2
    assert cfg.vision_patch_size == 16
    assert cfg.transformer_heads == 2
    assert cfg.vocab_size == VOCAB


def test_encode_image_parity(torch_and_jax):
    import torch

    model, params, cfg = torch_and_jax
    rng = np.random.default_rng(1)
    images = rng.standard_normal((3, 3, 32, 32), dtype=np.float32)  # NCHW for torch

    with torch.no_grad():
        want = model.encode_image(torch.from_numpy(images)).numpy()

    got = np.asarray(encode_image(params, cfg, images.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encode_text_parity(torch_and_jax):
    import torch

    model, params, cfg = torch_and_jax
    rng = np.random.default_rng(2)
    tokens = np.zeros((4, 77), dtype=np.int64)
    for i in range(4):
        n = int(rng.integers(3, 70))
        body = rng.integers(1, VOCAB - 2, size=n)
        tokens[i, 0] = VOCAB - 2  # pretend SOT
        tokens[i, 1 : n + 1] = body
        tokens[i, n + 1] = VOCAB - 1  # EOT: max id so argmax finds it

    with torch.no_grad():
        want = model.encode_text(torch.from_numpy(tokens)).numpy()

    got = np.asarray(encode_text(params, cfg, tokens.astype(np.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_full_vit_b16_parity_with_fp16_checkpoint():
    """Full ViT-B/16 shape (12 layers, width 768, 197 tokens) through the converter
    and encoder pair, from an fp16-stored state dict — the released checkpoints'
    format (reference: model.py:433-459 convert_weights). CPU, fp32 compute."""
    import torch

    ref = load_reference_clip_model()
    torch.manual_seed(7)
    model = ref.CLIP(
        embed_dim=512,
        image_resolution=224,
        vision_layers=12,
        vision_width=768,
        vision_patch_size=16,
        context_length=77,
        vocab_size=VOCAB,  # full 49408 embedding table adds nothing numerically
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
    ).float().eval()

    # fp16-store round trip (what the released .pt/.ckpt files contain)
    sd_fp16 = {k: v.half() for k, v in model.state_dict().items()}
    model.load_state_dict({k: v.float() for k, v in sd_fp16.items()})
    sd = {k: np.asarray(v.float().numpy()) for k, v in sd_fp16.items()}
    params, cfg = torch_state_dict_to_params(sd)
    assert cfg.vision_layers == 12 and cfg.vision_width == 768
    assert cfg.embed_dim == 512 and cfg.vision_patch_size == 16
    assert params["visual"]["blocks"]["attn"]["qkv_w"].dtype == np.float32

    rng = np.random.default_rng(4)
    images = rng.standard_normal((2, 3, 224, 224), dtype=np.float32)
    with torch.no_grad():
        want = model.encode_image(torch.from_numpy(images)).numpy()
    got = np.asarray(encode_image(params, cfg, images.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    tokens = np.zeros((2, 77), dtype=np.int64)
    tokens[:, 0] = VOCAB - 2
    tokens[0, 1:9] = rng.integers(1, VOCAB - 2, size=8)
    tokens[0, 9] = VOCAB - 1
    tokens[1, 1:40] = rng.integers(1, VOCAB - 2, size=39)
    tokens[1, 40] = VOCAB - 1
    with torch.no_grad():
        want_t = model.encode_text(torch.from_numpy(tokens)).numpy()
    got_t = np.asarray(encode_text(params, cfg, tokens.astype(np.int32)))
    np.testing.assert_allclose(got_t, want_t, rtol=2e-4, atol=2e-4)


def test_text_on_embeddings_matches_encode_text(torch_and_jax):
    """The CoOp path (embeddings in, EOT indices in) must equal encode_text when fed
    the embedding-table rows (reference: text_encoder.py:14-25 vs model.py:401-414)."""
    _, params, cfg = torch_and_jax
    rng = np.random.default_rng(3)
    tokens = np.zeros((2, 77), dtype=np.int32)
    tokens[:, 0] = VOCAB - 2
    tokens[0, 1:5] = rng.integers(1, VOCAB - 2, size=4)
    tokens[0, 5] = VOCAB - 1
    tokens[1, 1:9] = rng.integers(1, VOCAB - 2, size=8)
    tokens[1, 9] = VOCAB - 1

    via_tokens = np.asarray(encode_text(params, cfg, tokens))
    embeddings = np.asarray(params["text"]["token_embedding"])[tokens]
    eot = tokens.argmax(axis=-1)
    via_embeddings = np.asarray(
        text_transformer_on_embeddings(params, cfg, embeddings, eot)
    )
    np.testing.assert_allclose(via_embeddings, via_tokens, rtol=1e-5, atol=1e-6)


def test_modified_resnet_parity():
    """ModifiedResNet tower (RN-family CLIP checkpoints): converter + NHWC forward
    vs the reference torch model in eval mode (reference: model.py:10-171)."""
    import torch

    ref = load_reference_clip_model()
    torch.manual_seed(11)
    model = ref.CLIP(
        embed_dim=64,
        image_resolution=64,         # attnpool spacial_dim = 2
        vision_layers=(1, 1, 1, 1),  # tuple -> ModifiedResNet
        vision_width=16,
        vision_patch_size=None,
        context_length=77,
        vocab_size=VOCAB,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
    ).float().eval()
    # randomize BN running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    sd = {k: np.asarray(v.detach().numpy()) for k, v in model.state_dict().items()}
    params, cfg = torch_state_dict_to_params(sd)
    assert cfg.is_resnet and cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.image_resolution == 64 and cfg.vision_heads == 16 * 32 // 64

    rng = np.random.default_rng(5)
    images = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model.encode_image(torch.from_numpy(images)).numpy()
    got = np.asarray(encode_image(params, cfg, images.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rn50_random_init_encodes():
    """clip_init=random-full must work for ResNet archs too (regression: RN50 in
    the registry crashed init_clip_params, which was ViT-only)."""
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import encode_image
    from anomalyclip_tpu.models.clip.registry import resolve_clip

    params, cfg = resolve_clip("RN50", clip_init="random-full")
    assert cfg.is_resnet
    out = encode_image(params, cfg, jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert out.shape == (2, cfg.embed_dim)
    assert bool(jnp.isfinite(out).all())
