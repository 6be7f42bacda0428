"""W8A8 int8 serving path (models/clip/quant.py): mechanism and wiring.

Fidelity against *released* checkpoints is unmeasurable offline; these tests
pin the quantization mechanics (error bounds, layer mirroring, config routing)
at shapes up to full ViT-B/16.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from anomalyclip_tpu.models.clip.model import (  # noqa: E402
    CLIPConfig,
    encode_image,
    init_clip_params,
)
from anomalyclip_tpu.models.clip.quant import (  # noqa: E402
    encode_image_int8,
    int8_linear,
    quantize_clip_visual,
    quantize_weight,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_quantize_weight_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 96)).astype(np.float32) * 0.1
    q = quantize_weight(w)
    assert q["w_q"].dtype == np.int8
    deq = q["w_q"].astype(np.float32) * q["scale"][None, :]
    # symmetric per-channel int8: error <= scale/2 per element
    assert np.all(np.abs(deq - w) <= q["scale"][None, :] * 0.5 + 1e-7)


def test_quantize_weight_stacked_blocks_axis():
    """Stacked (layers, in, out) weights quantize per (layer, out) channel."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 8, 16)).astype(np.float32)
    w[1] *= 100.0  # one layer much larger: scales must be per layer
    q = quantize_weight(w)
    assert q["scale"].shape == (3, 16)
    assert np.all(q["scale"][1] > q["scale"][0])


def test_int8_linear_error_bound():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32) * 0.05
    b = rng.standard_normal(256).astype(np.float32) * 0.01
    q = jax.tree_util.tree_map(jnp.asarray, quantize_weight(w))
    got = np.asarray(int8_linear(x, q, jnp.asarray(b)))
    want = np.asarray(x) @ w + b
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.03, rel  # W8A8 with per-token/per-channel scales


@pytest.mark.parametrize(
    "cfg_fn",
    [
        CLIPConfig.tiny,
        pytest.param(CLIPConfig.vit_b16, marks=pytest.mark.slow),  # ~40 s XLA:CPU
    ],
)
def test_encode_image_int8_tracks_fp32(cfg_fn):
    cfg = cfg_fn()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qv = quantize_clip_visual(params)
    rng = np.random.default_rng(3)
    batch = 2 if cfg.vision_width > 128 else 4
    imgs = jnp.asarray(
        rng.standard_normal((batch, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.float32,
    )
    f32 = encode_image(params, cfg, imgs)
    i8 = encode_image_int8(qv, cfg, imgs, jnp.float32)
    cos = _cosine(f32, i8)
    assert np.all(cos > 0.999), cos


def test_module_routes_int8_encode(tmp_path):
    """model.net.quantize=int8 routes the module's frame encoder through the
    W8A8 tower; scores stay finite and shaped."""
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from tests.helpers.synthetic_run import synthetic_cfg

    cfg = synthetic_cfg(
        tmp_path,
        "data.load_from_features=False",
        "data.input_size=32",
        "data.fast_decode=True",
        "data.synthetic_min_frames=120",
        "data.synthetic_max_frames=160",
        "data.synthetic_num_test=1",
        "data.num_workers=0",
        "model.net.quantize=int8",
    )
    m = AnomalyCLIPTrainModule(cfg)
    fn = m._encode_jit()
    assert getattr(fn, "_int8", False), "int8 route not taken"
    frames = np.random.default_rng(0).standard_normal((8, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(fn(m.frozen, jnp.asarray(frames)))
    assert feats.shape == (8, m.model.clip_cfg.embed_dim)
    assert np.isfinite(feats).all()

    # and it tracks the fp32 tower on the same frames
    ref = np.asarray(
        jax.jit(m.model.encode_frames)(m._frozen_on_device(), jnp.asarray(frames))
    )
    assert np.all(_cosine(ref, feats) > 0.999)


def test_int8_is_serving_only(tmp_path):
    """fit() (incl. the ncentroid bootstrap) must encode on the fp tower even
    with quantize=int8, and the memoized encode fn must not leak the fit-scoped
    fp routing into the post-fit serving path (or vice versa)."""
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from tests.helpers.synthetic_run import synthetic_cfg

    m = AnomalyCLIPTrainModule(synthetic_cfg(tmp_path, "model.net.quantize=int8"))
    # pre-fit (serving) routing is int8...
    assert getattr(m._encode_jit(), "_int8", False)

    seen = {}
    m._scorer_cache = "pre-fit-int8-scorer"  # must not leak into fit

    def fake_body():
        seen["in_fit"] = m._in_fit
        seen["int8_during_fit"] = getattr(m._encode_jit(), "_int8", False)
        seen["scorer_cache_at_entry"] = m._scorer_cache
        m._scorer_cache = "fit-scoped-fp-scorer"  # must not leak out of fit
        return {}

    m._fit_body = fake_body  # shadow the real epoch loop: routing is the test
    m._fit()
    # ...fp inside fit (and the pre-fit int8 scorer was dropped)...
    assert seen == {
        "in_fit": True,
        "int8_during_fit": False,
        "scorer_cache_at_entry": None,
    }
    # ...and the fit-scoped fp encoder AND the GridScorer capturing it were
    # dropped at exit, so post-fit test()/serve rebuilds onto the int8 tower
    assert m._encode_frames_jit is None
    assert m._scorer_cache is None
    assert not m._in_fit
    assert getattr(m._encode_jit(), "_int8", False)


@pytest.mark.parametrize("mp", [1, 2])
def test_quantize_knob_validated(tmp_path, mp):
    """Unknown quantize values raise instead of silently serving the fp tower
    (the knob's only effect is throughput — a typo would be invisible), on
    every encode route incl. tensor-parallel."""
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from tests.helpers.synthetic_run import synthetic_cfg

    m = AnomalyCLIPTrainModule(
        synthetic_cfg(
            tmp_path,
            "model.net.quantize=w8a8",
            f"+trainer.model_parallel={mp}",
        )
    )
    with pytest.raises(ValueError, match="quantize"):
        m._encode_jit()
