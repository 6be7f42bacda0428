"""Tensor-parallel CLIP (parallel/tp.py): Megatron-sharded towers over a 2-D
(data, model) mesh must match the single-device forward exactly, and the block
weights must actually be distributed (1/mp per device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anomalyclip_tpu.models.clip.model import (
    CLIPConfig,
    encode_image,
    encode_text,
    init_clip_params,
)
from anomalyclip_tpu.parallel.tp import (
    MODEL_AXIS,
    clip_tp_specs,
    dp_mp_mesh,
    shard_clip_params,
    tp_encode_images,
    tp_encode_text,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh (conftest)"
)


@pytest.fixture(scope="module")
def tiny():
    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _images(cfg, batch=8):
    rng = np.random.default_rng(0)
    side = cfg.image_resolution
    return jnp.asarray(rng.standard_normal((batch, side, side, 3)), jnp.float32)


@pytest.mark.parametrize("dp,mp", [(2, 4), (4, 2), (1, 8)])
def test_tp_encode_image_matches_single_device(tiny, dp, mp):
    cfg, params = tiny
    images = _images(cfg)
    want = np.asarray(encode_image(params, cfg, images))

    mesh = dp_mp_mesh(dp, mp)
    placed = shard_clip_params(params, mesh)
    got = np.asarray(tp_encode_images(cfg, mesh)(placed, images))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tp_encode_text_matches_single_device(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    tokens = np.zeros((4, cfg.context_length), dtype=np.int32)
    lengths = rng.integers(3, cfg.context_length, size=4)
    for i, n in enumerate(lengths):
        tokens[i, :n] = rng.integers(1, cfg.vocab_size - 1, size=n)
        tokens[i, n - 1] = cfg.vocab_size - 1  # EOT = argmax position
    tokens = jnp.asarray(tokens)
    want = np.asarray(encode_text(params, cfg, tokens))

    mesh = dp_mp_mesh(2, 4)
    placed = shard_clip_params(params, mesh)
    got = np.asarray(tp_encode_text(cfg, mesh)(placed, tokens))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tp_specs_cover_param_tree(tiny):
    """Spec tree must be congruent with the param tree (tree_map would throw
    otherwise) and shard exactly the block matmul weights."""
    cfg, params = tiny
    specs = clip_tp_specs(params)
    flat_p = jax.tree_util.tree_structure(params)
    flat_s = jax.tree_util.tree_structure(specs)
    assert flat_p == flat_s

    for tower in ("visual", "text"):
        blk = specs[tower]["blocks"]
        assert blk["attn"]["qkv_w"] == (None, None, MODEL_AXIS)
        assert blk["attn"]["out_w"] == (None, MODEL_AXIS, None)
        assert blk["mlp"]["fc_w"] == (None, None, MODEL_AXIS)
        assert blk["mlp"]["proj_w"] == (None, MODEL_AXIS, None)
        assert specs[tower]["ln_post" if tower == "visual" else "ln_final"][
            "scale"
        ] == ()


def test_tp_weights_are_distributed(tiny):
    """Each device must hold 1/mp of a sharded block weight, not a replica."""
    cfg, params = tiny
    mesh = dp_mp_mesh(2, 4)
    placed = shard_clip_params(params, mesh)
    qkv = placed["visual"]["blocks"]["attn"]["qkv_w"]
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    full = qkv.shape
    assert shard_shapes == {(full[0], full[1], full[2] // 4)}
    # replicated leaves stay whole
    ln = placed["visual"]["ln_pre"]["scale"]
    assert {s.data.shape for s in ln.addressable_shards} == {ln.shape}


@pytest.fixture(scope="module")
def four_head():
    """Width-256 -> 4 heads (vision_heads = width // 64): head-aligned TP needs
    mp | heads, which the 1-head tiny config cannot provide."""
    from anomalyclip_tpu.models.clip.model import CLIPConfig

    cfg = CLIPConfig(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=256,
        vision_patch_size=16, context_length=77, vocab_size=512,
        transformer_width=64, transformer_heads=4, transformer_layers=2,
    )
    params = init_clip_params(jax.random.PRNGKey(3), cfg)
    return cfg, params


@pytest.mark.parametrize("dp,mp", [(2, 4), (4, 2)])
def test_aligned_tp_encode_matches_single_device(four_head, dp, mp):
    from anomalyclip_tpu.parallel.tp import (
        shard_clip_params_aligned,
        tp_encode_images_aligned,
    )

    cfg, params = four_head
    images = _images(cfg)
    want = np.asarray(encode_image(params, cfg, images))

    mesh = dp_mp_mesh(dp, mp)
    placed = shard_clip_params_aligned(params, mesh)
    got = np.asarray(tp_encode_images_aligned(cfg, mesh)(placed, images))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_aligned_tp_schedule_has_no_resharding(four_head):
    """The head-aligned layout must realize the exact Megatron schedule: psum
    all-reduces only, zero collective-permutes in the compiled block scan."""
    from anomalyclip_tpu.parallel.tp import (
        shard_clip_params_aligned,
        tp_encode_images_aligned,
    )

    cfg, params = four_head
    mesh = dp_mp_mesh(2, 4)
    placed = shard_clip_params_aligned(params, mesh)
    images = _images(cfg)
    compiled = tp_encode_images_aligned(cfg, mesh).lower(placed, images).compile()
    hlo = compiled.as_text()
    assert "collective-permute" not in hlo, "aligned TP must not reshard"
    assert "all-reduce" in hlo  # the two per-block psums survive compilation


def test_tp_capacity_no_full_tower_per_device(tmp_path):
    """model_parallel delivers *capacity*, not just latency: the checkpoint is
    streamed straight into its sharded placement, so during TP encode no device
    holds the full unsharded visual tower — frozen params stay host numpy, the
    single-device placement is never materialized, and every sharded weight's
    per-device shard is 1/mp of the full leaf. Eval keeps working against the
    host-resident copy (train/module.py:_tp_encode_fn)."""
    import jax.numpy as jnp

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
        "trainer.model_parallel=4",
    )
    m = AnomalyCLIPTrainModule(cfg)
    fn = m._encode_jit()
    assert getattr(fn, "_tp", False), "TP route not taken"

    # drive the TP encoder for real (also exercises the chunked-encode path)
    frames = np.zeros((8, 32, 32, 3), np.float32)
    feats = fn(m.frozen, jnp.asarray(frames))
    assert np.asarray(feats).shape == (8, m.model.clip_cfg.embed_dim)

    # the unsharded tower never reached a device
    assert m._frozen_dev is None
    for leaf in jax.tree_util.tree_leaves(m.frozen):
        assert isinstance(leaf, np.ndarray), type(leaf)

    # every sharded leaf of the placed tree holds 1/mp per device
    placed_qkv = m._tp_placed["visual"]["blocks"]["attn"]["qkv_w"]
    full_bytes = placed_qkv.nbytes
    shard_bytes = {s.data.nbytes for s in placed_qkv.addressable_shards}
    assert shard_bytes == {full_bytes // 4}

    # eval composes against the host copy: text features + grid scoring work
    trainable, bn_state = m.model.init_trainable(jax.random.PRNGKey(0), m.frozen)
    from anomalyclip_tpu.eval.evaluator import GridScorer

    scorer = GridScorer(m.model, encode_jit=fn)
    scorer.update(m.frozen, trainable, bn_state, np.zeros(m.model.embedding_dim))
    n, l = m.net_cfg.num_segments, m.net_cfg.seg_length
    grids = np.random.default_rng(0).standard_normal(
        (1, n, l, m.model.embedding_dim)
    ).astype(np.float32)
    sim, scores = scorer.score_grids(grids)
    assert sim.shape == (n * l, m.datamodule.num_classes - 1)
    assert scores.shape == (n * l,)


@pytest.mark.slow
def test_model_parallel_knob_scores_identically(tmp_path):
    """trainer.model_parallel=2 routes the module's frame encoder through the
    TP tower (parallel/tp.py); test metrics on the frames path must equal the
    single-tower run exactly."""
    from tests.helpers.synthetic_run import synthetic_cfg
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    overrides = [
        "data.load_from_features=False",
        "data.input_size=32",
        "data.fast_decode=True",
        "data.synthetic_min_frames=120",
        "data.synthetic_max_frames=160",
        "data.synthetic_num_test=2",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=2",
    ]

    cfg1 = synthetic_cfg(tmp_path / "mp1", *overrides)
    m1 = AnomalyCLIPTrainModule(cfg1)
    m1.fit()
    ckpt = m1.save_dir / "checkpoints" / "last"

    # same checkpoint evaluated with the TP encoder
    cfg2 = synthetic_cfg(tmp_path / "mp1", *overrides, "trainer.model_parallel=2")
    m2 = AnomalyCLIPTrainModule(cfg2)
    want = m1.test(ckpt_path=str(ckpt))
    got = m2.test(ckpt_path=str(ckpt))
    # the TP route must actually have been taken (both routes are wrappers now;
    # _tp_encode_fn tags its closure)
    assert m2._encode_frames_jit is not None
    assert getattr(m2._encode_frames_jit, "_tp", False), "fell back to single-tower"
    for k in ("auc_roc", "auc_pr"):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k
