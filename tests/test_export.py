"""AOT serving-artifact export/reload (anomalyclip_tpu/export.py).

Pins: (a) the exported score graph reproduces GridScorer bit-for-bit across
*different* grid counts through one symbolic-shape artifact; (b) the exported
encode graph reproduces the chunked CLIP encoder incl. uint8 normalization;
(c) the artifact round-trips through serialization and loads without
constructing any model objects.
"""

import json

import numpy as np
import pytest

import __graft_entry__ as ge
from anomalyclip_tpu.eval.evaluator import GridScorer, encode_frames_chunked
from anomalyclip_tpu.export import ServingArtifact, export_serving_artifact


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    import jax

    model, frozen, trainable, bn_state = ge._build_tiny()
    rng = np.random.default_rng(0)
    ncentroid = rng.standard_normal(model.embedding_dim).astype(np.float32)
    out = tmp_path_factory.mktemp("artifact")
    export_serving_artifact(
        model,
        frozen,
        trainable,
        bn_state,
        ncentroid,
        out,
        include_encoder=True,
        classnames=["alpha", "beta", "normal", "omega"],
    )
    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)
    return model, frozen, scorer, out


def test_score_parity_across_grid_counts(exported):
    """One symbolic-g artifact == the bucketed GridScorer at several g."""
    model, _, scorer, out = exported
    art = ServingArtifact.load(out)
    rng = np.random.default_rng(1)
    n, l, d = model.cfg.num_segments, model.cfg.seg_length, model.embedding_dim
    for g in (1, 3, 5):
        grids = rng.standard_normal((g, n, l, d)).astype(np.float32)
        sim_ref, sc_ref = scorer.score_grids(grids)
        sim_art, sc_art = art.score(grids)
        np.testing.assert_allclose(sim_art, sim_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(sc_art, sc_ref, rtol=1e-5, atol=1e-5)


def test_encode_parity_and_uint8_normalization(exported):
    import jax

    model, frozen, scorer, out = exported
    art = ServingArtifact.load(out)
    side = int(model.clip_cfg.image_resolution)
    rng = np.random.default_rng(2)
    frames_u8 = rng.integers(0, 256, (5, side, side, 3), dtype=np.uint8)
    ref = encode_frames_chunked(
        jax.jit(model.encode_frames), frozen, frames_u8, chunk=model.ENCODE_CHUNK
    )
    got = art.encode(frames_u8)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-5, atol=2e-5
    )


def test_meta_and_version_guard(exported, tmp_path):
    _, _, _, out = exported
    meta = json.loads((out / "meta.json").read_text())
    assert meta["format_version"] == 1
    assert meta["classnames"] == ["alpha", "beta", "normal", "omega"]
    assert meta["grid"]["num_segments"] == 8 and meta["grid"]["seg_length"] == 4

    # a future-format artifact must refuse to load, not mis-run
    import shutil

    newer = tmp_path / "newer"
    shutil.copytree(out, newer)
    meta["format_version"] = 99
    (newer / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="newer"):
        ServingArtifact.load(newer)


def test_score_shape_guard(exported):
    _, _, _, out = exported
    art = ServingArtifact.load(out)
    with pytest.raises(ValueError, match="exported"):
        art.score(np.zeros((2, 3, 3, 7), np.float32))
