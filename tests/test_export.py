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


def _reference_video_scores(model, scorer, raw):
    """The checkpoint-backed per-video pipeline (predict.score_input's core):
    test-time sampling + evaluator.score_video on a TestItem."""
    from anomalyclip_tpu.data.dataset import TestItem
    from anomalyclip_tpu.data.sampling import gather_frame_indices, test_start_indices
    from anomalyclip_tpu.eval.evaluator import score_video

    t_raw = raw.shape[1]
    cfg = model.cfg
    starts, segment_size = test_start_indices(
        t_raw, cfg.num_segments, cfg.seg_length, cfg.stride
    )
    indices = gather_frame_indices(starts, cfg.seg_length, cfg.stride, t_raw)
    item = TestItem(
        features=raw[:, indices],
        frame_labels=np.full(t_raw, int(model.cfg.normal_id), dtype=np.int64),
        video_label=int(model.cfg.normal_id),
        segment_size=segment_size,
        path="x",
    )
    return score_video(item, scorer, model)


def test_artifact_score_video_matches_evaluator_features(exported):
    """Full per-video scoring from the artifact alone == the evaluator pipeline,
    at a length that exercises covering-pad + trim."""
    model, _, scorer, out = exported
    art = ServingArtifact.load(out)
    rng = np.random.default_rng(3)
    t_raw = 77  # not a multiple of n*l: forces sampling pad + output trim
    raw = rng.standard_normal((1, t_raw, model.embedding_dim)).astype(np.float32)

    vs = _reference_video_scores(model, scorer, raw)
    sim, sc, probs = art.score_video(raw)
    assert sim.shape == vs.similarity.shape and sc.shape == (t_raw,)
    np.testing.assert_allclose(sim, vs.similarity, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sc, vs.scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(probs, vs.class_probs, rtol=1e-4, atol=1e-5)


def test_artifact_score_video_matches_evaluator_frames(exported):
    """The from-frames branch (exported encoder feeding the score graph)."""
    model, _, scorer, out = exported
    art = ServingArtifact.load(out)
    side = int(model.clip_cfg.image_resolution)
    rng = np.random.default_rng(4)
    t_raw = 37
    raw = rng.integers(0, 256, (1, t_raw, side, side, 3), dtype=np.uint8)

    vs = _reference_video_scores(model, scorer, raw)
    sim, sc, probs = art.score_video(raw)
    np.testing.assert_allclose(sim, vs.similarity, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(sc, vs.scores, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(probs, vs.class_probs, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    """The full deployment path: train -> export CLI -> artifact predict, and
    the artifact's predictions match the checkpoint-backed predict CLI on the
    same input (same floats up to jit-vs-export compilation noise)."""
    import json

    from anomalyclip_tpu.export import main as export_main
    from anomalyclip_tpu.predict import main as predict_main
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from tests.helpers.synthetic_run import synthetic_cfg

    cfg = synthetic_cfg(
        tmp_path,
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=1",
    )
    module = AnomalyCLIPTrainModule(cfg)
    module.fit()
    ckpt = module.save_dir / "checkpoints" / "last"
    froot = cfg["data"]["frames_root"]

    common = [
        "experiment=synthetic",
        f"data.frames_root={froot}",
        f"data.annotations_root={cfg['data']['annotations_root']}",
        f"ckpt_path={ckpt}",
    ]
    art_dir = tmp_path / "artifact"
    out = export_main(common + [f"out={art_dir}"])
    assert (out / "meta.json").is_file() and (out / "score.bin").is_file()

    video = f"{froot}/abnormal_000.npy"
    ref_json = tmp_path / "ref.json"
    predict_main(common + [f"input={video}", f"output={ref_json}"])
    art_json = tmp_path / "art.json"
    predict_main([f"artifact={art_dir}", f"input={video}", f"output={art_json}"])

    ref = json.loads(ref_json.read_text())
    got = json.loads(art_json.read_text())
    assert got["num_frames"] == ref["num_frames"]
    assert got["classnames_abnormal"] == ref["classnames_abnormal"]
    np.testing.assert_allclose(
        got["frame_scores"], ref["frame_scores"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got["frame_top_class_prob"], ref["frame_top_class_prob"], rtol=1e-4, atol=1e-5
    )
    # argmax class names can legitimately flip on frames where two class probs
    # sit within the tolerated jit-vs-export float noise (the winning probs
    # still match by the allclose above, so any flip is a near-tie). Genuine
    # pipeline divergence would flip frames wholesale: bound the rate.
    flips = sum(
        g != r for g, r in zip(got["frame_top_class"], ref["frame_top_class"])
    )
    assert flips <= max(1, len(ref["frame_top_class"]) // 50), (
        flips,
        len(ref["frame_top_class"]),
    )

    # artifact BENCHMARK eval (eval.py artifact=...) == checkpoint-backed test
    from anomalyclip_tpu.eval_entry import main as eval_main

    ckpt_metrics = module.test(ckpt_path=str(ckpt))
    art_metrics = eval_main(
        [f"artifact={art_dir}", "experiment=synthetic",
         f"data.frames_root={froot}",
         f"data.annotations_root={cfg['data']['annotations_root']}",
         f"paths.output_dir={tmp_path / 'art_eval'}"]
    )
    for key in ("auc_roc", "auc_pr", "mean_mc_auroc", "mean_mc_aupr"):
        assert abs(art_metrics[key] - ckpt_metrics[key]) < 1e-4, (
            key, art_metrics[key], ckpt_metrics[key],
        )
    assert (tmp_path / "art_eval" / "artifact_eval" / "metrics.json").is_file()


def test_predict_and_serve_artifact_mode(exported, tmp_path, monkeypatch):
    """The config-free CLI surfaces: predict artifact=... and serve artifact=...
    produce the standard predictions schema from a feature .npy."""
    import io
    import json as _json

    from anomalyclip_tpu.predict import main as predict_main
    from anomalyclip_tpu.serve import main as serve_main

    model, _, _, out = exported
    art = ServingArtifact.load(out)
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((50, model.embedding_dim)).astype(np.float32)
    npy = tmp_path / "cam.npy"
    np.save(npy, feats)
    want = art.predict(feats[None], str(npy))
    assert want["num_frames"] == 50
    assert len(want["frame_scores"]) == 50
    assert all(0.0 <= s <= 1.0 for s in want["frame_scores"])
    assert want["classnames_abnormal"] == ["alpha", "beta", "omega"]

    out_json = tmp_path / "pred.json"
    got = predict_main([f"artifact={out}", f"input={npy}", f"output={out_json}"])
    assert got == want
    assert _json.loads(out_json.read_text()) == want

    served_dir = tmp_path / "served"
    monkeypatch.setattr("sys.stdin", io.StringIO(f"{npy}\n"))
    assert serve_main([f"artifact={out}", f"output_dir={served_dir}"]) == 0
    assert _json.loads((served_dir / "cam.json").read_text()) == want
