"""Feature-extraction CLI: frames -> .npy files that the feature path consumes.

The reference recommends pre-extracted CLIP features but ships no extractor
(reference: README.md:64-70); this pins the rebuild's extractor to the exact
file layout FeatureSource expects (feature_dataset.py:326-349) and to the same
numerics as the in-training frame encoder.
"""

from __future__ import annotations

import numpy as np
import pytest

from PIL import Image


@pytest.fixture()
def frames_corpus(tmp_path):
    """Two videos of 32x32 frames (tiny-CLIP resolution) + an annotation file."""
    rng = np.random.default_rng(0)
    froot = tmp_path / "frames"
    lengths = {"vid_a": 7, "vid_b": 5}
    for name, n in lengths.items():
        vdir = froot / name
        vdir.mkdir(parents=True)
        for i in range(1, n + 1):
            Image.fromarray(
                rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
            ).save(vdir / f"{i:06d}.jpg", quality=95)
    ann = tmp_path / "ann.txt"
    ann.write_text("vid_a 1 7 0\nvid_b 1 5 1\n")
    return froot, ann, lengths


def test_extract_matches_direct_encode(tmp_path, frames_corpus):
    froot, ann, lengths = frames_corpus
    from anomalyclip_tpu.data.records import VideoRecord
    from anomalyclip_tpu.data.sources import FeatureSource, FrameSource
    from anomalyclip_tpu.extract_features import main

    out = tmp_path / "features"
    rc = main(
        [
            "--frames-root", str(froot),
            "--out-root", str(out),
            "--annotations", str(ann),
            "--clip-init", "random",
            "--dtype", "float32",
            "--batch", "4",
        ]
    )
    assert rc == 0

    # oracle: FrameSource preprocessing + the same jitted encoder
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import encode_image
    from anomalyclip_tpu.models.clip.registry import resolve_clip

    params, cfg = resolve_clip(clip_init="random")

    @jax.jit
    def enc(frames):
        return encode_image(params, cfg, frames, compute_dtype=jnp.float32)

    src = FrameSource(input_size=cfg.image_resolution)
    for name, n in lengths.items():
        feats = np.load(out / f"{name}.npy")
        assert feats.shape == (n, cfg.embed_dim)
        rec = VideoRecord(
            rel_path=name, start_frame=1, end_frame=n, label=0, root=str(froot)
        )
        frames = src.gather(rec, np.arange(n))[0]
        want = np.asarray(enc(jnp.asarray(frames)))
        np.testing.assert_allclose(feats, want, rtol=2e-4, atol=2e-4)

        # and the files load through the feature path
        fsrc = FeatureSource(ncrops=1)
        frec = VideoRecord(
            rel_path=name, start_frame=1, end_frame=n, label=0, root=str(out)
        )
        loaded = fsrc.load_video(frec)
        assert loaded.shape == (n, 1, cfg.embed_dim)


def test_extract_ten_crop_layout(tmp_path, frames_corpus):
    froot, ann, _ = frames_corpus
    from anomalyclip_tpu.data.records import VideoRecord
    from anomalyclip_tpu.data.sources import FeatureSource
    from anomalyclip_tpu.extract_features import main

    out = tmp_path / "features10"
    rc = main(
        [
            "--frames-root", str(froot),
            "--out-root", str(out),
            "--annotations", str(ann),
            "--clip-init", "random",
            "--ncrops", "10",
            "--dtype", "float32",
            "--batch", "8",
        ]
    )
    assert rc == 0
    feats = np.load(out / "vid_a.npy")
    assert feats.shape[0] == 7 and feats.shape[1] == 10
    # FeatureSource's reshape(-1, ncrops, D) reproduces (T, ncrops, D) exactly
    fsrc = FeatureSource(ncrops=10)
    rec = VideoRecord(rel_path="vid_a", start_frame=1, end_frame=7, label=0, root=str(out))
    loaded = fsrc.load_video(rec)
    np.testing.assert_allclose(loaded, feats.astype(np.float32))


def test_extract_discovers_videos_without_annotations(tmp_path, frames_corpus):
    froot, _, lengths = frames_corpus
    from anomalyclip_tpu.extract_features import main

    out = tmp_path / "features_auto"
    rc = main(
        [
            "--frames-root", str(froot),
            "--out-root", str(out),
            "--clip-init", "random",
            "--dtype", "float32",
        ]
    )
    assert rc == 0
    for name, n in lengths.items():
        assert np.load(out / f"{name}.npy").shape[0] == n

    # skip-existing honored: a re-run must not rewrite any file
    mtimes = {name: (out / f"{name}.npy").stat().st_mtime_ns for name in lengths}
    rc = main(
        [
            "--frames-root", str(froot), "--out-root", str(out),
            "--clip-init", "random", "--dtype", "float32",
        ]
    )
    assert rc == 0
    for name in lengths:
        assert (out / f"{name}.npy").stat().st_mtime_ns == mtimes[name]

    # --overwrite forces re-extraction (every file rewritten)
    rc = main(
        [
            "--frames-root", str(froot), "--out-root", str(out),
            "--clip-init", "random", "--dtype", "float32", "--overwrite",
        ]
    )
    assert rc == 0
    for name in lengths:
        assert (out / f"{name}.npy").stat().st_mtime_ns != mtimes[name]
