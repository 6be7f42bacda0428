"""Group-transform parity vs the reference's delegates.

The reference's gtransforms (src/data/components/gtransforms.py) are thin loops
over torchvision/PIL per-frame ops; the rebuild is clip-level numpy. torchvision
is not installed in this environment, so the oracles are:

  * PIL itself (resize / ImageEnhance / ImageOps / HSV) — the backend the
    reference's torchvision-on-PIL calls bottom out in, plus
  * torchvision's documented size/placement formulas reconstructed inline
    (Resize short-side truncation; CenterCrop/FiveCrop int(round(margin/2)) —
    torchvision/transforms/functional.py in the reference's pinned 0.14).

Each deterministic op asserts value parity; random ops (which draw from an
explicit np.random.Generator instead of the reference's global `random`)
assert determinism-under-seed, frame coherence, and bounds.
"""

from __future__ import annotations

import numpy as np
import pytest

from anomalyclip_tpu.data import transforms as T

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageEnhance, ImageOps  # noqa: E402


def make_clip(t=3, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(t, h, w, 3), dtype=np.uint8)


def to_pil_list(clip):
    return [Image.fromarray(f) for f in clip]


def from_pil_list(imgs):
    return np.stack([np.asarray(im) for im in imgs])


def tv_resize_short_side(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(int) on PIL: short side == size, long side truncated."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        return img.resize((size, int(size * h / w)), Image.BICUBIC)
    return img.resize((int(size * w / h), size), Image.BICUBIC)


def tv_center_crop(img: Image.Image, th: int, tw: int) -> Image.Image:
    """torchvision F.center_crop placement: int(round(margin / 2))."""
    w, h = img.size
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return img.crop((left, top, left + tw, top + th))


# ---------------------------------------------------------------------------
# deterministic geometry: exact parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(96, 128), (128, 96), (100, 75), (64, 64)])
def test_group_scale_matches_torchvision_resize(hw):
    clip = make_clip(h=hw[0], w=hw[1])
    ours = T.GroupScale(64, interpolation="bicubic")(clip)
    ref = from_pil_list([tv_resize_short_side(im, 64) for im in to_pil_list(clip)])
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("hw", [(96, 128), (101, 131), (96, 131), (67, 131)])
def test_group_center_crop_matches_torchvision_placement(hw):
    # (67, 131): margins 3 and 67 — both odd, 67 % 4 == 3 hits the banker's case
    clip = make_clip(h=hw[0], w=hw[1])
    ours = T.GroupCenterCrop(64)(clip)
    ref = from_pil_list([tv_center_crop(im, 64, 64) for im in to_pil_list(clip)])
    np.testing.assert_array_equal(ours, ref)


def test_group_ten_crop_matches_torchvision_order():
    clip = make_clip(t=2, h=96, w=128)
    ours = T.GroupTenCrop(48)(clip)  # (10, T, 48, 48, 3)
    assert ours.shape == (10, 2, 48, 48, 3)

    def five(img):
        w, h = img.size
        return [
            img.crop((0, 0, 48, 48)),
            img.crop((w - 48, 0, w, 48)),
            img.crop((0, h - 48, 48, h)),
            img.crop((w - 48, h - 48, w, h)),
            tv_center_crop(img, 48, 48),
        ]

    for t, img in enumerate(to_pil_list(clip)):
        crops = five(img) + five(img.transpose(Image.FLIP_LEFT_RIGHT))
        for c, crop in enumerate(crops):
            np.testing.assert_array_equal(ours[c, t], np.asarray(crop))


def test_group_oversample_matches_reference_order():
    """Replicates gtransforms.py:105-138 crop/flip ordering with PIL crops."""
    clip = make_clip(t=2, h=80, w=112)
    ours = T.GroupOverSample(64)(clip)  # (10, 2, 64, 64, 3)
    assert ours.shape == (10, 2, 64, 64, 3)
    offsets = T.fill_fix_offset(False, 112, 80, 64, 64)
    imgs = to_pil_list(clip)
    k = 0
    for o_w, o_h in offsets:
        for flip in (False, True):
            for t, img in enumerate(imgs):
                crop = img.crop((o_w, o_h, o_w + 64, o_h + 64))
                if flip:
                    crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
                np.testing.assert_array_equal(ours[k, t], np.asarray(crop))
            k += 1


def test_group_fc_sample_shapes_and_anchors():
    clip = make_clip(t=2, h=64, w=112)
    out = T.GroupFCSample(64)(clip)
    assert out.shape == (3, 2, 64, 64, 3)
    np.testing.assert_array_equal(out[0], clip[:, :, :64])
    np.testing.assert_array_equal(out[2], clip[:, :, 48:112])


def test_loop_pad_tiles_clip():
    clip = make_clip(t=3)
    out = T.LoopPad(8)(clip)
    assert out.shape[0] == 8
    np.testing.assert_array_equal(out[:3], clip)
    np.testing.assert_array_equal(out[3:6], clip)
    np.testing.assert_array_equal(out[6:8], clip[:2])
    np.testing.assert_array_equal(T.LoopPad(2)(clip), clip)


# ---------------------------------------------------------------------------
# photometric: parity vs PIL (the reference's actual backend)
# ---------------------------------------------------------------------------


def _pil_enhance(clip, enhancer, factor):
    return from_pil_list(
        [enhancer(im).enhance(factor) for im in to_pil_list(clip)]
    ).astype(np.float32)


@pytest.mark.parametrize("factor", [0.6, 1.0, 1.4])
def test_adjust_brightness_matches_pil(factor):
    clip = make_clip()
    ours = T.adjust_brightness(clip.astype(np.float32), factor)
    ref = _pil_enhance(clip, ImageEnhance.Brightness, factor)
    # PIL blends in uint8 with per-pixel rounding
    np.testing.assert_allclose(ours, ref, atol=1.01)


@pytest.mark.parametrize("factor", [0.6, 1.4])
def test_adjust_contrast_matches_pil(factor):
    clip = make_clip(t=1)
    ours = T.adjust_contrast(clip.astype(np.float32), factor)
    ref = _pil_enhance(clip, ImageEnhance.Contrast, factor)
    # PIL rounds the gray mean to int and its per-pixel L to uint8
    np.testing.assert_allclose(ours, ref, atol=1.6)


@pytest.mark.parametrize("factor", [0.8, 1.2])
def test_adjust_saturation_matches_pil(factor):
    clip = make_clip(t=1)
    ours = T.adjust_saturation(clip.astype(np.float32), factor)
    ref = _pil_enhance(clip, ImageEnhance.Color, factor)
    np.testing.assert_allclose(ours, ref, atol=1.6)


@pytest.mark.parametrize("factor", [-0.1, 0.1, 0.35])
def test_adjust_hue_matches_pil_hsv(factor):
    """Oracle = torchvision's PIL-mode adjust_hue: uint8 HSV round-trip with
    wraparound add on H (torchvision/transforms/functional_pil.py)."""
    clip = make_clip(t=1)
    ours = T.adjust_hue(clip.astype(np.float32), factor)

    outs = []
    for im in to_pil_list(clip):
        h, s, v = im.convert("HSV").split()
        np_h = np.asarray(h, dtype=np.uint8)
        np_h = ((np_h.astype(np.int16) + int(factor * 255)) % 256).astype(np.uint8)
        ref = Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)).convert("RGB")
        outs.append(np.asarray(ref))
    ref = np.stack(outs).astype(np.float32)
    # uint8 HSV quantization vs our float HSV: compare distributionally
    assert np.mean(np.abs(ours - ref)) < 2.5
    assert np.percentile(np.abs(ours - ref), 95) < 8.0


def test_solarize_matches_pil():
    clip = make_clip()
    rng = np.random.default_rng(0)
    out = T.GroupSolarization(p=1.0)(clip, rng)
    ref = from_pil_list([ImageOps.solarize(im) for im in to_pil_list(clip)])
    np.testing.assert_array_equal(out, ref)


def test_grayscale_matches_pil_luma():
    clip = make_clip()
    rng = np.random.default_rng(0)
    out = T.GroupRandomGrayscale(p=1.0)(clip, rng)
    assert out.shape == clip.shape
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    ref = from_pil_list([im.convert("L") for im in to_pil_list(clip)])
    assert np.abs(out[..., 0].astype(np.int16) - ref.astype(np.int16)).max() <= 1


def test_gaussian_blur_reduces_variance_preserves_mean():
    clip = make_clip()
    out = T.gaussian_blur_clip(clip, sigma=1.5)
    assert out.shape == clip.shape
    assert out.std() < clip.std() * 0.7
    assert abs(float(out.mean()) - float(clip.mean())) < 2.0
    # PIL cross-check: same sigma, loose tolerance (PIL approximates the
    # Gaussian with box passes)
    from PIL import ImageFilter

    ref = from_pil_list(
        [im.filter(ImageFilter.GaussianBlur(1.5)) for im in to_pil_list(clip)]
    )
    assert np.mean(np.abs(out.astype(np.float32) - ref.astype(np.float32))) < 6.0


# ---------------------------------------------------------------------------
# random geometry: determinism under a seeded Generator + bounds
# ---------------------------------------------------------------------------


def test_random_crop_shared_across_frames_and_seeded():
    clip = make_clip()
    a = T.GroupRandomCrop(64)(clip, np.random.default_rng(7))
    b = T.GroupRandomCrop(64)(clip, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 64, 64, 3)
    # one shared window: find frame 0's window in the source, frame 1 must match
    found = False
    for top in range(clip.shape[1] - 64 + 1):
        for left in range(clip.shape[2] - 64 + 1):
            if (clip[0, top : top + 64, left : left + 64] == a[0]).all():
                np.testing.assert_array_equal(
                    clip[1, top : top + 64, left : left + 64], a[1]
                )
                found = True
                break
        if found:
            break
    assert found


def test_random_flip_prob_and_coherence():
    clip = make_clip()
    flipped = T.GroupRandomHorizontalFlip(p=1.0)(clip, np.random.default_rng(0))
    np.testing.assert_array_equal(flipped, clip[:, :, ::-1])
    same = T.GroupRandomHorizontalFlip(p=0.0)(clip, np.random.default_rng(0))
    np.testing.assert_array_equal(same, clip)


def test_multi_scale_crop_output_size():
    clip = make_clip(h=120, w=160)
    for seed in range(5):
        out = T.GroupMultiScaleCrop(64)(clip, np.random.default_rng(seed))
        assert out.shape == (3, 64, 64, 3)


def test_random_sized_crop_output_size():
    clip = make_clip(h=120, w=160)
    for seed in range(5):
        out = T.GroupRandomSizedCrop(64)(clip, np.random.default_rng(seed))
        assert out.shape == (3, 64, 64, 3)


def test_color_jitter_deterministic_under_seed_and_bounded():
    clip = make_clip()
    a = T.GroupRandomColorJitter(p=1.0)(clip, np.random.default_rng(3))
    b = T.GroupRandomColorJitter(p=1.0)(clip, np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == clip.dtype and a.shape == clip.shape
    assert not np.array_equal(a, clip)


# ---------------------------------------------------------------------------
# pipeline: get_augmentations parity with the shipped preprocess
# ---------------------------------------------------------------------------


def test_get_augmentations_matches_preprocess_frame():
    """The ncrops=1 pipeline must equal data/sources.py:preprocess_frame (the
    production frames path, reference: src/utils/augmentations.py:21-34)."""
    from anomalyclip_tpu.data.sources import preprocess_frame

    clip = make_clip(t=2, h=100, w=150)
    out = T.get_augmentations(64)(clip)
    ref = np.stack(
        [preprocess_frame(Image.fromarray(f), input_size=64) for f in clip]
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_get_augmentations_ten_crop_shape():
    clip = make_clip(t=2, h=100, w=150)
    out = T.get_augmentations(64, ncrops=10)(clip)
    assert out.shape == (10, 2, 64, 64, 3)
    assert out.dtype == np.float32
    with pytest.raises(ValueError):
        T.get_augmentations(64, ncrops=5)


def test_spatial_only_ten_crop_is_bit_identical_after_normalize():
    """The uint8 ingest contract for the 10-crop path: the spatial-only
    pipeline (normalize=False) emits uint8 crops, and applying the shared
    normalize arithmetic (sources.normalize_frames == the on-device
    normalize_frames_on_device) reproduces the normalized float32 pipeline
    BIT-identically — so 10-crop scores are unchanged while the host ships
    1/4 the bytes."""
    from anomalyclip_tpu.data.sources import normalize_frames

    clip = make_clip(t=3, h=100, w=150)
    u8 = T.get_augmentations(64, ncrops=10, normalize=False)(clip)
    assert u8.dtype == np.uint8 and u8.shape == (10, 3, 64, 64, 3)
    f32 = T.get_augmentations(64, ncrops=10)(clip)
    np.testing.assert_array_equal(normalize_frames(u8), f32)
    # and for the single-crop pipeline too (same contract)
    u8_1 = T.get_augmentations(64, normalize=False)(clip)
    assert u8_1.dtype == np.uint8
    np.testing.assert_array_equal(
        normalize_frames(u8_1), T.get_augmentations(64)(clip)
    )


def test_frame_source_ten_crop_gather(tmp_path):
    """FrameSource(ncrops=10) produces (10, T, s, s, 3); the center-normal crop
    (index 8 in GroupOverSample's offset-major order) equals the ncrops=1
    pipeline when the post-scale margin is a multiple of 4 (where the anchor
    grid's center coincides with torchvision's center crop)."""
    from anomalyclip_tpu.data.records import VideoRecord
    from anomalyclip_tpu.data.sources import FrameSource

    vdir = tmp_path / "vid"
    vdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 4):
        Image.fromarray(
            rng.integers(0, 256, size=(100, 150, 3), dtype=np.uint8)
        ).save(vdir / f"{i:06d}.jpg", quality=95)
    rec = VideoRecord(
        rel_path="vid", start_frame=1, end_frame=3, label=0, root=str(tmp_path)
    )

    multi = FrameSource(input_size=64, ncrops=10)
    single = FrameSource(input_size=64, ncrops=1)
    idx = np.array([0, 1, 2])
    out10 = multi.gather(rec, idx)
    out1 = single.gather(rec, idx)
    assert out10.shape == (10, 3, 64, 64, 3)
    assert out1.shape == (1, 3, 64, 64, 3)
    # BOTH paths emit spatial uint8 (the device normalizes in-graph): the
    # 10-crop path ships 10x the frames per video, so it is exactly where the
    # 4x byte saving matters most
    assert out1.dtype == np.uint8 and out10.dtype == np.uint8
    # 150x100 -> scale short side 64 -> 96x64; margin 32 % 4 == 0, so the
    # center-normal crop coincides with the torchvision center crop exactly
    np.testing.assert_array_equal(out10[8], out1[0])
    with pytest.raises(ValueError):
        FrameSource(input_size=64, ncrops=5)


def test_compose_threads_rng_only_to_random_transforms():
    clip = make_clip()
    pipe = T.Compose(
        [
            T.GroupScale(72),
            T.GroupRandomCrop(64),
            T.GroupRandomHorizontalFlip(),
            T.GroupToFloat(),
            T.GroupNormalize(),
        ]
    )
    a = pipe(clip, np.random.default_rng(11))
    b = pipe(clip, np.random.default_rng(11))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32 and a.shape == (3, 64, 64, 3)
