"""Data pipeline parity: sampling + test items vs the reference VideoFrameDataset."""

import sys
import types

import numpy as np
import pytest

from anomalyclip_tpu.data.dataset import SamplingConfig, VideoDataset
from anomalyclip_tpu.data.loader import DualStreamTrainLoader, TrainBatch
from anomalyclip_tpu.data.sampling import train_start_indices
from anomalyclip_tpu.data.sampling import test_start_indices as covering_start_indices
from anomalyclip_tpu.data.sources import FeatureSource
from anomalyclip_tpu.data.synthetic import generate_synthetic_dataset
from tests.helpers.reference_oracle import load_reference_module, reference_available

# only the oracle-parity tests need the reference checkout; loader semantics,
# sampling properties, and fast-decode parity must run everywhere
needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

N, L, STRIDE = 4, 3, 1
NORMAL_ID = 3
NUM_CLASSES = 6


@pytest.fixture(scope="module")
def synthetic_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    frames = root / "features"
    annos = root / "annotations"
    generate_synthetic_dataset(
        frames,
        annos,
        num_normal=3,
        num_abnormal=3,
        num_test=4,
        num_classes=NUM_CLASSES,
        normal_id=NORMAL_ID,
        feature_dim=16,
        min_frames=50,
        max_frames=90,
        seed=7,
    )
    return frames, annos


@pytest.fixture(scope="module")
def oracle_dataset_cls():
    # feature_dataset imports `from src import utils`; stub the logger accessor
    src_pkg = types.ModuleType("src")
    utils_mod = types.ModuleType("src.utils")

    class _Log:
        def __getattr__(self, name):
            return lambda *a, **k: None

    utils_mod.get_pylogger = lambda name=None: _Log()
    src_pkg.utils = utils_mod
    sys.modules.setdefault("src", src_pkg)
    sys.modules.setdefault("src.utils", utils_mod)
    mod = load_reference_module(
        "src/data/components/feature_dataset.py", "_ref_feature_dataset"
    )
    return mod.VideoFrameDataset


@needs_reference
def test_test_items_match_reference_exactly(synthetic_dirs, oracle_dataset_cls):
    frames, annos = synthetic_dirs
    oracle = oracle_dataset_cls(
        root_path=str(frames),
        annotationfile_path=str(annos / "Anomaly_Test.txt"),
        normal_id=NORMAL_ID,
        num_segments=N,
        frames_per_segment=L,
        test_mode=True,
        ncrops=1,
        temporal_annotation_file=str(
            annos / "Temporal_Anomaly_Annotation_for_Testing_Videos.txt"
        ),
        labels_file=None,
        stride=STRIDE,
    )
    ours = VideoDataset(
        annotation_file=str(annos / "Anomaly_Test.txt"),
        root=str(frames),
        normal_id=NORMAL_ID,
        sampling=SamplingConfig(num_segments=N, frames_per_segment=L, stride=STRIDE),
        source=FeatureSource(ncrops=1),
        test_mode=True,
        temporal_annotation_file=str(
            annos / "Temporal_Anomaly_Annotation_for_Testing_Videos.txt"
        ),
    )
    assert len(oracle) == len(ours)
    for i in range(len(ours)):
        want_feats, want_labels, want_video_label, want_seg, want_path = oracle[i]
        got = ours.test_item(i)
        np.testing.assert_array_equal(got.features, want_feats.numpy())
        np.testing.assert_array_equal(got.frame_labels, want_labels)
        assert got.video_label == want_video_label
        assert got.segment_size == want_seg
        assert got.path == want_path


@needs_reference
def test_train_start_indices_formula_matches(oracle_dataset_cls, synthetic_dirs):
    """With jitter pinned to zero, our train sampling grid equals the reference's."""
    frames, annos = synthetic_dirs
    oracle = oracle_dataset_cls(
        root_path=str(frames),
        annotationfile_path=str(annos / "Anomaly_Train_Normal.txt"),
        normal_id=NORMAL_ID,
        num_segments=N,
        frames_per_segment=L,
        ncrops=1,
        stride=STRIDE,
    )

    class _FixedRng:
        def integers(self, low, high=None, size=None):
            return np.zeros(size, dtype=np.int64)

    record = oracle.video_list[0]
    old_randint = np.random.randint
    try:
        np.random.randint = lambda high, size=None: np.zeros(size, dtype=np.int64)
        want = oracle._get_start_indices(record)
    finally:
        np.random.randint = old_randint

    got = train_start_indices(record.num_frames, N, L, STRIDE, _FixedRng())
    np.testing.assert_array_equal(got, want)

    # long-video branch
    long_frames = N * L * STRIDE * 5 + 17

    class _Rec:
        num_frames = long_frames

    try:
        np.random.randint = lambda high, size=None: np.zeros(size, dtype=np.int64)
        want_long = oracle._get_start_indices(_Rec())
    finally:
        np.random.randint = old_randint
    got_long = train_start_indices(long_frames, N, L, STRIDE, _FixedRng())
    np.testing.assert_array_equal(got_long, want_long)


def test_test_start_indices_padding_properties():
    starts, seg = covering_start_indices(100, N, L, STRIDE)
    chunk = L * STRIDE
    assert len(starts) % N == 0
    assert len(starts) * chunk >= 100
    assert len(starts) * chunk - 100 < N * chunk
    assert seg == len(starts) // N
    np.testing.assert_array_equal(np.diff(starts), chunk)


def test_train_item_jitter_stays_in_segment(synthetic_dirs):
    frames, annos = synthetic_dirs
    rng = np.random.default_rng(0)
    for t in [37, 48, 100, 1000]:
        starts = train_start_indices(t, N, L, STRIDE, rng)
        lower = N * L * STRIDE
        dist = (max(t, lower) - L + 1) // N
        base = np.arange(N) * dist
        assert (starts >= base).all()
        assert (starts <= base + dist - L + 1).all()


def test_dual_stream_loader_shapes_and_halving(synthetic_dirs):
    frames, annos = synthetic_dirs
    sampling = SamplingConfig(num_segments=N, frames_per_segment=L, stride=STRIDE)

    def make(path):
        return VideoDataset(
            annotation_file=str(annos / path),
            root=str(frames),
            normal_id=NORMAL_ID,
            sampling=sampling,
            source=FeatureSource(ncrops=1),
        )

    loader = DualStreamTrainLoader(
        normal=make("Anomaly_Train_Normal.txt"),
        abnormal=make("Anomaly_Train_Abnormal.txt"),
        batch_size=4,
        seed=0,
        num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 1  # 3 videos per stream, half=2 -> 1 batch
    batch = batches[0]
    assert batch.abnormal_features.shape == (2, 1, N * L, 16)
    assert batch.normal_features.shape == (2, 1, N * L, 16)
    assert (batch.normal_labels == NORMAL_ID).all()
    assert (batch.abnormal_labels != NORMAL_ID).all()

    # epochs reshuffle deterministically
    loader.set_epoch(1)
    b1 = list(loader)[0]
    loader.set_epoch(1)
    b1_again = list(loader)[0]
    np.testing.assert_array_equal(b1.abnormal_features, b1_again.abnormal_features)
    loader.close()


def test_dual_stream_loader_rank_blocks_assemble_global_batch(synthetic_dirs):
    """The per-rank ingest contract (multi-host fit): each rank's loader yields
    exactly rows [p*half/P, (p+1)*half/P) of the single-process global batch,
    BIT-IDENTICAL — concatenating the rank blocks reproduces the global arrays,
    so make_array_from_process_local_data assembly (parallel/mesh.py
    shard_train_batch) can never silently permute or corrupt shards."""
    frames, annos = synthetic_dirs
    sampling = SamplingConfig(num_segments=N, frames_per_segment=L, stride=STRIDE)

    def make(path):
        return VideoDataset(
            annotation_file=str(annos / path),
            root=str(frames),
            normal_id=NORMAL_ID,
            sampling=sampling,
            source=FeatureSource(ncrops=1),
        )

    def loader_for(p, count):
        return DualStreamTrainLoader(
            normal=make("Anomaly_Train_Normal.txt"),
            abnormal=make("Anomaly_Train_Abnormal.txt"),
            batch_size=4,
            seed=7,
            num_workers=2,
            process_index=p,
            process_count=count,
        )

    for epoch in (0, 1):
        g_loader = loader_for(0, 1)
        g_loader.set_epoch(epoch)
        rank_loaders = [loader_for(p, 2) for p in (0, 1)]
        for rl in rank_loaders:
            rl.set_epoch(epoch)
        try:
            for gb, b0, b1 in zip(g_loader, *rank_loaders):
                for field in TrainBatch._fields:
                    want = getattr(gb, field)
                    got = np.concatenate(
                        [getattr(b0, field), getattr(b1, field)], axis=0
                    )
                    np.testing.assert_array_equal(got, want, err_msg=field)
                assert getattr(b0, "abnormal_features").shape[0] == 1  # half/P
        finally:
            g_loader.close()
            for rl in rank_loaders:
                rl.close()

    with pytest.raises(ValueError):
        loader_for(0, 3)  # half=2 does not divide over 3 ranks


def test_sequential_test_loader_shard_strides(synthetic_dirs):
    """Per-rank eval sharding: rank strides partition the (limited) video list
    and global_indices() exposes the reassembly order."""
    frames, annos = synthetic_dirs
    sampling = SamplingConfig(num_segments=N, frames_per_segment=L, stride=STRIDE)
    ds = VideoDataset(
        annotation_file=str(annos / "Anomaly_Test.txt"),
        root=str(frames),
        normal_id=NORMAL_ID,
        sampling=sampling,
        source=FeatureSource(ncrops=1),
        test_mode=True,
        temporal_annotation_file=str(
            annos / "Temporal_Anomaly_Annotation_for_Testing_Videos.txt"
        ),
    )
    from anomalyclip_tpu.data.loader import SequentialTestLoader

    full = SequentialTestLoader(ds)
    n = len(full)
    sharded = [SequentialTestLoader(ds, shard=(p, 2)) for p in (0, 1)]
    assert sum(len(s) for s in sharded) == n
    seen = sorted(
        i for s in sharded for i in s.global_indices()
    )
    assert seen == list(range(n))
    paths = [item.path for item in sharded[0]]
    want = [ds.test_item(i).path for i in sharded[0].global_indices()]
    assert paths == want


def test_fast_decode_matches_pil_preprocessing(tmp_path):
    """cv2 fast-decode path vs the parity (PIL/torchvision-bicubic) path: same
    shape/normalization, near-identical values on natural-image content."""
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from anomalyclip_tpu.data.sources import preprocess_frame, preprocess_frame_cv2

    x, y = np.meshgrid(np.linspace(0, 1, 640), np.linspace(0, 1, 360))
    img = np.stack([np.sin(6 * x) * 0.5 + 0.5, y, x * y], -1)
    path = tmp_path / "f.jpg"
    cv2.imwrite(str(path), cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))

    with Image.open(path) as im:
        want = preprocess_frame(im)
    got = preprocess_frame_cv2(str(path))
    assert got.shape == want.shape == (224, 224, 3)
    assert np.abs(got - want).mean() < 0.01  # normalized units


def test_dual_stream_loader_max_size_cycle(synthetic_dirs):
    """Epoch length is the LONGER stream's batch count; the shorter stream
    cycles with a reshuffle on wrap (Lightning 1.8 max_size_cycle for a list of
    train loaders, the reference's configuration — min-length zip would run
    ~3x fewer optimizer steps on ShanghaiTech-scale imbalance)."""
    frames, annos = synthetic_dirs
    sampling = SamplingConfig(num_segments=N, frames_per_segment=L, stride=STRIDE)

    def make(path):
        return VideoDataset(
            annotation_file=str(annos / path),
            root=str(frames),
            normal_id=NORMAL_ID,
            sampling=sampling,
            source=FeatureSource(ncrops=1),
        )

    # half=1: 3 videos per stream -> 3 batches each; simulate imbalance by
    # restricting the abnormal stream to 1 record
    abnormal = make("Anomaly_Train_Abnormal.txt")
    abnormal.records = abnormal.records[:1]
    loader = DualStreamTrainLoader(
        normal=make("Anomaly_Train_Normal.txt"),
        abnormal=abnormal,
        batch_size=2,
        seed=0,
        num_workers=2,
    )
    assert len(loader) == 3  # max(3 normal, 1 abnormal)
    batches = list(loader)
    assert len(batches) == 3
    # the shorter stream cycled: every abnormal half is the same single video
    for b in batches:
        assert (b.abnormal_labels != NORMAL_ID).all()
    # the longer stream covered all of its videos exactly once
    normals = np.concatenate([b.normal_features for b in batches])
    assert len(np.unique(normals.round(5), axis=0)) == 3
    loader.close()


def test_synthetic_regenerates_on_param_change(tmp_path):
    """Generating under different parameters against the same root must fully
    regenerate: a stale mix (old-length .npy files with new annotations) made
    label/score lengths diverge and crashed deep inside the metrics."""
    froot, aroot = tmp_path / "features", tmp_path / "annotations"

    def check_consistent():
        for line in (aroot / "Anomaly_Test.txt").read_text().strip().split("\n"):
            rel, start, end = line.split()[:3]
            n_ann = int(end) - int(start) + 1
            n_npy = np.load(froot / f"{rel}.npy").shape[0]
            assert n_npy == n_ann, (rel, n_ann, n_npy)

    common = dict(num_normal=2, num_abnormal=2, num_test=2, num_classes=6,
                  normal_id=NORMAL_ID, feature_dim=8, seed=3)
    generate_synthetic_dataset(froot, aroot, min_frames=80, max_frames=120, **common)
    check_consistent()
    # same params: second call is a no-op (stamp matches)
    stamp = (aroot / ".synthetic_ok").read_text()
    generate_synthetic_dataset(froot, aroot, min_frames=80, max_frames=120, **common)
    assert (aroot / ".synthetic_ok").read_text() == stamp
    # different params: everything regenerates consistently
    generate_synthetic_dataset(froot, aroot, min_frames=40, max_frames=60, **common)
    check_consistent()
    for line in (aroot / "Anomaly_Test.txt").read_text().strip().split("\n"):
        rel, start, end = line.split()[:3]
        assert int(end) - int(start) + 1 <= 60
