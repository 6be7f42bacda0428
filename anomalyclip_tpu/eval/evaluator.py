"""Per-video test-time scoring with grid batching and shape bucketing.

The reference scores each variable-length test video with a dynamically shaped
forward (reference: anomaly_clip.py:117-154; test items are padded to
``segment_size`` 32x16 chunks, feature_dataset.py:252-259). Under jit that would
recompile per video length. TPU-first restructuring:

- the host rearranges the flat (n, s, l) frame stream into ``s`` independent
  (num_segments x seg_length) grids — the axial transformer treats each grid
  independently at test time (temporal_model.py:46-53), so this is exact;
- the grid batch is padded up to a small set of static bucket sizes, giving a
  handful of compilations for an entire dataset;
- padded grids produce garbage scores that are sliced off before the inverse
  layout; real-frame outputs are bit-identical to the unbucketed forward because
  every per-frame op (selector, BN-eval, head) and every grid is independent.

Equivalence with the reference-layout forward is asserted in
tests/test_model_forward.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anomalyclip_tpu.data.dataset import TestItem
from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP
from anomalyclip_tpu.models.clip.model import matmul_precision_for
from anomalyclip_tpu.models.selector import BNState, selector_test
from anomalyclip_tpu.models.temporal import temporal_scores


def bucket_size(g: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if g <= b:
            return b
    # beyond the largest bucket, round up to a multiple of it
    top = buckets[-1]
    return ((g + top - 1) // top) * top


DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def pad_to_bucket(
    grids: np.ndarray, buckets: Tuple[int, ...] = DEFAULT_BUCKETS
) -> Tuple[np.ndarray, int]:
    """Zero-pad the grid batch up to its bucket size -> (padded grids, true g).
    Shared by GridScorer and the exported ServingArtifact so both serve a whole
    dataset with a handful of compilations instead of one per video length."""
    g = grids.shape[0]
    gb = bucket_size(g, buckets)
    if gb != g:
        pad = np.zeros((gb - g,) + grids.shape[1:], dtype=grids.dtype)
        grids = np.concatenate([grids, pad], axis=0)
    return grids, g

# one static shape for every chunked frame-encoding pass; MUST be the model's
# own chunk so encode_frames sees exactly one lax.map dispatch per host chunk
ENCODE_CHUNK = AnomalyCLIP.ENCODE_CHUNK


def encode_frames_chunked(
    encode_jit, frozen, frames: np.ndarray, chunk: int = ENCODE_CHUNK
) -> np.ndarray:
    """Shared chunked CLIP frame encoding with one static chunk shape (one TPU
    compile serves the ncentroid pass and the test path alike).

    uint8 input flows to the device AS uint8 — every encoder normalizes it
    in-graph (models/clip/model.py:normalize_frames_on_device), so the
    host->device transfer carries 1/4 the float32 bytes and long videos
    (predict.py's decode path) sit in RAM at 1/4 the cost. Callers whose
    compiled graph predates the uint8 input contract (the exported serving
    artifact's float32 encode spec) set ``encode_jit._host_normalize_uint8``
    and get the old host-side normalize."""
    from anomalyclip_tpu.data.sources import normalize_frames

    host_normalize = getattr(encode_jit, "_host_normalize_uint8", False)
    outs = []
    for i in range(0, len(frames), chunk):
        part = frames[i : i + chunk]
        if part.dtype == np.uint8 and host_normalize:
            part = normalize_frames(part)
        # pad unconditionally: every call sees the same (chunk, H, W, 3) shape,
        # so the encoder compiles exactly once across all video lengths
        pad = chunk - len(part)
        if pad:
            part = np.concatenate([part, np.repeat(part[:1], pad, axis=0)])
        # pass the HOST array: a DP-sharded encode_jit device_puts each shard
        # straight to its chip (jnp.asarray here would stage on device 0)
        out = np.asarray(encode_jit(frozen, part))
        outs.append(out[: len(out) - pad] if pad else out)
    return np.concatenate(outs)


class GridScorer:
    """Jit-compiled scoring of a batch of (n, l, D) grids.

    Parameters (text features, temporal weights, BN stats, ncentroid) are jit
    *arguments*, not closed-over constants: the compiled ``score`` executable — one
    per bucket size — is reused across epochs. ``update()`` swaps in new params
    (recomputing text features once) without triggering any recompilation; the
    per-epoch validation loop of the reference (anomaly_clip_module.py:301-337)
    therefore compiles only on the first epoch.
    """

    def __init__(
        self,
        model: AnomalyCLIP,
        frozen=None,
        trainable=None,
        bn_state: Optional[BNState] = None,
        ncentroid=None,
        buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
        encode_jit=None,
        mesh=None,
    ):
        """``mesh``: an optional >1-device single-process data mesh. Every
        per-frame op and every grid is independent, so scoring is
        embarrassingly data-parallel: the score program is wrapped in
        ``shard_map`` over the data axis — each chip runs the complete
        (Pallas kernels included) program on its local grid shard, with zero
        collectives and no SPMD-partitioner involvement — and validation on
        an N-chip host scores N grids at once instead of idling N-1 chips.
        Buckets are rounded up to mesh multiples so the shard always divides;
        parity with the single-device result is pinned in
        tests/test_multidevice.py and the driver dryrun. Multi-host meshes
        are not supported here (callers pass mesh=None there: outputs must be
        fully addressable for the host-side layout inversion)."""
        self.model = model
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            n_dev = self.mesh.size
            buckets = tuple(sorted({-(-b // n_dev) * n_dev for b in buckets}))
        self.buckets = buckets
        self._text_fn = jax.jit(model.text_features)
        self._encode_jit = encode_jit  # optionally shared by the caller

        def score(
            text_features, temporal_params, bn_state, ncentroid, grids
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
            """grids: (G, n, l, D) -> (similarity (G*n*l, C-1), scores (G*n*l,))"""
            cfg = model.cfg
            with matmul_precision_for(cfg.dtype):
                flat = grids.reshape(-1, grids.shape[-1])
                similarity = selector_test(
                    flat, text_features, ncentroid, bn_state, model.selector_cfg
                )
                features = model._temporal_input(flat, similarity, ncentroid)
                scores = temporal_scores(
                    features,
                    temporal_params,
                    model.temporal_cfg,
                    segment_size=1,
                    test_mode=False,  # each grid is one (n, l) block: train layout
                ).reshape(-1)
                return similarity, scores

        if self.mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from anomalyclip_tpu.parallel.mesh import DATA_AXIS

            score = shard_map(
                score,
                mesh=self.mesh,
                in_specs=(P(), P(), P(), P(), P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            )
        self._score = jax.jit(score)
        if trainable is not None:
            self.update(frozen, trainable, bn_state, ncentroid)

    def update(self, frozen, trainable, bn_state: BNState, ncentroid) -> "GridScorer":
        """Swap in new parameters (no recompilation).

        Text features are computed from a text-subtree view of ``frozen``: the
        visual tower must never be committed to the default device here — with
        host-numpy frozen params (train/module.py) that would re-upload the
        full tower every epoch, and under tensor-parallel serving it would put
        the full unsharded tower on device 0, defeating TP capacity."""
        text_view = {"clip": {"text": frozen["clip"]["text"]}}
        self.text_features = self._text_fn(text_view, trainable)
        self._frozen = frozen
        self._temporal = trainable["temporal"]
        self._bn_state = bn_state
        self._ncentroid = jnp.asarray(ncentroid)
        if self.mesh is not None:
            # replicate the (small) score params over the mesh so the sharded
            # grid batch composes with them without any implicit reshuffle
            from anomalyclip_tpu.parallel.mesh import replicate

            self.text_features = replicate(self.text_features, self.mesh)
            self._temporal = replicate(self._temporal, self.mesh)
            self._bn_state = replicate(self._bn_state, self.mesh)
            self._ncentroid = replicate(self._ncentroid, self.mesh)
        return self

    def encode_frames_np(self, frames: np.ndarray) -> np.ndarray:
        """CLIP-encode raw frames (N, H, W, 3) -> (N, D) in static-shape chunks
        (the from-frames test path, reference anomaly_clip.py:118-131)."""
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.model.encode_frames)
        return encode_frames_chunked(self._encode_jit, self._frozen, frames)

    def score_grids(self, grids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Pad the grid batch to a bucket, score, trim."""
        grids, g = pad_to_bucket(grids, self.buckets)
        if self.mesh is not None:
            # device_put the HOST array: each shard transfers straight to its
            # device (staging through jnp.asarray would copy the whole batch
            # to device 0 first, then reshard)
            from anomalyclip_tpu.parallel.mesh import batch_sharding

            grids_dev = jax.device_put(np.asarray(grids), batch_sharding(self.mesh))
        else:
            grids_dev = jnp.asarray(grids)
        similarity, scores = self._score(
            self.text_features,
            self._temporal,
            self._bn_state,
            self._ncentroid,
            grids_dev,
        )
        n_l = grids.shape[1] * grids.shape[2]
        return (
            np.asarray(similarity)[: g * n_l],
            np.asarray(scores)[: g * n_l],
        )


@dataclasses.dataclass
class VideoScores:
    similarity: np.ndarray  # (T, C-1) frame-rate, trimmed to true length
    scores: np.ndarray  # (T,)
    class_probs: np.ndarray  # (T, C-1) softmax(similarity) * scores
    frame_labels: np.ndarray  # (T,)
    video_label: int
    path: str
    start_frame: int = 0  # file id of score index 0 (visualizer frame lookup)


def score_sampled_features(
    feats: np.ndarray,
    segment_size: int,
    num_segments: int,
    seg_length: int,
    stride: int,
    num_labels: int,
    score_grids: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The pure host-side half of per-video scoring: grid layout, crop
    consensus, stride expansion, trim, softmax. ``feats`` is (ncrops, n*s*l, D)
    test-sampled features; ``score_grids`` maps (G, n, l, D) -> the flat
    (similarity (G*n*l, C-1), scores (G*n*l,)) device outputs. Shared by
    `score_video` (GridScorer buckets) and the exported `ServingArtifact`
    (shape-polymorphic graph) so both produce identical outputs by
    construction. Returns (similarity (T, C-1), scores (T,), class_probs)."""
    ncrops, t, d = feats.shape
    n, l, s = num_segments, seg_length, segment_size
    assert t == n * s * l, (t, n, s, l)

    # (ncrops, n, s, l, D) -> (ncrops*s, n, l, D): grids in (crop-major, s) order
    grids = (
        feats.reshape(ncrops, n, s, l, d).transpose(0, 2, 1, 3, 4).reshape(ncrops * s, n, l, d)
    )
    similarity, scores = score_grids(grids)

    # invert to the reference's flat (ncrops, n, s, l) frame order
    c_abn = similarity.shape[-1]
    sim = (
        similarity.reshape(ncrops, s, n, l, c_abn)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ncrops, t, c_abn)
    )
    sc = scores.reshape(ncrops, s, n, l).transpose(0, 2, 1, 3).reshape(ncrops, t)
    # multicrop consensus: average per-frame outputs over crops (TSN-style).
    # The reference flattens crop-major and trims to num_labels, silently
    # keeping only crop 0 (anomaly_clip_module.py:473-482 never sees ncrops>1 —
    # its configs are all ncrops=1); averaging is what makes the 10-crop path
    # this rebuild wires up actually mean something. ncrops=1 is the identity.
    sim = sim.mean(axis=0)
    sc = sc.mean(axis=0)

    # frame-rate expansion by stride (anomaly_clip.py:149-152), then trim
    # padding (anomaly_clip_module.py:479-483)
    sim = np.repeat(sim, stride, axis=0)[:num_labels]
    sc = np.repeat(sc, stride, axis=0)[:num_labels]

    # softmax over classes, joint probs (anomaly_clip_module.py:473-482)
    e = np.exp(sim - sim.max(axis=1, keepdims=True))
    class_probs = (e / e.sum(axis=1, keepdims=True)) * sc[:, None]
    return sim, sc, class_probs


def score_video(item: TestItem, scorer: GridScorer, model: AnomalyCLIP) -> VideoScores:
    """Score one test video, reproducing the reference's output exactly
    (anomaly_clip.py:117-154 + the trim in anomaly_clip_module.py:479-483)."""
    cfg = model.cfg
    feats = item.features  # (ncrops, n*s*l, D) or frames (ncrops, n*s*l, H, W, 3)
    if feats.ndim == 5:
        ncrops, t = feats.shape[:2]
        flat = feats.reshape((-1,) + feats.shape[2:])
        feats = scorer.encode_frames_np(flat).reshape(ncrops, t, -1)

    sim, sc, class_probs = score_sampled_features(
        feats,
        item.segment_size,
        cfg.num_segments,
        cfg.seg_length,
        cfg.stride,
        len(item.frame_labels),
        scorer.score_grids,
    )

    return VideoScores(
        similarity=sim,
        scores=sc,
        class_probs=class_probs,
        frame_labels=np.asarray(item.frame_labels),
        video_label=item.video_label,
        path=item.path,
        start_frame=getattr(item, "start_frame", 0),
    )


def evaluate_videos(
    loader,
    scorer: Optional[GridScorer] = None,
    model: Optional[AnomalyCLIP] = None,
    on_video: Optional[Callable[[VideoScores], None]] = None,
    score_item: Optional[Callable[[TestItem], VideoScores]] = None,
    should_stop: Optional[Callable[[], bool]] = None,
    gather_processes: bool = False,
) -> Dict[str, np.ndarray]:
    """Concatenate per-video outputs over a test loader
    (anomaly_clip_module.py:500-504). The per-item scorer defaults to the
    checkpoint-backed score_video; pass ``score_item`` to route items through
    a different executable with the same accumulation (the exported-artifact
    eval, eval_entry.py:_eval_artifact). ``should_stop`` is polled between
    videos (preemption: SIGTERM must not burn the grace period on scoring);
    a stopped epoch returns {} so partial numbers are never reported.

    ``gather_processes=True``: multi-host evaluation. The loader yields only
    this process's stride of the videos (SequentialTestLoader ``shard``);
    per-video outputs are allgathered and re-concatenated in GLOBAL video
    order, so every host returns arrays identical to a single-process pass —
    a strict upgrade over the reference's rank-zero-only eval
    (anomaly_clip_module.py:458,500): videos are embarrassingly parallel
    across hosts. The stop decision is made global before the gather so a
    preempted host can never strand its peers inside the collective."""
    if score_item is None:
        score_item = lambda item: score_video(item, scorer, model)  # noqa: E731
    indices = list(loader.global_indices()) if gather_processes else None
    per_video: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    stopped = False
    for item in loader:
        if should_stop is not None and should_stop():
            stopped = True
            break
        vs = score_item(item)
        if on_video is not None:
            on_video(vs)
        per_video.append(
            (vs.scores, np.asarray(vs.frame_labels), vs.class_probs)
        )
    if gather_processes and jax.process_count() > 1:
        return _gather_process_outputs(per_video, indices[: len(per_video)], stopped)
    if stopped or not per_video:
        return {}
    return {
        "abnormal_scores": np.concatenate([v[0] for v in per_video]),
        "labels": np.concatenate([v[1] for v in per_video]),
        "class_probs": np.concatenate([v[2] for v in per_video]),
    }


# frames contributed per host per gather round: the collective payload is
# P x GATHER_CHUNK_FRAMES x (C+2) float32 regardless of how long or how skewed
# the shards are (XD-Violence-length outliers no longer size the buffer).
# ~16k frames x 8 cols x 4 B = 0.5 MB/host/round. Overridable via env for tests.
GATHER_CHUNK_FRAMES = 16384


def _gather_process_outputs(
    per_video: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    indices: List[int],
    stopped: bool,
) -> Dict[str, np.ndarray]:
    """Allgather per-video (scores, labels, class_probs) across processes and
    re-concatenate in global video order.

    ``process_allgather`` needs identical shapes on every host, and hosts own
    different video counts/lengths, so the protocol is: (1) allgather the stop
    flag + local sizes, (2) pack each host's outputs into one flat
    (frames, C+2) float32 buffer [score | label | class_probs], (3) allgather
    that pack in FIXED-SIZE rounds of GATHER_CHUNK_FRAMES rows (hosts past
    their own end contribute zero padding), (4) slice each host's videos back
    out by its (index, length) table and reassemble in index order. Bounding
    the per-round payload keeps peak gather memory independent of the longest
    shard — with padded-to-max gathers a single hour-long XD-Violence video on
    one host would size every host's buffer. Labels are small class ids
    (exact in float32) and come back as int64."""
    import os

    from jax.experimental import multihost_utils as mh

    # The chunk size drives the number of collective rounds, so every host must
    # use the SAME value — a host-local env read would desync the protocol into
    # a hang if launch wrappers diverge. Each host contributes its local value
    # to the meta allgather and everyone proceeds with the global minimum.
    local_chunk = int(os.environ.get("ANOMALYCLIP_GATHER_CHUNK", GATHER_CHUNK_FRAMES))
    n_local = len(per_video)
    local_frames = int(sum(len(v[0]) for v in per_video))
    local_c = int(per_video[0][2].shape[1]) if per_video else 0
    meta = mh.process_allgather(
        np.array(
            [int(stopped), n_local, local_frames, local_c, local_chunk], np.int64
        )
    )  # (P, 5)
    if bool(meta[:, 0].any()):
        return {}  # some host was preempted mid-epoch: no partial metrics
    if int(meta[:, 1].sum()) == 0:
        return {}
    max_videos = int(meta[:, 1].max())
    max_frames = int(meta[:, 2].max())
    num_c = int(meta[:, 3].max())
    chunk = max(1, int(meta[:, 4].min()))
    cols = num_c + 2

    idx_tab = np.full((max_videos, 2), -1, np.int64)  # (global index, length)
    pack = np.zeros((local_frames, cols), np.float32)
    off = 0
    for k, (sc, lab, pr) in enumerate(per_video):
        idx_tab[k] = (indices[k], len(sc))
        pack[off : off + len(sc), 0] = sc
        pack[off : off + len(sc), 1] = lab
        pack[off : off + len(sc), 2:] = pr
        off += len(sc)

    g_idx = mh.process_allgather(idx_tab)  # (P, max_videos, 2) — small
    num_p = g_idx.shape[0]
    frames_per_host = meta[:, 2]
    host_packs = [
        np.empty((int(f), cols), np.float32) for f in frames_per_host
    ]
    for lo in range(0, max_frames, chunk):
        part = pack[lo : lo + chunk]
        if len(part) < chunk:
            part = np.concatenate(
                [part, np.zeros((chunk - len(part), cols), np.float32)]
            )
        g = mh.process_allgather(part)  # (P, chunk, cols) — bounded payload
        for p in range(num_p):
            valid = int(min(max(int(frames_per_host[p]) - lo, 0), chunk))
            if valid:
                host_packs[p][lo : lo + valid] = g[p, :valid]

    by_index: Dict[int, np.ndarray] = {}
    for p in range(num_p):
        off = 0
        for gi, length in g_idx[p]:
            if gi < 0:
                break
            by_index[int(gi)] = host_packs[p][off : off + int(length)]
            off += int(length)
    order = sorted(by_index)
    return {
        "abnormal_scores": np.concatenate([by_index[i][:, 0] for i in order]),
        "labels": np.concatenate(
            [by_index[i][:, 1] for i in order]
        ).astype(np.int64),
        "class_probs": np.concatenate([by_index[i][:, 2:] for i in order]),
    }
