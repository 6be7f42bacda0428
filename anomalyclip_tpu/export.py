"""AOT export of the serving graphs to self-contained StableHLO artifacts.

The reference's deployment story is "load the Lightning checkpoint into the
Python model code" (its CLIP loader even special-cases TorchScript-JIT'd
checkpoints, reference clip.py:108-163). The TPU-native equivalent of a
shippable compiled model is `jax.export`: trace the jitted serving functions
once, serialize the StableHLO (+ the weights), and reload them *without any
model code* — the artifact is callable from bare JAX (or any StableHLO
runtime) on the serving fleet.

Two graphs cover the full serving surface (the same pair the evaluator,
`predict`, and `serve` run, eval/evaluator.py):

- ``score``: (param leaves, grids (g, n, l, D)) -> (similarity, scores).
  Exported with a *symbolic* grid count ``g`` — one artifact serves every
  video length with zero recompilation/bucketing logic baked in. Traced under
  ``attention_impl("xla")``: the temporal tower is tiny, and symbolic batch
  dims cannot flow into a pallas_call grid; the resulting module is portable
  StableHLO (runs on TPU/CPU/GPU backends alike).
- ``encode`` (optional): (visual-tower leaves, frames (chunk, H, W, 3)) ->
  (chunk, D) CLIP features, static chunk = AnomalyCLIP.ENCODE_CHUNK. On a TPU
  export platform this embeds the fused Pallas attention kernel (a
  platform-locked `tpu_custom_call` — normal for a deployment artifact; the
  loader replays it on matching hardware), elsewhere the portable XLA
  formulation exported for cpu/tpu/cuda alike (meta.json records the
  platforms of each graph).

Artifact layout (a directory):

    meta.json           format/version, grid shape, classnames, platforms
    score.bin           jax.export serialization of the score graph
    score_params.npz    flattened score-graph weights (text features, temporal
                        params, BN stats, ncentroid)
    encode.bin          (optional) serialization of the encode graph
    encode_params.npz   (optional) frozen visual-tower weights

CLI (same bootstrap contract as predict.py):

    python -m anomalyclip_tpu.export model=anomaly_clip_ucfcrime data=ucfcrime \
        ckpt_path=<orbax-dir | released.ckpt> out=<artifact-dir> \
        [include_encoder=true] [ncentroid_path=...]

Loading needs only this module (no AnomalyCLIP/CLIP construction):

    art = ServingArtifact.load("artifact-dir")
    similarity, scores = art.score(grids)          # any g, no padding
    feats = art.encode(frames_uint8_or_float)      # chunked + normalized
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

FORMAT_VERSION = 1


def _save_leaves(path: Path, leaves: Sequence) -> None:
    """npz-serialize arrays, spelling bf16 as a uint16 view (npz has no bf16)."""
    arrays, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        dtypes.append(str(arr.dtype))
        if arr.dtype.name == "bfloat16":
            arr = arr.view(np.uint16)
        arrays[f"leaf_{i}"] = arr
    np.savez(path, __dtypes__=np.array(dtypes), **arrays)


def _load_leaves(path: Path) -> List[np.ndarray]:
    import ml_dtypes

    with np.load(path) as z:
        dtypes = [str(d) for d in z["__dtypes__"]]
        leaves = []
        for i, dt in enumerate(dtypes):
            arr = z[f"leaf_{i}"]
            if dt == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16)
            leaves.append(arr)
    return leaves


# every graph without non-portable custom calls is exported for all three
# backends at once — one artifact serves the TPU fleet, CPU CI, and GPU boxes
PORTABLE_PLATFORMS = ("cpu", "tpu", "cuda")


def _export_jit(fn_jit, args, *, allow_tpu_custom_call: bool):
    """jax.export.export; portable graphs are lowered for all platforms, while
    a graph embedding the fused Pallas kernel (tpu_custom_call) is necessarily
    TPU-locked and needs the safety check disabled."""
    from jax import export as jexport

    if allow_tpu_custom_call:
        return jexport.export(
            fn_jit,
            platforms=["tpu"],
            disabled_checks=[jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")],
        )(*args)
    return jexport.export(fn_jit, platforms=list(PORTABLE_PLATFORMS))(*args)


def export_serving_artifact(
    model,
    frozen,
    trainable,
    bn_state,
    ncentroid,
    out_dir: str | Path,
    *,
    include_encoder: bool = True,
    classnames: Optional[Sequence[str]] = None,
) -> Path:
    """Export the serving graphs of a trained AnomalyCLIP to ``out_dir``.

    ``frozen``/``trainable``/``bn_state``/``ncentroid`` are the same pytrees the
    evaluator consumes (train/module.py state). Returns the artifact path.
    Note: exports the fp tower — the int8 serving tower (models/clip/quant.py)
    re-quantizes at load time and is not embedded in artifacts.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from jax.tree_util import tree_flatten, tree_unflatten

    from anomalyclip_tpu.eval.evaluator import GridScorer
    from anomalyclip_tpu.models.clip.model import attention_impl

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)
    n, l = model.cfg.num_segments, model.cfg.seg_length
    d = model.embedding_dim

    # ---- score graph: symbolic grid count, portable XLA attention ----------
    score_tree = (
        scorer.text_features,
        scorer._temporal,
        scorer._bn_state,
        jnp.asarray(scorer._ncentroid),
    )
    score_leaves, score_treedef = tree_flatten(score_tree)

    def score_flat(leaves, grids):
        tf, tp, bn, nc = tree_unflatten(score_treedef, leaves)
        with attention_impl("xla"):
            return scorer._score.__wrapped__(tf, tp, bn, nc, grids)

    (g,) = jexport.symbolic_shape("g", constraints=["g >= 1"])
    leaf_specs = [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype) for x in score_leaves]
    grids_spec = jax.ShapeDtypeStruct((g, n, l, d), jnp.float32)
    exported_score = _export_jit(
        jax.jit(score_flat), (leaf_specs, grids_spec), allow_tpu_custom_call=False
    )
    (out / "score.bin").write_bytes(exported_score.serialize())
    _save_leaves(out / "score_params.npz", score_leaves)

    # ---- encode graph: static chunk, platform-native attention -------------
    encode_meta = None
    if include_encoder:
        chunk = model.ENCODE_CHUNK
        side = int(model.clip_cfg.image_resolution)
        visual_view = {"clip": {"visual": frozen["clip"]["visual"]}}
        enc_leaves, enc_treedef = tree_flatten(visual_view)

        def encode_flat(leaves, frames):
            view = tree_unflatten(enc_treedef, leaves)
            return model.encode_frames(view, frames)

        enc_specs = [
            jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype) for x in enc_leaves
        ]
        frames_spec = jax.ShapeDtypeStruct((chunk, side, side, 3), jnp.float32)
        # On TPU the traced graph embeds the fused Pallas kernel — a
        # non-portable tpu_custom_call the export must explicitly permit.
        on_tpu = jax.default_backend() == "tpu"
        exported_enc = _export_jit(
            jax.jit(encode_flat), (enc_specs, frames_spec), allow_tpu_custom_call=on_tpu
        )
        (out / "encode.bin").write_bytes(exported_enc.serialize())
        _save_leaves(out / "encode_params.npz", enc_leaves)
        encode_meta = {
            "chunk": chunk,
            "resolution": side,
            "embed_dim": int(model.clip_cfg.embed_dim),
            "platforms": list(exported_enc.platforms),
        }

    meta = {
        "format_version": FORMAT_VERSION,
        "grid": {
            "num_segments": n,
            "seg_length": l,
            "feature_dim": d,
            "stride": int(model.cfg.stride),
        },
        "normal_id": int(model.cfg.normal_id),
        "classnames": list(classnames) if classnames else None,
        "score_platforms": list(exported_score.platforms),
        "encode": encode_meta,
        "jax_version": jax.__version__,
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    return out


class ServingArtifact:
    """A loaded export: ``score`` + optional ``encode``, no model code needed
    (only this module plus the package's pure-numpy sampling/layout helpers)."""

    def __init__(self, meta: dict, score_exp, score_leaves, encode_exp, encode_leaves):
        import jax

        self.meta = meta
        self._score_exp = score_exp
        self._score_leaves = score_leaves
        self._encode_exp = encode_exp
        self._encode_leaves = encode_leaves
        # Exported.call re-traces its wrapper on every invocation (~tens of ms
        # of host overhead); jit once here so warm calls hit the executable
        # cache directly (one compile per concrete shape, as usual)
        self._score_call = jax.jit(score_exp.call)
        if encode_exp is not None:
            _call = jax.jit(encode_exp.call)

            def encode_call(leaves, frames, _call=_call):
                return _call(leaves, frames)

            # the exported encode graph is traced with a float32 input spec
            # (export_serving_artifact), so uint8 ingest normalizes on the host
            # here — unlike the checkpoint-backed encoders, which take uint8
            # in-graph (encode_frames_chunked checks this flag)
            encode_call._host_normalize_uint8 = True
            self._encode_call = encode_call
        else:
            self._encode_call = None

    @classmethod
    def load(cls, path: str | Path) -> "ServingArtifact":
        from jax import export as jexport

        p = Path(path)
        meta = json.loads((p / "meta.json").read_text())
        if meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {meta['format_version']} is newer than this "
                f"loader ({FORMAT_VERSION})"
            )
        score_exp = jexport.deserialize((p / "score.bin").read_bytes())
        score_leaves = _load_leaves(p / "score_params.npz")
        encode_exp = encode_leaves = None
        if (p / "encode.bin").exists():
            encode_exp = jexport.deserialize((p / "encode.bin").read_bytes())
            encode_leaves = _load_leaves(p / "encode_params.npz")
        return cls(meta, score_exp, score_leaves, encode_exp, encode_leaves)

    # -- score ---------------------------------------------------------------

    def score(self, grids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """grids (g, n, l, D) float32 -> (similarity (g*n*l, C-1), scores (g*n*l,)).

        ``g`` is symbolic in the exported module: any grid count runs through
        the one artifact (XLA still compiles per concrete shape at call time)."""
        g = self.meta["grid"]
        want = (g["num_segments"], g["seg_length"], g["feature_dim"])
        if tuple(grids.shape[1:]) != want:
            raise ValueError(f"grids shape {grids.shape[1:]} != exported {want}")
        sim, sc = self._score_call(self._score_leaves, np.asarray(grids, np.float32))
        return np.asarray(sim), np.asarray(sc)

    # -- encode ----------------------------------------------------------------

    def encode(self, frames: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 or CLIP-normalized float -> (N, D) features,
        through the same chunk/normalize/pad/trim loop the evaluator runs
        (one shared implementation, so artifact/checkpoint parity cannot
        drift), feeding the exported static-chunk graph."""
        if self._encode_exp is None:
            raise ValueError("artifact was exported without the encoder graph")
        from anomalyclip_tpu.eval.evaluator import encode_frames_chunked

        return encode_frames_chunked(
            self._encode_call,
            self._encode_leaves,
            frames,
            chunk=self.meta["encode"]["chunk"],
        )

    # -- full per-video scoring (the predict/serve contract) --------------------

    def score_video(
        self, raw: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Score one video end-to-end from the artifact alone.

        ``raw`` is (ncrops, T, D) pre-extracted features or (ncrops, T, H, W, 3)
        frames (uint8 or CLIP-normalized float; needs the encoder graph).
        Runs the same pipeline as the evaluator — test-time covering sampling,
        grid layout, crop consensus, stride expansion, trim, softmax
        (eval/evaluator.py:score_sampled_features, shared code) — but through
        the exported graphs, so no model construction or checkpoint is needed.
        Returns (similarity (T, C-1), scores (T,), class_probs (T, C-1))."""
        from anomalyclip_tpu.data.sampling import (
            gather_frame_indices,
            test_start_indices,
        )
        g = self.meta["grid"]
        n, l, stride = g["num_segments"], g["seg_length"], g["stride"]
        t_raw = raw.shape[1]
        starts, segment_size = test_start_indices(t_raw, n, l, stride)
        indices = gather_frame_indices(starts, l, stride, t_raw)
        return self._score_sampled(raw[:, indices], segment_size, t_raw)

    def _score_sampled(
        self, feats: np.ndarray, segment_size: int, num_labels: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Shared tail of score_video/score_test_item: encode raw frames if
        present, then the evaluator's layout/consensus pipeline over the
        bucketed exported score graph."""
        from anomalyclip_tpu.eval.evaluator import score_sampled_features

        g = self.meta["grid"]
        if feats.ndim == 5:
            ncrops, t = feats.shape[:2]
            flat = feats.reshape((-1,) + feats.shape[2:])
            feats = self.encode(flat).reshape(ncrops, t, -1)
        return score_sampled_features(
            np.asarray(feats, np.float32),
            segment_size,
            g["num_segments"],
            g["seg_length"],
            g["stride"],
            num_labels,
            self.score_grids_bucketed,
        )

    def score_grids_bucketed(
        self, grids: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """score() with GridScorer's bucket padding: the graph is
        shape-polymorphic, but XLA still compiles per concrete shape at call
        time — bucketing means a stream of assorted video lengths costs a
        handful of compiles, not one per distinct length."""
        from anomalyclip_tpu.eval.evaluator import pad_to_bucket

        padded, true_g = pad_to_bucket(grids)
        sim, sc = self.score(padded)
        n_l = true_g * padded.shape[1] * padded.shape[2]
        return sim[:n_l], sc[:n_l]

    def score_test_item(self, item) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Score a pre-sampled TestItem (data/dataset.py) — the benchmark-eval
        path: features arrive already test-sampled to (ncrops, n*s*l, ...)
        with a known segment_size (unlike score_video's raw input).
        -> (similarity, scores, class_probs), trimmed to the labeled length."""
        return self._score_sampled(
            item.features, item.segment_size, len(item.frame_labels)
        )

    def predict(self, raw: np.ndarray, path: str = "") -> dict:
        """score_video + the predict.py output schema (same keys/values as the
        checkpoint-backed CLI, predict.py:score_input)."""
        classnames = self.meta.get("classnames")
        if not classnames:
            raise ValueError(
                "artifact was exported without classnames; re-export passing "
                "classnames= to export_serving_artifact"
            )
        _, sc, class_probs = self.score_video(raw)
        normal_id = int(self.meta["normal_id"])
        abnormal_names = [c for i, c in enumerate(classnames) if i != normal_id]
        top_col = class_probs.argmax(axis=1)
        return {
            "input": path,
            "num_frames": int(raw.shape[1]),
            "video_anomaly_score": float(sc.max()),
            "frame_scores": np.round(sc, 6).tolist(),
            "frame_top_class": [abnormal_names[int(c)] for c in top_col],
            "frame_top_class_prob": np.round(class_probs.max(axis=1), 6).tolist(),
            "classnames_abnormal": abnormal_names,
            "class_probs_shape": list(class_probs.shape),
        }


def main(argv=None) -> Path:
    from anomalyclip_tpu.predict import maybe_force_cpu

    argv = list(sys.argv[1:] if argv is None else argv)
    maybe_force_cpu(argv)
    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parents[1]))

    from anomalyclip_tpu.config import compose, default_config_dir

    cfg = compose(default_config_dir(), "eval", argv)
    if not cfg.get("data") or not cfg.get("model"):
        raise SystemExit(
            "export needs model/data groups, e.g.\n"
            "  python -m anomalyclip_tpu.export model=anomaly_clip_ucfcrime "
            "data=ucfcrime ckpt_path=... out=artifact/"
        )
    ckpt_path = cfg.get("ckpt_path")
    out_dir = cfg.get("out")
    if not ckpt_path or ckpt_path == "???" or not out_dir:
        raise SystemExit("export requires ckpt_path=... and out=...")

    from anomalyclip_tpu.models.anomaly_clip import read_classnames
    from anomalyclip_tpu.predict import load_module_and_state

    module, state = load_module_and_state(cfg)
    include_encoder = str(cfg.get("include_encoder", True)).lower() not in (
        "false",
        "0",
    )
    path = export_serving_artifact(
        module.model,
        module.frozen,
        state.trainable,
        state.bn_state,
        module.ncentroid,
        out_dir,
        include_encoder=include_encoder,
        classnames=read_classnames(module.datamodule.cfg.labels_file),
    )
    print(f"exported serving artifact -> {path}")
    return path


def cli() -> int:
    """Console-script entry: main() returns the artifact Path, which setuptools
    wrappers would pass to sys.exit() — translate to a clean exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
