"""The training/evaluation orchestrator: the Lightning-module + Trainer replacement.

Covers the reference's AnomalyCLIPModule + pytorch_lightning.Trainer behavior
(reference: src/models/anomaly_clip_module.py, src/train.py:37-110) as an explicit
loop over jit-compiled steps:

- ncentroid bootstrap over the normal training set, cached to ncentroid.npy
  (anomaly_clip_module.py:134-171)
- per-step: concat (abnormal, normal) halves -> forward -> 7-term loss -> AdamW
  update with 4 LR groups (:173-296, :693-746); the whole step is ONE jitted
  function, gradients and BN batch statistics reduced globally over the data mesh
  by XLA (the DDP allreduce + sync-BN equivalents)
- per-epoch: validation over the test set -> AUC/AP/mAUC/mAP -> metrics_{epoch}.json
  (:301-404); Orbax checkpoint epoch_{e:03d} + last
- test: artifacts (metrics.json + PNGs) via eval.artifacts (:500-691)
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from anomalyclip_tpu.config import ConfigNode
from anomalyclip_tpu.data.datamodule import AnomalyCLIPDataModule, DataConfig
from anomalyclip_tpu.data.loader import TrainBatch, limit_count as _limit_count
from anomalyclip_tpu.data.synthetic import generate_synthetic_dataset
from anomalyclip_tpu.eval.artifacts import write_metrics_json, write_test_artifacts
from anomalyclip_tpu.eval.evaluator import GridScorer, evaluate_videos
from anomalyclip_tpu.eval.metrics import detection_metrics
from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP, AnomalyCLIPConfig
from anomalyclip_tpu.models.clip.registry import resolve_clip
from anomalyclip_tpu.models.losses import LossConfig, compute_loss
from anomalyclip_tpu.models.selector import BNState
from anomalyclip_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    maybe_initialize_distributed,
    replicate,
    shard_train_batch,
    usable_data_devices,
)
from anomalyclip_tpu.train.checkpoint import (
    CheckpointManager,
    load_ncentroid,
    save_ncentroid,
)
from anomalyclip_tpu.train.optim import base_lr_schedule, build_optimizer
from anomalyclip_tpu.utils.logging import MetricLoggerSet, get_logger, is_host_zero

log = get_logger(__name__)


class TrainingPreempted(RuntimeError):
    """Raised after a SIGTERM-triggered checkpoint save (preemption recovery).

    TPU-pod preemptions and maintenance events deliver SIGTERM with a grace
    period; the reference (Lightning on GPUs) has no preemption story. fit()
    saves the last *epoch-boundary* state as a regular checkpoint and raises
    this, so `ckpt_path=<run>/checkpoints/last` resumes with exactly the same
    semantics as any other epoch checkpoint (no partial-epoch optimizer state
    is ever persisted)."""


class TrainState(NamedTuple):
    trainable: Any
    opt_state: Any
    bn_state: BNState
    step: jnp.ndarray




def _net_config(net_cfg: Dict[str, Any]) -> AnomalyCLIPConfig:
    import dataclasses

    fields = {f.name for f in dataclasses.fields(AnomalyCLIPConfig)}
    return AnomalyCLIPConfig(**{k: v for k, v in net_cfg.items() if k in fields})


class AnomalyCLIPTrainModule:
    """Owns model, data, optimizer, and the train/eval loops for one composed cfg."""

    def __init__(self, cfg: ConfigNode):
        # multi-host bring-up must precede any device query (no-op single-process)
        maybe_initialize_distributed()
        self.cfg = cfg
        self.seed = int(cfg.get("seed") or 0)
        self.save_dir = Path(cfg.model.get("save_dir") or cfg.paths.output_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)

        trainer_cfg = cfg.get("trainer", ConfigNode())
        if trainer_cfg.get("detect_anomaly"):
            jax.config.update("jax_debug_nans", True)

        # --- data ----------------------------------------------------------
        data_cfg_dict = dict(cfg.data)
        net_cfg_dict = dict(cfg.model.net)
        # resolve CLIP first: synthetic feature files must match the resolved
        # tower's embed_dim (ViT-B/16 is 512-dim, ViT-L/14 768, RN50 1024, the
        # random tiny config 64), not a hard-coded width
        clip_params, clip_cfg = resolve_clip(
            arch=net_cfg_dict.get("arch", "ViT-B/16"),
            clip_init=net_cfg_dict.get("clip_init", "pretrained"),
            clip_ckpt_path=net_cfg_dict.get("clip_ckpt_path"),
            seed=self.seed,
        )
        if data_cfg_dict.get("synthetic"):
            clip_probe_dim = clip_cfg.embed_dim
            generate_synthetic_dataset(
                frames_root=data_cfg_dict["frames_root"],
                annotations_root=data_cfg_dict["annotations_root"],
                num_normal=data_cfg_dict.get("synthetic_num_normal", 8),
                num_abnormal=data_cfg_dict.get("synthetic_num_abnormal", 8),
                num_test=data_cfg_dict.get("synthetic_num_test", 4),
                num_classes=data_cfg_dict["num_classes"],
                normal_id=data_cfg_dict["normal_id"],
                feature_dim=clip_probe_dim,
                min_frames=data_cfg_dict.get("synthetic_min_frames", 600),
                max_frames=data_cfg_dict.get("synthetic_max_frames", 1400),
                seed=self.seed,
                # from-frames runs need JPEG dirs; frame size = CLIP input size
                make_frames=not data_cfg_dict.get("load_from_features", True),
                frame_size=int(data_cfg_dict.get("input_size", 224)),
            )
        self.datamodule = AnomalyCLIPDataModule(
            DataConfig.from_dict(data_cfg_dict), seed=self.seed
        )

        # --- model ---------------------------------------------------------
        self.net_cfg = _net_config(net_cfg_dict)
        self.model, self.frozen = AnomalyCLIP.build(self.net_cfg, clip_params, clip_cfg)
        # frozen params live on the HOST (numpy); device placement is explicit
        # and path-aware (_frozen_on_device / replicate / TP sharding), so a
        # tensor-parallel tower is streamed straight into its sharded placement
        # and device 0 never materializes the full unsharded copy
        self.frozen = jax.tree_util.tree_map(np.asarray, self.frozen)
        self._frozen_dev = None  # memoized single-device placement (DP paths)
        self.loss_cfg = LossConfig(
            **{
                k: v
                for k, v in dict(cfg.model.loss).items()
                if k in LossConfig.__dataclass_fields__
            }
        )

        # --- mesh ----------------------------------------------------------
        half_batch = self.datamodule.cfg.batch_size // 2
        self.mesh = data_mesh(usable_data_devices(half_batch))
        log.info(
            f"data mesh: {self.mesh.shape} over {self.mesh.devices.ravel()[0].platform}"
        )

        mc_cfg = (cfg.get("callbacks") or ConfigNode()).get("model_checkpoint") or {}
        self.ckpt = CheckpointManager(
            self.save_dir,
            save_top_k=int(mc_cfg.get("save_top_k", -1) or -1),
            save_last=bool(mc_cfg.get("save_last", True)),
        )
        self._ckpt_every_n_epochs = int(mc_cfg.get("every_n_epochs", 1) or 1)
        self.loggers = MetricLoggerSet(cfg.get("logger"), self.save_dir)
        self.ncentroid: Optional[np.ndarray] = None
        self._encode_frames_jit = None

    # ------------------------------------------------------------------ data

    def _encode_jit(self):
        """The one jitted CLIP frame encoder, shared by the ncentroid pass and the
        evaluator (one compile per model). ``trainer.model_parallel: N`` routes
        it through the tensor-parallel tower — batch over the data axis,
        weights Megatron-sharded over the model axis (parallel/tp.py) — when
        _tp_unavailable_reason allows: at least N host-local devices, the
        encode chunk divisible by the data-axis rows, and a ViT (not ResNet)
        tower; any rejection logs its reason and falls back to one device."""
        if self._encode_frames_jit is None:
            mp = int(
                self.cfg.get("trainer", ConfigNode()).get("model_parallel") or 1
            )
            # validate the quantize knob up front so a typo raises (and the
            # serving-only warnings fire) on EVERY route, incl. tensor-parallel
            int8 = self._int8_serving_active()
            reason = self._tp_unavailable_reason(mp) if mp > 1 else None
            if mp > 1 and reason is None:
                if int8:
                    log.warning(
                        "model.net.quantize=int8 has no tensor-parallel path — "
                        f"trainer.model_parallel={mp} encodes on the fp tower"
                    )
                self._encode_frames_jit = self._tp_encode_fn(mp)
            else:
                if mp > 1:
                    log.warning(
                        f"trainer.model_parallel={mp} requested but {reason} — "
                        "encoding on the single-device tower instead"
                    )
                if int8:
                    self._encode_frames_jit = self._int8_encode_fn()
                else:
                    # DP eval: each chip runs the COMPLETE encoder (Pallas
                    # kernels included) on its shard of the static frame chunk
                    # via shard_map — embarrassingly parallel, zero collectives,
                    # no SPMD-partitioner involvement. Single device: plain jit.
                    eval_mesh = self._eval_mesh()
                    if eval_mesh is not None:
                        from jax.experimental.shard_map import shard_map
                        from jax.sharding import PartitionSpec as P

                        from anomalyclip_tpu.parallel.mesh import DATA_AXIS

                        enc = jax.jit(
                            shard_map(
                                self.model.encode_frames,
                                mesh=eval_mesh,
                                in_specs=(P(), P(DATA_AXIS)),
                                out_specs=P(DATA_AXIS),
                            )
                        )
                    else:
                        enc = jax.jit(self.model.encode_frames)

                    def fn(_frozen, frames, _enc=enc, _mesh=eval_mesh):
                        # substitute the memoized device copy: self.frozen is
                        # host numpy, and re-transferring the tower per chunk
                        # would turn every encode into a host->device copy of
                        # the weights. Sharded placement device_puts the HOST
                        # array so each shard transfers straight to its chip.
                        if _mesh is not None:
                            frames = jax.device_put(
                                np.asarray(frames), batch_sharding(_mesh)
                            )
                        return _enc(self._frozen_on_device(), frames)

                    fn._tp = False
                    self._encode_frames_jit = fn
        return self._encode_frames_jit

    def _int8_serving_active(self) -> bool:
        """Whether the W8A8 tower serves this encode path. quantize=int8 is a
        *serving* knob: during fit() the fp tower encodes everything (incl. the
        ncentroid bootstrap) so training never mixes precisions — the train
        forward always runs the fp tower, and a centroid from a different
        tower would silently shift the loss."""
        if self.net_cfg.quantize == "none":
            return False
        if self.net_cfg.quantize != "int8":
            raise ValueError(
                f"model.net.quantize={self.net_cfg.quantize!r}: expected 'none' or 'int8'"
            )
        if self.model.clip_cfg.is_resnet:
            log.warning(
                "model.net.quantize=int8 has no ResNet-tower path — serving the "
                "fp tower instead"
            )
            return False
        if getattr(self, "_in_fit", False):
            log.warning(
                "model.net.quantize=int8 is serving-only: the training run "
                "(incl. its ncentroid bootstrap) uses the fp tower"
            )
            return False
        return True

    def _int8_encode_fn(self):
        """W8A8 serving encoder (model.net.quantize=int8): the frozen visual
        tower's GEMM weights quantized once at build (per-output-channel
        int8 + scales, one jitted tree->tree pass that lands on device);
        activations quantized per token inside the jit
        (models/clip/quant.py). Chunking mirrors AnomalyCLIP.encode_frames.
        Quantized params are passed as jit arguments, never closed over
        (large constants break remote compile)."""
        from anomalyclip_tpu.models.clip.quant import (
            encode_image_int8,
            quantize_clip_visual,
        )

        qvisual = quantize_clip_visual(self.frozen["clip"])
        clip_cfg = self.model.clip_cfg
        chunk = self.model.ENCODE_CHUNK
        # same non-GEMM compute dtype as the fp paths (encode_frames /
        # tp_encode_images): only the six GEMM families change precision
        dtype = self.model.cfg.dtype

        @jax.jit
        def enc(q, frames):
            n = frames.shape[0]
            if n > chunk and n % chunk == 0:
                return jax.lax.map(
                    lambda c: encode_image_int8(q, clip_cfg, c, dtype),
                    frames.reshape((n // chunk, chunk) + frames.shape[1:]),
                ).reshape(n, -1)
            return encode_image_int8(q, clip_cfg, frames, dtype)

        log.info("encode path: int8 (W8A8) serving tower")

        def fn(_frozen, frames):
            return enc(qvisual, frames)

        fn._tp = False
        fn._int8 = True
        return fn

    def _eval_mesh(self):
        """The data mesh for evaluation/serving, independent of the training
        batch size (the train mesh shrinks to divide half_batch — irrelevant
        here: eval buckets round themselves to any mesh). Uses the largest
        LOCAL-device prefix dividing ENCODE_CHUNK so the sharded frame chunks
        always split evenly. Local devices only: videos are sharded ACROSS
        hosts by stride (validate/test + SequentialTestLoader shard), and each
        host scores its share over its own chips — outputs stay fully
        addressable for the host-side grid layout inversion, and no cross-host
        collective ever enters the score program. None when a mesh would not
        parallelize anything (one local device)."""
        if not hasattr(self, "_eval_mesh_cache"):
            devs = jax.local_devices()
            n = len(devs)
            while n > 1 and AnomalyCLIP.ENCODE_CHUNK % n:
                n -= 1
            self._eval_mesh_cache = data_mesh(devs[:n]) if n > 1 else None
        return self._eval_mesh_cache

    def _frozen_on_device(self):
        """Device placement of the frozen params, materialized lazily and once:
        replicated over the eval mesh when DP eval is active (each chip runs
        the full encoder on its frame shard), single-device otherwise.
        TP encode never calls this — its tower is device_put shard-by-shard
        in _tp_encode_fn, which is what keeps a bigger-than-one-chip tower
        servable: no device ever holds the full unsharded copy."""
        if self._frozen_dev is None:
            mesh = self._eval_mesh()
            if mesh is not None:
                self._frozen_dev = replicate(self.frozen, mesh)
            else:
                self._frozen_dev = jax.tree_util.tree_map(jnp.asarray, self.frozen)
        return self._frozen_dev

    def _tp_unavailable_reason(self, mp: int) -> Optional[str]:
        """Why trainer.model_parallel=mp cannot run here (None = it can).
        Local (addressable) devices only: the host feeds per-process numpy
        chunks, so the TP mesh must be host-local even on multi-host runs.
        A non-dividing device count uses the largest dividing subset (the
        remainder idles, logged by _tp_encode_fn)."""
        n = len(jax.local_devices())
        if n < mp:
            return f"only {n} local device(s) for model_parallel={mp}"
        dp = n // mp  # largest dividing subset: dp rows of mp devices
        if AnomalyCLIP.ENCODE_CHUNK % dp != 0:
            return f"encode chunk {AnomalyCLIP.ENCODE_CHUNK} not divisible by dp={dp}"
        if self.model.clip_cfg.is_resnet:
            # clip_tp_specs leaves ResNet towers replicated (no scan blocks to
            # shard) — a (dp, mp) mesh would just idle mp-1 replicas per batch
            return "ResNet towers have no TP sharding (stay on the DP path)"
        return None

    def _tp_encode_fn(self, mp: int):
        """(frozen, frames) -> (N, D) through the TP tower. The clip params are
        placed on the 2-D mesh once here; the per-call ``frozen`` argument is
        ignored (the builder is invalidated whenever self.frozen is swapped —
        load_state sets _encode_frames_jit back to None).

        Capacity, not just latency: ``self.frozen`` is host numpy, and each
        leaf is device_put directly into its NamedSharding placement — every
        device receives only its 1/mp shard of the sharded weights, and no
        device ever materializes the full unsharded tower (asserted by
        tests/test_tensor_parallel.py::test_tp_capacity_no_full_tower_per_device).
        The placed tree is kept on ``self._tp_placed`` for introspection."""
        from anomalyclip_tpu.parallel.tp import (
            dp_mp_mesh,
            shard_clip_params,
            shard_clip_params_aligned,
            tp_encode_images,
            tp_encode_images_aligned,
        )

        devices = jax.local_devices()  # host-local mesh: the host feeds numpy
        n_use = len(devices) // mp * mp
        if n_use < len(devices):
            log.warning(
                f"model_parallel={mp}: using {n_use} of {len(devices)} local "
                "devices (count does not divide evenly; remainder idles)"
            )
        devices = devices[:n_use]
        mesh = dp_mp_mesh(n_use // mp, mp, devices)
        clip_cfg = self.model.clip_cfg
        # host numpy by construction (__init__/load_state keep frozen on host);
        # np.asarray also covers a caller that swapped in device arrays
        clip = jax.tree_util.tree_map(np.asarray, self.frozen["clip"])
        # head-aligned shard_map variant (exact-Megatron schedule) when the
        # head count allows; GSPMD-automatic specs otherwise (ResNet towers
        # never reach here — _tp_unavailable_reason routes them to DP)
        if clip_cfg.vision_heads % mp == 0:
            placed = shard_clip_params_aligned(clip, mesh)
            enc = tp_encode_images_aligned(clip_cfg, mesh, self.model.cfg.dtype)
        else:
            placed = shard_clip_params(clip, mesh)
            enc = tp_encode_images(clip_cfg, mesh, self.model.cfg.dtype)
        log.info(f"TP encode: mesh {dict(mesh.shape)} over {devices[0].platform}")
        self._tp_placed = placed

        def fn(_frozen, frames):
            return enc(placed, frames)

        fn._tp = True
        return fn

    def _frame_features(self, features: np.ndarray) -> np.ndarray:
        """Encode raw frames to CLIP features for the ncentroid pass (frames path)."""
        from anomalyclip_tpu.eval.evaluator import encode_frames_chunked

        return encode_frames_chunked(self._encode_jit(), self.frozen, features)

    def compute_ncentroid(self, limit: Optional[int] = None) -> np.ndarray:
        """Mean CLIP feature over every frame of the normal training videos
        (anomaly_clip_module.py:134-171); cached as ncentroid.npy."""
        cached = load_ncentroid(self.save_dir)
        if jax.process_count() > 1:
            # the cache-hit decision must be GLOBAL: the compute path below ends
            # in an allgather, so one host taking the early return while another
            # recomputes (host-local run dirs) would deadlock the collective
            from jax.experimental import multihost_utils

            if not bool(
                multihost_utils.process_allgather(
                    np.asarray(cached is not None)
                ).all()
            ):
                cached = None
        if cached is not None and limit is None:
            # limited passes (fast_dev_run) neither trust nor write the cache: a
            # 1-video centroid in the run dir must not poison later full runs
            self.ncentroid = cached
            return cached
        log.info("computing ncentroid over normal training videos ...")
        total = np.zeros(self.model.embedding_dim, dtype=np.float64)
        count = 0
        # multi-host: each process sums only its stride of the normal videos
        # (host IO scales 1/P), then one allgather reduces (sum, count) — the
        # fp64 accumulator keeps the split-order difference below fp32 rounding
        shard = (jax.process_index(), jax.process_count())
        for item in self.datamodule.train_dataloader_test_mode(
            limit=limit, shard=shard
        ):
            feats = item.features  # (ncrops, t, D) or frames
            flat = feats.reshape(-1, *feats.shape[2:])
            flat = flat[: len(item.frame_labels)]  # drop padding frames (:155-157)
            if not self.net_cfg.load_from_features:
                flat = self._frame_features(flat)
            total += flat.reshape(len(flat), -1).sum(axis=0, dtype=np.float64)
            count += len(flat)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            packed = multihost_utils.process_allgather(
                np.concatenate([total, [np.float64(count)]])
            )  # (P, D+1)
            total = packed[:, :-1].sum(axis=0)
            count = float(packed[:, -1].sum())
        ncentroid = (total / max(count, 1)).astype(np.float32)
        if limit is None and is_host_zero():  # never cache a truncated centroid;
            # one writer on shared filesystems (every host computed the same
            # allgather-reduced value anyway)
            save_ncentroid(self.save_dir, ncentroid)
        self.ncentroid = ncentroid
        return ncentroid

    # ----------------------------------------------------------------- train

    def _build_train_step(self, tx: optax.GradientTransformation):
        model, loss_cfg = self.model, self.loss_cfg

        def train_step(
            frozen, state: TrainState, batch: TrainBatch, ncentroid, key, metric_sums
        ):
            features = jnp.concatenate(
                [batch.abnormal_features, batch.normal_features], axis=0
            )
            labels = jnp.concatenate([batch.abnormal_labels, batch.normal_labels], axis=0)

            def loss_fn(trainable):
                out, new_bn = model.forward_train(
                    frozen, trainable, state.bn_state, features, labels, ncentroid, key
                )
                terms = compute_loss(
                    out.logits,
                    out.logits_topk,
                    labels,
                    out.scores,
                    out.idx_topk_abn,
                    out.idx_topk_nor,
                    out.idx_bottomk_abn,
                    loss_cfg,
                )
                return terms.total, (terms, new_bn)

            (_, (terms, new_bn)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.trainable
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
            new_trainable = optax.apply_updates(state.trainable, updates)
            new_state = TrainState(
                trainable=new_trainable,
                opt_state=new_opt,
                bn_state=new_bn,
                step=state.step + 1,
            )
            metrics = {
                "train/loss": terms.total,
                "train/dir_abn_loss": terms.ldir_abn,
                "train/dir_nor_loss": terms.ldir_nor,
                "train/topk_abn_loss": terms.ltopk_abn,
                "train/bottomk_abn_loss": terms.lbottomk_abn,
                "train/topk_nor_loss": terms.ltopk_nor,
                "train/smooth_loss": terms.lsmooth,
                "train/sparse_loss": terms.lsparse,
            }
            # metrics accumulate on device: one host transfer per epoch, not per
            # step — a per-step float() blocks async dispatch and stalls the pipe
            new_sums = {k: metric_sums[k] + v for k, v in metrics.items()}
            return new_state, new_sums

        return jax.jit(train_step, donate_argnums=(1, 5))

    @staticmethod
    def _zero_metric_sums() -> Dict[str, jnp.ndarray]:
        return {
            k: jnp.zeros((), jnp.float32)
            for k in (
                "train/loss",
                "train/dir_abn_loss",
                "train/dir_nor_loss",
                "train/topk_abn_loss",
                "train/bottomk_abn_loss",
                "train/topk_nor_loss",
                "train/smooth_loss",
                "train/sparse_loss",
            )
        }

    def _prepare_batch(self, batch: TrainBatch) -> TrainBatch:
        """Squeeze the ncrops axis (anomaly_clip.py:178 squeeze) and shard halves
        over the data mesh."""
        def squeeze(x):
            return x[:, 0] if x.ndim >= 3 and x.shape[1] == 1 else x

        batch = TrainBatch(
            abnormal_features=squeeze(batch.abnormal_features),
            abnormal_labels=batch.abnormal_labels,
            normal_features=squeeze(batch.normal_features),
            normal_labels=batch.normal_labels,
        )
        return shard_train_batch(batch, self.mesh)

    def init_state(self, tx: optax.GradientTransformation) -> TrainState:
        trainable, bn_state = self.model.init_trainable(
            jax.random.PRNGKey(self.seed), self.frozen
        )
        opt_state = tx.init(trainable)
        return TrainState(
            trainable=trainable,
            opt_state=opt_state,
            bn_state=bn_state,
            step=jnp.zeros((), jnp.int32),
        )

    def _log_model_summary(self, state: TrainState) -> None:
        """Parameter counts per optimizer group + frozen CLIP (the reference's
        log_hyperparameters, src/utils/logging_utils.py:9-50)."""

        def count(tree) -> int:
            return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))

        frozen_n = count(self.frozen)
        groups = {k: count(v) for k, v in state.trainable.items()}
        trainable_n = sum(groups.values())
        per_group = ", ".join(f"{k}={v:,}" for k, v in groups.items())
        log.info(
            f"model summary: trainable={trainable_n:,} ({per_group}); "
            f"frozen CLIP={frozen_n:,}; total={trainable_n + frozen_n:,}"
        )
        self.loggers.log_metrics(
            {
                "model/params_trainable": float(trainable_n),
                "model/params_frozen": float(frozen_n),
                "model/params_total": float(trainable_n + frozen_n),
            },
            step=0,
        )

    def _run_task(self, fn):
        """task_wrapper analogue (reference: src/utils/utils.py:42-92): exceptions
        are appended to <run_dir>/exception.log and re-raised; metric loggers are
        always finalized so a crashed run keeps its buffered metrics."""
        try:
            return fn()
        except Exception:
            if is_host_zero():
                import traceback

                path = self.save_dir / "exception.log"
                with open(path, "a") as f:
                    f.write(traceback.format_exc() + "\n")
                log.error(f"task failed; traceback saved to {path}")
            raise
        finally:
            self.loggers.finalize()

    def fit(self) -> Dict[str, Any]:
        return self._run_task(self._fit)

    def _fit(self) -> Dict[str, Any]:
        profiler = self.cfg.get("trainer", ConfigNode()).get("profiler")
        tracing = profiler == "jax" and is_host_zero()
        if tracing:
            jax.profiler.start_trace(str(self.save_dir / "profile"))
        # quantize=int8 is serving-only (_int8_serving_active): the encode fn is
        # memoized (directly AND captured inside the cached GridScorer), so the
        # fit-scoped fp routing must not leak into a later test()/predict()
        # (nor a pre-fit int8 encoder into the fit) — drop both caches at both
        # edges when the knob is set
        self._in_fit = True
        if self.net_cfg.quantize != "none":
            self._encode_frames_jit = None
            self._scorer_cache = None
        try:
            return self._fit_body()
        finally:
            self._in_fit = False
            if self.net_cfg.quantize != "none":
                self._encode_frames_jit = None
                self._scorer_cache = None
            # stop on the exception path too: a crashed profiled run must still
            # finalize its trace (the crashing step is the interesting one)
            if tracing:
                jax.profiler.stop_trace()
            loader = getattr(self, "_train_loader", None)
            if loader is not None and hasattr(loader, "close"):
                loader.close()
            # restore even when the previous handler was None (installed from
            # C): a separate installed-flag avoids overloading None as both
            # "never installed" and "prior handler was None"
            if getattr(self, "_sigterm_installed", False):
                import signal as _signal

                _signal.signal(_signal.SIGTERM, self._old_sigterm)
                self._sigterm_installed = False
                self._old_sigterm = None

    def _fit_body(self) -> Dict[str, Any]:
        cfg = self.cfg
        trainer_cfg = cfg.get("trainer", ConfigNode())
        fast_dev_run = bool(trainer_cfg.get("fast_dev_run"))
        max_epochs = 1 if fast_dev_run else int(trainer_cfg.get("max_epochs", 50))

        self.compute_ncentroid(
            limit=1 if fast_dev_run else None
        )

        # kept on self so _fit's finally can join the worker pool even when an
        # epoch raises (multirun trials share one process). Multi-host: each
        # process's loader yields only its block of every global batch
        # (per-rank ingest; _prepare_batch assembles the global array)
        train_loader = self._train_loader = self.datamodule.train_dataloader(
            shard=(jax.process_index(), jax.process_count())
        )
        overfit_batches = int(trainer_cfg.get("overfit_batches") or 0)
        steps_per_epoch = _limit_count(
            len(train_loader), trainer_cfg.get("limit_train_batches")
        )
        if overfit_batches:
            # train on the same few batches every epoch (Lightning overfit_batches;
            # reference: configs/debug/overfit.yaml) — epoch shuffling is pinned
            steps_per_epoch = min(steps_per_epoch, overfit_batches)
        if fast_dev_run:
            steps_per_epoch = 1
        if steps_per_epoch == 0:
            raise RuntimeError("empty train loader (batch_size larger than dataset?)")

        tx = build_optimizer(
            dict(cfg.model.solver),
            dict(cfg.model.get("optimizer", {})),
            dict(cfg.model.get("scheduler", {})),
            steps_per_epoch,
        )
        lr_schedule = base_lr_schedule(
            dict(cfg.model.solver), dict(cfg.model.get("scheduler", {})), steps_per_epoch
        )
        train_step = self._build_train_step(tx)

        state = self.init_state(tx)
        start_epoch = 0
        ckpt_path = cfg.get("ckpt_path")
        if ckpt_path:
            template = {
                "trainable": state.trainable,
                "opt_state": state.opt_state,
                "bn_state": state.bn_state,
                "step": np.zeros((), np.int32),
                "epoch": np.zeros((), np.int64),
            }
            restored = self.ckpt.restore(ckpt_path, template=template)
            state = TrainState(
                trainable=restored["trainable"],
                opt_state=restored["opt_state"],
                bn_state=BNState(
                    jnp.asarray(restored["bn_state"].mean),
                    jnp.asarray(restored["bn_state"].var),
                ),
                step=jnp.asarray(restored["step"], jnp.int32),
            )
            start_epoch = int(restored["epoch"]) + 1
            log.info(f"resumed from {ckpt_path} at epoch {start_epoch}")

        state = replicate(state, self.mesh)
        frozen = replicate(self.frozen, self.mesh)
        ncentroid = replicate(jnp.asarray(self.ncentroid), self.mesh)

        callbacks_cfg = cfg.get("callbacks") or ConfigNode()  # callbacks: null ok
        if callbacks_cfg.get("model_summary", True):
            self._log_model_summary(state)

        # early stopping (reference: configs/callbacks/early_stopping.yaml)
        es_cfg = callbacks_cfg.get("early_stopping") or None
        es_monitor = es_cfg.get("monitor", "auc_roc") if es_cfg else None
        es_patience = int(es_cfg.get("patience", 3)) if es_cfg else 0
        es_mode = str(es_cfg.get("mode", "max")) if es_cfg else "max"
        es_min_delta = float(es_cfg.get("min_delta", 0.0)) if es_cfg else 0.0
        es_best: Optional[float] = None
        es_bad_epochs = 0

        key = jax.random.PRNGKey(self.seed + 17)
        last_val: Dict[str, Any] = {}

        # ---- preemption safety -------------------------------------------
        # TPU preemptions/maintenance deliver SIGTERM with a grace period. On
        # receipt, persist the newest *epoch-boundary* state as a normal
        # checkpoint and raise TrainingPreempted: resume via ckpt_path=.../last
        # re-runs the interrupted epoch from its start (no partial-epoch
        # optimizer state is saved, so resumed numerics equal an uninterrupted
        # run of that epoch). Off switch: trainer.preempt_save=false.
        import signal as _signal
        import threading as _threading

        preempt_flag = {"set": False}
        preempt_armed = bool(trainer_cfg.get("preempt_save", True)) and (
            _threading.current_thread() is _threading.main_thread()
        )
        if preempt_armed:

            def _on_sigterm(signum, frame):
                # async-signal-safe: only flip the flag — logging here can
                # re-enter a buffered stream mid-write and raise a reentrancy
                # RuntimeError that would bypass the checkpoint save entirely
                preempt_flag["set"] = True

            # restored by _fit's finally (survives any exception below)
            self._old_sigterm = _signal.signal(_signal.SIGTERM, _on_sigterm)
            self._sigterm_installed = True

        # newest completed epoch boundary. NOTE: merely holding the device
        # pytree is NOT enough — the next epoch's first train_step DONATES
        # the state argument (donate_argnums), which deletes the underlying
        # device buffers out from under any alias, so each boundary is
        # snapshotted to host numpy (below). This initial reference is never
        # saved (boundary_epoch == last_saved_epoch / < 0 guards), so it can
        # stay a device alias
        boundary_epoch, boundary_state = start_epoch - 1, state
        last_saved_epoch = start_epoch - 1  # skip re-serializing in the grace window
        multi_host = jax.process_count() > 1
        # multi-host flag-allgather cadence: each poll is a host-level sync, so
        # polling every step would serialize async dispatch; every K steps keeps
        # the grace-window response under a few seconds at negligible cost
        preempt_poll_steps = max(
            1, int(trainer_cfg.get("preempt_poll_every_n_steps", 8))
        )

        def _global_flag() -> bool:
            """The synchronized stop decision. Hosts observe SIGTERM at
            different wall times; a host stopping unilaterally would strand
            its peers inside a train-step collective (distributed deadlock).
            Multi-host: a tiny flag allgather at an IDENTICAL program point on
            every host — only epoch-boundary sites call this — makes the
            decision global even when the signal reached a subset of hosts."""
            if not multi_host:
                return preempt_flag["set"]
            from jax.experimental import multihost_utils

            return bool(
                np.any(multihost_utils.process_allgather(np.asarray(preempt_flag["set"])))
            )

        def _handle_preempt(during_epoch: int) -> None:
            nonlocal last_saved_epoch
            if not _global_flag():
                return
            log.warning("SIGTERM received: checkpointing the last epoch boundary")
            save_error: Optional[BaseException] = None
            # EVERY host calls save_epoch: the Orbax save is itself a
            # collective (checkpoint.py:save_epoch) — the boundary/epoch guards
            # evaluate identically on all hosts, so the call sites align
            if boundary_epoch >= 0 and boundary_epoch != last_saved_epoch:
                # a failed save (disk full, GCS error) must NOT strand the other
                # hosts in the barrier below until the preemption kill: catch,
                # reach the sync like everyone else, then surface the error
                try:
                    self.ckpt.save_epoch(
                        boundary_epoch,
                        {
                            "trainable": boundary_state.trainable,
                            "opt_state": boundary_state.opt_state,
                            "bn_state": boundary_state.bn_state,
                            "step": np.asarray(boundary_state.step),
                            "epoch": np.asarray(boundary_epoch),
                        },
                    )
                    last_saved_epoch = boundary_epoch
                    log.warning(
                        f"preemption checkpoint saved at epoch {boundary_epoch}; "
                        f"resume with ckpt_path={self.ckpt.ckpt_dir / 'last'}"
                    )
                except Exception as e:  # noqa: BLE001 — deliberate catch-all
                    save_error = e
                    log.error(f"preemption checkpoint save FAILED: {e!r}")
            if multi_host:
                # every host raises from this same call site (the decision was
                # global), so all meet here and none exits — tearing down the
                # coordination service — while host zero is still writing
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("preempt_checkpoint_saved")
            if save_error is not None:
                raise TrainingPreempted(
                    f"preempted during epoch {during_epoch} and the boundary "
                    f"checkpoint save failed: {save_error!r}"
                ) from save_error
            if boundary_epoch < 0:
                raise TrainingPreempted(
                    f"preempted during epoch {during_epoch} before any epoch "
                    "completed — no checkpoint written; restart from scratch"
                )
            raise TrainingPreempted(
                f"preempted during epoch {during_epoch} "
                f"(saved boundary: epoch {boundary_epoch})"
            )

        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(0 if overfit_batches else epoch)
            metric_sums = replicate(self._zero_metric_sums(), self.mesh)
            count = 0
            t0 = time.time()
            for batch_idx, batch in enumerate(train_loader):
                if batch_idx >= steps_per_epoch:
                    break
                # per-step responsiveness on one host; multi-host polls the
                # flag allgather every K steps — every host reaches the same
                # (epoch, batch_idx) program point (steps_per_epoch is the
                # identical global loader length on all hosts), so the
                # collective is deadlock-safe and a SIGTERM early in a long
                # epoch checkpoints within K steps instead of burning the
                # whole grace period reaching the epoch boundary
                if not multi_host or batch_idx % preempt_poll_steps == 0:
                    _handle_preempt(epoch)
                key, step_key = jax.random.split(key)
                state, metric_sums = train_step(
                    frozen, state, self._prepare_batch(batch), ncentroid, step_key,
                    metric_sums,
                )
                count += 1
            # the epoch's steps all ran: this state is a resumable boundary.
            # Snapshot it to HOST memory — the next epoch's first train_step
            # donates state's buffers, and a donated-then-deleted alias would
            # make every mid-epoch preemption save fail ("Array has been
            # deleted"). One small (trainable+opt+BN) blocking transfer per
            # epoch, alongside the existing per-epoch metrics transfer; the
            # regular per-epoch checkpoint below serializes THIS snapshot, so
            # the transfer is shared, not added. Skipped when it would have no
            # consumer (preemption saving off AND no checkpoint due this epoch)
            boundary_epoch = epoch
            ckpt_due = (
                not fast_dev_run and (epoch + 1) % self._ckpt_every_n_epochs == 0
            )
            if preempt_armed or ckpt_due:
                boundary_state = jax.tree_util.tree_map(np.asarray, state)
            else:
                boundary_state = state  # alias fine: _handle_preempt never fires
            _handle_preempt(epoch)
            # single blocking device->host transfer per epoch
            epoch_metrics = {
                k: float(v) / max(count, 1) for k, v in metric_sums.items()
            }
            if callbacks_cfg.get("lr_logger", True):
                # reference: LearningRateMonitor (configs/callbacks/default.yaml);
                # the LR in effect during THIS epoch (per-epoch schedule)
                epoch_metrics["train/lr"] = float(
                    lr_schedule(epoch * steps_per_epoch)
                )
            epoch_metrics["train/epoch_time_s"] = time.time() - t0
            log.info(
                f"epoch {epoch}: loss={epoch_metrics.get('train/loss', float('nan')):.4f} "
                f"({count} steps, {epoch_metrics['train/epoch_time_s']:.1f}s)"
            )
            self.loggers.log_metrics(epoch_metrics, step=epoch)

            # ---- validation (every epoch, like the reference) ----
            check_every = int(trainer_cfg.get("check_val_every_n_epoch", 1) or 1)
            validated_this_epoch = (epoch + 1) % check_every == 0
            if validated_this_epoch:
                val_limit = _limit_count(
                    len(self.datamodule.val_dataloader()),
                    1 if fast_dev_run else trainer_cfg.get("limit_val_batches"),
                )
                # a SIGTERM mid-validation must not burn the grace period on
                # scoring: bail between videos. Multi-host, the stop decision
                # is made global inside evaluate_videos before its gather
                # collective, so a preempted host cannot strand its peers;
                # _handle_preempt below then checkpoints the epoch boundary
                last_val = self.validate(
                    state, epoch, limit=val_limit,
                    should_stop=lambda: preempt_flag["set"],
                )
                self.loggers.log_metrics(
                    {
                        f"test/{k}": last_val[j]
                        for k, j in [
                            ("AUC", "auc_roc"),
                            ("AP", "auc_pr"),
                            ("mAUC", "mean_mc_auroc"),
                            ("mAP", "mean_mc_aupr"),
                        ]
                        if j in last_val and np.isfinite(last_val[j])
                    },
                    step=epoch,
                )

            # early stopping counts only epochs with a FRESH validation — with
            # check_val_every_n_epoch > 1, stale metrics must not burn patience
            if es_monitor and last_val and validated_this_epoch:
                value = last_val.get(es_monitor)
                if value is not None and np.isfinite(value):
                    improved = es_best is None or (
                        value > es_best + es_min_delta
                        if es_mode == "max"
                        else value < es_best - es_min_delta
                    )
                    if improved:
                        es_best, es_bad_epochs = float(value), 0
                    else:
                        es_bad_epochs += 1

            if (
                not fast_dev_run
                and (epoch + 1) % self._ckpt_every_n_epochs == 0
            ):
                # all hosts: the Orbax save is collective (checkpoint.py).
                # Serialize the boundary host snapshot (same values as state;
                # np.asarray inside the saver is then a no-op, so the device
                # transfer already paid for the snapshot is the only one)
                self.ckpt.save_epoch(
                    epoch,
                    {
                        "trainable": boundary_state.trainable,
                        "opt_state": boundary_state.opt_state,
                        "bn_state": boundary_state.bn_state,
                        "step": np.asarray(boundary_state.step),
                        "epoch": np.asarray(epoch),
                    },
                )
                last_saved_epoch = epoch

            _handle_preempt(epoch)  # a SIGTERM during validation lands here

            if es_monitor and es_bad_epochs >= es_patience > 0:
                log.info(
                    f"early stopping at epoch {epoch}: {es_monitor} did not improve "
                    f"for {es_bad_epochs} epochs (best {es_best:.4f})"
                )
                break

        self._final_state = state
        return last_val

    # ------------------------------------------------------------------ eval

    def _scorer(self, state: TrainState) -> GridScorer:
        """Cached scorer: the jitted executable persists across epochs; only the
        parameters are swapped (kills the per-epoch revalidation recompiles)."""
        if getattr(self, "_scorer_cache", None) is None or self._scorer_cache.model is not self.model:
            self._scorer_cache = GridScorer(
                self.model, encode_jit=self._encode_jit(), mesh=self._eval_mesh()
            )
        trainable, bn_state = state.trainable, state.bn_state
        if jax.process_count() > 1:
            # evaluation runs per-host on LOCAL devices (videos are sharded
            # across hosts); mid-fit the state is committed to the GLOBAL mesh,
            # and a direct device_put onto the local eval mesh would be a
            # cross-host transfer. The state is fully replicated, so a host
            # numpy copy is addressable-local — re-placement is then local.
            trainable = jax.tree_util.tree_map(np.asarray, trainable)
            bn_state = BNState(np.asarray(bn_state.mean), np.asarray(bn_state.var))
        return self._scorer_cache.update(
            self._text_frozen(), trainable, bn_state,
            jnp.asarray(self.ncentroid),
        )

    def _text_frozen(self):
        """Device copy of the text subtree only, memoized: the scorer's
        per-epoch text-feature refresh must neither re-upload nor even touch
        the visual tower (host-resident by design; under TP only its shards
        live on devices). Frame encoding goes through the encode_jit the
        scorer was built with, so the visual leaves are never needed here."""
        if getattr(self, "_text_frozen_dev", None) is None:
            self._text_frozen_dev = {
                "clip": {
                    "text": jax.tree_util.tree_map(
                        jnp.asarray, self.frozen["clip"]["text"]
                    )
                }
            }
        return self._text_frozen_dev

    def validate(
        self,
        state: TrainState,
        epoch: int,
        limit: Optional[int] = None,
        should_stop=None,
    ) -> Dict:
        """Validation epoch -> detection metrics + metrics_{epoch}.json
        (anomaly_clip_module.py:301-404). ``should_stop`` (polled between
        videos) aborts with {} — the preemption path; no partial metrics are
        written or logged."""
        scorer = self._scorer(state)
        # multi-host: every host scores its stride of the videos on its own
        # chips and the outputs are allgathered back to global order — the
        # reference evaluates rank-zero-only (anomaly_clip_module.py:458)
        shard = (jax.process_index(), jax.process_count())
        outputs = evaluate_videos(
            self.datamodule.val_dataloader(limit=limit, shard=shard),
            scorer, self.model,
            should_stop=should_stop,
            gather_processes=jax.process_count() > 1,
        )
        if not outputs:
            return {}
        det = detection_metrics(
            outputs["abnormal_scores"],
            outputs["labels"],
            outputs["class_probs"],
            self.net_cfg.normal_id,
            self.datamodule.num_classes,
        )
        metrics = {
            "epoch": epoch,
            "auc_roc": det["auc_roc"],
            "auc_pr": det["auc_pr"],
            "mean_mc_auroc": det["mean_mc_auroc"],
            "mean_mc_aupr": det["mean_mc_aupr"],
            "mc_auroc": det["mc_auroc"],
            "mc_aupr": det["mc_aupr"],
            "optimal_threshold": det["optimal_threshold"],
        }
        if is_host_zero():
            write_metrics_json(self.save_dir, metrics, epoch=epoch)
        log.info(
            f"val epoch {epoch}: AUC={det['auc_roc']:.4f} AP={det['auc_pr']:.4f} "
            f"mAUC={det['mean_mc_auroc']:.4f} mAP={det['mean_mc_aupr']:.4f}"
        )
        return metrics

    def load_state(self, ckpt_path: str) -> TrainState:
        """Restore a TrainState from an Orbax dir or a reference Lightning .ckpt
        (converted in place; the model is rebuilt around the checkpoint's own
        CLIP when its shapes differ). Shared by test() and the predict CLI."""
        if str(ckpt_path).endswith(".ckpt") and Path(ckpt_path).is_file():
            # released reference checkpoint (Lightning .ckpt): convert in place
            # (reference contract: src/eval.py:73, README.md:72-76). The model is
            # rebuilt around the checkpoint's own CLIP weights/shapes so the
            # eval is self-contained regardless of the session's clip_init.
            from anomalyclip_tpu.convert_ckpt import (
                convert_lightning_checkpoint,
                converted_clip_config,
                load_lightning_state_dict,
            )

            sd = load_lightning_state_dict(ckpt_path)  # one disk load, shared
            frozen, trainable, bn_state = convert_lightning_checkpoint(sd)
            return self.adopt_converted_state(
                frozen, trainable, bn_state, converted_clip_config(sd)
            )
        restored = self.ckpt.restore(ckpt_path)
        ctx = np.asarray(restored["trainable"]["prompt_ctx"])
        if ctx.shape[-1] != self.model.prompt_spec.ctx_dim:
            raise ValueError(
                f"checkpoint prompt ctx dim {ctx.shape[-1]} does not match "
                f"the session's CLIP text width {self.model.prompt_spec.ctx_dim} "
                "— evaluate with the model config the checkpoint was trained "
                "with (a converted Orbax dir carries only the trainable "
                "params; pass the original .ckpt instead for a self-contained "
                "eval that rebuilds the model around its own CLIP)"
            )
        return TrainState(
            trainable=restored["trainable"],
            opt_state=None,
            bn_state=restored["bn_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )

    def adopt_converted_state(
        self, frozen, trainable, bn_state: BNState, clip_cfg
    ) -> TrainState:
        """Swap this module onto already-converted parameter trees (the output
        of convert_ckpt.convert_lightning_checkpoint, or any equivalent trees
        such as the frozen golden fixtures in tests/golden/): rebuild the model
        around the trees' own CLIP and invalidate every compiled/placed cache.
        """
        import dataclasses

        n_ctx = int(np.asarray(trainable["prompt_ctx"]).shape[-2])
        # rebuild unconditionally: prompt_spec (token prefix/suffix, EOT
        # indices) is derived from the token embedding, so even a same-shape
        # config must not keep a spec computed from the *session's* CLIP
        # while the frozen weights are swapped to the adopted trees'
        self.net_cfg = dataclasses.replace(self.net_cfg, n_ctx=n_ctx)
        self.model, _ = AnomalyCLIP.build(self.net_cfg, frozen["clip"], clip_cfg)
        self._encode_frames_jit = None  # stale jit for the old model
        self._scorer_cache = None  # and stale scorer executables
        self._frozen_dev = None  # and the stale single-device placement
        self._text_frozen_dev = None  # and the stale text-subtree copy
        # host-resident: device placement stays explicit and path-aware so
        # the TP path can stream shards without a full copy on device 0
        self.frozen = jax.tree_util.tree_map(np.asarray, frozen)
        return TrainState(
            trainable=jax.tree_util.tree_map(jnp.asarray, trainable),
            opt_state=None,
            bn_state=BNState(jnp.asarray(bn_state.mean), jnp.asarray(bn_state.var)),
            step=jnp.zeros((), jnp.int32),
        )

    def test(
        self,
        ckpt_path: Optional[str] = None,
        state: Optional[TrainState] = None,
        limit: Optional[int] = None,
    ) -> Dict:
        """Full test pass + artifacts (anomaly_clip_module.py:459-691)."""
        if state is None:
            if ckpt_path is None:
                raise ValueError("test() needs a checkpoint path or a TrainState")
            state = self.load_state(ckpt_path)
        if self.ncentroid is None:
            self.compute_ncentroid()

        trainer_cfg = self.cfg.get("trainer", ConfigNode())
        limit = limit if limit is not None else trainer_cfg.get("limit_test_batches")
        test_loader = self.datamodule.test_dataloader(
            limit=_limit_count(len(self.datamodule.test_dataloader()), limit),
            shard=(jax.process_index(), jax.process_count()),
        )

        on_video = None
        if self.datamodule.cfg.visualize:
            from anomalyclip_tpu.eval.visualizer import Visualizer

            viz = Visualizer(
                normal_id=self.net_cfg.normal_id,
                labels_file=self.datamodule.cfg.labels_file,
                image_tmpl=self.datamodule.cfg.image_tmpl,
                save_dir=self.save_dir,
                frame_step=self.datamodule.cfg.visualize_frame_step,
            )
            on_video = viz.process_video

        scorer = self._scorer(state)
        outputs = evaluate_videos(
            test_loader, scorer, self.model, on_video=on_video,
            gather_processes=jax.process_count() > 1,
        )
        if not outputs:
            # empty test pass (limit_test_batches=0 / empty annotation file):
            # mirror validate()'s guard instead of a KeyError on the metrics
            log.warning("test pass scored zero videos — no metrics written")
            return {}

        from anomalyclip_tpu.models.anomaly_clip import read_classnames

        # every host computes the same metrics from the identical gathered
        # arrays (sweeps/early-exit logic must agree across hosts); exactly one
        # writes the metrics.json + plot artifacts
        metrics = write_test_artifacts(
            self.save_dir,
            outputs["abnormal_scores"],
            outputs["labels"],
            outputs["class_probs"],
            self.net_cfg.normal_id,
            self.datamodule.num_classes,
            read_classnames(self.datamodule.cfg.labels_file),
            write_files=is_host_zero(),
        )
        if is_host_zero():
            log.info(
                f"test: AUC={metrics['auc_roc']:.4f} AP={metrics['auc_pr']:.4f} "
                f"(artifacts in {self.save_dir})"
            )
        return metrics
