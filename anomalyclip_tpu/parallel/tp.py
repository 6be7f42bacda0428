"""Tensor parallelism for the CLIP towers over a 2-D (data, model) mesh.

Data parallelism is this model's optimal training layout (parallel/mesh.py): the
trainable net is tiny next to the frozen encoder, so replicating parameters and
sharding the batch is bandwidth-optimal on ICI. This module is the *serving /
big-tower* complement: Megatron-style sharding of the scan-stacked transformer
weights so one image batch is encoded cooperatively by ``mp`` chips —

- qkv and MLP up-projections split on their *output* feature dim (each chip
  computes a slice of heads / hidden units with no communication),
- out- and MLP down-projections split on their *input* feature dim (each chip
  contracts its slice; XLA inserts one psum over the model axis per projection),
- everything small (LayerNorms, embeddings, the final projections) replicated.

The specs are constraints, not a hand-written schedule: GSPMD propagates them
through the ``lax.scan`` over stacked layers and inserts the collectives. The
schedule is near-Megatron rather than exact: the qkv weight is stored packed as
``(layers, W, [q|k|v])``, so when ``mp`` does not divide the three sections
head-aligned, the ``jnp.split``/head reshape cuts across shard boundaries and
GSPMD adds resharding permutes on top of the two Megatron all-reduces (measured
on the compiled 2x4 scan body: 3 all-reduces + 7 collective-permutes per block,
moving activation-sized chunks — same order as the all-reduces themselves).
Parity is exact; the extra ICI traffic is the price of keeping one packed qkv
layout shared with the single-chip fast path. Useful when the tower outgrows
one chip's HBM or latency budget (ViT-L/14@336, or batch spikes in serving);
for ViT-B/16 training, pure DP remains the measured optimum (docs/performance.md).

The attention core is forced to the XLA path under TP: a ``pallas_call`` carries
no GSPMD partitioning rule, so GSPMD would replicate it across the model axis
(models/clip/model.py:attention_impl).

No reference analogue — the reference's only parallelism is Lightning DDP
(reference configs/trainer/ddp.yaml:3-8); this is a capability the TPU rebuild
adds on top.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from anomalyclip_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

P = PartitionSpec


def dp_mp_mesh(dp: int, mp: int, devices: Optional[Sequence] = None) -> Mesh:
    """(dp, mp) mesh: model-axis neighbors are adjacent devices, so the per-block
    psums ride the fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= dp * mp, (len(devices), dp, mp)
    grid = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _blocks_specs() -> Any:
    """PartitionSpecs for one scan-stacked block dict (leading axis = layers)."""
    rep1 = P(None, None)  # (layers, width)-shaped leaves
    return {
        "ln_1": {"scale": rep1, "bias": rep1},
        "attn": {
            "qkv_w": P(None, None, MODEL_AXIS),  # column-parallel
            "qkv_b": P(None, MODEL_AXIS),
            "out_w": P(None, MODEL_AXIS, None),  # row-parallel -> psum
            "out_b": rep1,
            },
        "ln_2": {"scale": rep1, "bias": rep1},
        "mlp": {
            "fc_w": P(None, None, MODEL_AXIS),  # column-parallel
            "fc_b": P(None, MODEL_AXIS),
            "proj_w": P(None, MODEL_AXIS, None),  # row-parallel -> psum
            "proj_b": rep1,
        },
    }


def clip_tp_specs(params: Any) -> Any:
    """PartitionSpec pytree for a (ViT) CLIP param tree: transformer blocks
    Megatron-sharded over MODEL_AXIS, every other leaf replicated. Matches the
    layout of models/clip/model.py:init_clip_params (ResNet towers are not
    TP-sharded — their attention pool is one layer; keep them on the DP path)."""

    def replicate_like(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    specs = replicate_like(params)
    for tower in ("visual", "text"):
        if tower in params and "blocks" in params[tower]:
            specs[tower]["blocks"] = _blocks_specs()
    return specs


def shard_clip_params(params: Any, mesh: Mesh) -> Any:
    """Place a CLIP param tree on the mesh with TP shardings (each device holds
    1/mp of the block weights)."""
    specs = clip_tp_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _tp_encode(encode, cfg, mesh: Mesh, compute_dtype) -> Callable:
    """jit ``(params, batch_input) -> (B, embed_dim)`` over the 2-D mesh: batch
    sharded on the data axis; params inherit their placement (in_shardings=None),
    so pass them already placed via shard_clip_params — donating re-placement
    every call would defeat the point. attention_impl("xla") is a requirement,
    not a preference: it outranks the ANOMALYCLIP_ATTN_IMPL env var, keeping
    pallas_call (no GSPMD partitioning rule) out of the partitioned jit."""
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import attention_impl

    dtype = jnp.dtype(compute_dtype)

    def fn(params, batch_input):
        with attention_impl("xla"):
            return encode(params, cfg, batch_input, dtype)

    batch = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(fn, in_shardings=(None, batch), out_shardings=batch)


def tp_encode_images(cfg, mesh: Mesh, compute_dtype="float32") -> Callable:
    """-> jitted ``(params, images) -> (B, embed_dim)`` with the visual tower
    TP-sharded."""
    from anomalyclip_tpu.models.clip.model import encode_image

    return _tp_encode(encode_image, cfg, mesh, compute_dtype)


def tp_encode_text(cfg, mesh: Mesh, compute_dtype="float32") -> Callable:
    """-> jitted ``(params, tokens) -> (B, embed_dim)`` with the text tower
    TP-sharded."""
    from anomalyclip_tpu.models.clip.model import encode_text

    return _tp_encode(encode_text, cfg, mesh, compute_dtype)
