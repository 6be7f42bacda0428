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

Two variants:

1. ``tp_encode_images``/``tp_encode_text`` — GSPMD-automatic: the specs are
   constraints, XLA propagates them through the ``lax.scan`` and inserts the
   collectives. Works for any tower unchanged, but the schedule is
   near-Megatron rather than exact: the qkv weight is stored packed as
   ``(layers, W, [q|k|v])``, so contiguous mp-chunks straddle the q/k/v
   sections and GSPMD adds resharding permutes on top of the two Megatron
   all-reduces (measured on the compiled 2x4 scan body: 3 all-reduces +
   7 collective-permutes per block).
2. ``tp_encode_images_aligned`` + ``shard_clip_params_aligned`` — the
   exact-Megatron schedule: qkv columns are pre-permuted head-aligned at
   placement time and an explicit ``jax.shard_map`` transformer makes every
   matmul shard-local, leaving exactly one psum after the attention
   out-projection and one after the MLP down-projection per block, zero
   permutes (asserted on the compiled HLO in tests/test_tensor_parallel.py).
   Requires ``mp | heads``; this is the serving-path variant.

Useful when the tower outgrows one chip's HBM or latency budget (ViT-L/14@336,
or batch spikes in serving); for ViT-B/16 training, pure DP remains the
measured optimum (docs/performance.md).

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


# ---------------------------------------------------------------------------
# Head-aligned TP: the exact-Megatron schedule (2 psums per block, no permutes)
# ---------------------------------------------------------------------------


def _qkv_head_perm(width: int, mp: int) -> np.ndarray:
    """Column permutation of the packed ``[q|k|v]`` projection dim so each of the
    ``mp`` contiguous chunks holds ``[q_S | k_S | v_S]`` for that device's head
    subset S. This is what makes a plain contiguous PartitionSpec on the last dim
    land exactly on head boundaries — the packed layout's chunks otherwise
    straddle the q/k/v sections (see module docstring)."""
    per = width // mp
    cols = []
    for m in range(mp):
        for section in range(3):
            start = section * width + m * per
            cols.append(np.arange(start, start + per))
    return np.concatenate(cols)


def shard_clip_params_aligned(params: Any, mesh: Mesh) -> Any:
    """Place a ViT CLIP param tree for tp_encode_images_aligned: identical specs
    to shard_clip_params, but the visual blocks' qkv projection columns are
    pre-permuted head-aligned (weights are placed once; the O(params) permute is
    off the hot path). Only valid together with tp_encode_images_aligned — the
    permuted layout breaks the stock ``jnp.split(qkv, 3)`` forward."""
    mp = mesh.shape[MODEL_AXIS]
    width = params["visual"]["blocks"]["attn"]["qkv_w"].shape[1]
    heads = width // 64  # CLIP ViT convention: head dim is always 64 (model.py)
    if heads % mp or width % mp:
        raise ValueError(
            f"head-aligned TP needs mp | heads: width={width}, heads={heads}, mp={mp}"
        )
    perm = _qkv_head_perm(width, mp)
    params = dict(params)
    visual = dict(params["visual"])
    blocks = jax.tree_util.tree_map(lambda x: x, visual["blocks"])  # shallow copy
    attn = dict(blocks["attn"])
    # permute on the HOST (numpy): jnp.asarray here would commit the full
    # unsharded qkv stack — the largest weight group — to device 0 before
    # sharding, breaking the streamed-into-placement capacity property
    attn["qkv_w"] = np.asarray(attn["qkv_w"])[:, :, perm]
    attn["qkv_b"] = np.asarray(attn["qkv_b"])[:, perm]
    blocks = {**blocks, "attn": attn}
    visual["blocks"] = blocks
    params["visual"] = visual
    return shard_clip_params(params, mesh)


def tp_encode_images_aligned(cfg, mesh: Mesh, compute_dtype="float32") -> Callable:
    """-> jitted ``(params, images) -> (B, embed_dim)``: the visual tower with an
    explicit shard_map transformer whose collective schedule is exactly Megatron —
    one psum after the attention out-projection and one after the MLP
    down-projection per block, zero resharding permutes (the head-aligned qkv
    layout from shard_clip_params_aligned makes every matmul shard-local).

    Mirrors models/clip/model.py:_encode_image/_block_apply math exactly (fp32
    LayerNorm, QuickGELU, fp32 softmax); parity is pinned in
    tests/test_tensor_parallel.py. Requires mp | vision_heads.
    """
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import (
        layer_norm,
        matmul_precision_for,
        patchify,
        quick_gelu,
    )

    dtype = jnp.dtype(compute_dtype)
    mp = mesh.shape[MODEL_AXIS]
    heads = cfg.vision_heads
    assert heads % mp == 0, (heads, mp)
    heads_local = heads // mp
    dh = cfg.vision_width // heads
    scale = 1.0 / (dh**0.5)

    def local_blocks(x, blocks):
        """Per-device scan over layers; runs under shard_map with x replicated
        on the model axis and the block matmul weights shard-local."""
        blocks = jax.tree_util.tree_map(lambda w: w.astype(x.dtype), blocks)

        def body(carry, blk):
            h = layer_norm(carry, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
            qkv = h @ blk["attn"]["qkv_w"] + blk["attn"]["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)  # local [q_S|k_S|v_S] chunks
            b, l, _ = q.shape

            def split_heads(t):
                return t.reshape(b, l, heads_local, dh).transpose(0, 2, 1, 3)

            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", split_heads(q), split_heads(k),
                preferred_element_type=jnp.float32,
            ) * scale
            weights = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(q.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", weights, split_heads(v))
            attn = attn.transpose(0, 2, 1, 3).reshape(b, l, heads_local * dh)
            out = jax.lax.psum(attn @ blk["attn"]["out_w"], MODEL_AXIS)
            x1 = carry + out + blk["attn"]["out_b"]

            h2 = layer_norm(x1, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
            mid = quick_gelu(h2 @ blk["mlp"]["fc_w"] + blk["mlp"]["fc_b"])
            proj = jax.lax.psum(mid @ blk["mlp"]["proj_w"], MODEL_AXIS)
            return x1 + proj + blk["mlp"]["proj_b"], None

        x, _ = jax.lax.scan(body, x, blocks)
        return x

    blocks_sm = jax.shard_map(
        local_blocks,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), _blocks_specs()),
        out_specs=P(DATA_AXIS),
    )

    def fn(params, images):
        visual = params["visual"]
        if images.dtype == jnp.uint8:
            from anomalyclip_tpu.models.clip.model import normalize_frames_on_device

            images = normalize_frames_on_device(images)
        with matmul_precision_for(dtype):
            x = patchify(images.astype(dtype), cfg.vision_patch_size)
            x = x @ visual["patch_embed"].astype(dtype)
            b = x.shape[0]
            cls = jnp.broadcast_to(
                visual["class_embedding"].astype(dtype), (b, 1, cfg.vision_width)
            )
            x = jnp.concatenate([cls, x], axis=1)
            x = x + visual["positional_embedding"].astype(dtype)
            x = layer_norm(x, visual["ln_pre"]["scale"], visual["ln_pre"]["bias"])
            x = blocks_sm(x, visual["blocks"])
            x = layer_norm(
                x[:, 0, :], visual["ln_post"]["scale"], visual["ln_post"]["bias"]
            )
            return x @ visual["proj"].astype(dtype)

    batch = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(fn, in_shardings=(None, batch), out_shardings=batch)


def tp_encode_text(cfg, mesh: Mesh, compute_dtype="float32") -> Callable:
    """-> jitted ``(params, tokens) -> (B, embed_dim)`` with the text tower
    TP-sharded."""
    from anomalyclip_tpu.models.clip.model import encode_text

    return _tp_encode(encode_text, cfg, mesh, compute_dtype)
