"""AnomalyCLIP-TPU: a TPU-native (JAX/XLA/Pallas) framework for joint video anomaly
detection and recognition in CLIP latent space.

This is a from-scratch rebuild of the capabilities of the AnomalyCLIP reference
(lucazanella/AnomalyCLIP, arXiv 2310.02835 / CVIU 2024) designed for TPU hardware:

- All numerics are pure JAX functions over parameter pytrees, jit-compiled onto the
  MXU with static shapes and `lax` control flow.
- Data parallelism is expressed with `jax.sharding.Mesh` + NamedSharding; XLA inserts
  the collectives (replacing the reference's Lightning DDP/NCCL stack).
- Hot kernels (ViT attention, the axial transformer over the segment x frame grid)
  have fused Pallas implementations in `anomalyclip_tpu.ops.pallas`.

Layout:
    models/    CLIP ViT-B/16 + text encoder, CoOp prompt learner, MIL selector,
               axial temporal model, loss (reference: src/models/components/)
    data/      annotation parsing, TSN sampling, feature/frame sources, batching
               (reference: src/data/)
    train/     optax optimization, train loop, checkpointing (reference:
               pytorch_lightning Trainer + src/models/anomaly_clip_module.py)
    eval/      per-video scoring, metrics, artifacts (reference:
               src/models/anomaly_clip_module.py test paths)
    parallel/  mesh + sharding helpers (reference: configs/trainer/ddp.yaml)
    config/    YAML config composition compatible with the reference's Hydra tree
"""

__version__ = "0.1.0"
