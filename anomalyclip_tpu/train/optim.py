"""Optimization: AdamW with per-component LR groups and the warmup-cosine schedule.

Replaces the reference's torch stack (reference: anomaly_clip_module.py:693-746,
src/models/components/scheduler.py:21-68) with optax:

- four parameter groups — selector_model, temporal_model, prompt_learner,
  text_projection — each at ``solver.lr * <group>_ratio``, realized with
  ``optax.multi_transform`` over the trainable pytree's top-level keys (the
  selector group exists for config parity but owns no parameters: its BatchNorm is
  non-affine, selector_model.py:30);
- ``WarmupCosineAnnealingLR`` semantics, stepped per epoch: linear warmup from 0
  over ``warmup_epochs`` (epoch 0 trains at lr=0 — a reference quirk kept for
  parity), then cosine from the base LR to ``final_factor * base`` over
  ``total_epoch - warmup_epochs``, clamped at the end.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float,
    warmup_epochs: int,
    total_epoch: int,
    steps_per_epoch: int,
    final_factor: float = 0.0,
    warmup_power: float = 1.0,
    warmup_lr: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-epoch warmup-cosine factor applied at step granularity
    (scheduler.py:30-68: the reference updates once per epoch, so the factor is a
    function of floor(step / steps_per_epoch)). ``warmup_power``/``warmup_lr``
    mirror WarmupLR's warmup_powers/warmup_lrs knobs (scheduler.py:22-38):
    lr = (epoch/warmup)**power * (base - warmup_lr) + warmup_lr during warmup.
    The reference's ``successor`` argument is accepted there but never stored
    (scheduler.py:46-60) — dead, so it has no analogue here."""

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        epoch = jnp.asarray(step, jnp.float32) // max(steps_per_epoch, 1)
        warmup_progress = epoch / max(warmup_epochs, 1)
        warmup_lr_now = warmup_progress**warmup_power * (base_lr - warmup_lr) + warmup_lr
        progress = (epoch - warmup_epochs) / max(total_epoch - warmup_epochs, 1)
        progress = jnp.minimum(progress, 1.0)
        cosine = (jnp.cos(math.pi * progress) + 1.0) / 2.0
        cosine_factor = cosine * (1.0 - final_factor) + final_factor
        return jnp.where(epoch < warmup_epochs, warmup_lr_now, base_lr * cosine_factor)

    return schedule


# trainable pytree top-level key -> reference optimizer group name
GROUP_OF_KEY = {
    "prompt_ctx": "prompt_learner",
    "text_projection": "text_projection",
    "temporal": "temporal_model",
}


def base_lr_schedule(
    solver_cfg: Dict[str, Any],
    scheduler_cfg: Dict[str, Any],
    steps_per_epoch: int,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The base-LR schedule (group ratios excluded) — the single source for both
    the optimizer below and the lr_logger callback's train/lr metric."""
    return warmup_cosine_schedule(
        float(solver_cfg["lr"]),
        int(scheduler_cfg.get("warmup_epochs", 0)),
        int(scheduler_cfg.get("total_epoch", 50)),
        steps_per_epoch,
        final_factor=float(scheduler_cfg.get("final_factor", 0.0)),
        warmup_power=float(scheduler_cfg.get("warmup_powers", 1.0)),
        warmup_lr=float(scheduler_cfg.get("warmup_lrs", 0.0)),
    )


def build_optimizer(
    solver_cfg: Dict[str, Any],
    optimizer_cfg: Dict[str, Any],
    scheduler_cfg: Dict[str, Any],
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """AdamW (torch defaults: betas 0.9/0.999, eps 1e-8) with group LR ratios."""
    base_lr = float(solver_cfg["lr"])
    weight_decay = float(optimizer_cfg.get("weight_decay", 0.2))
    warmup = int(scheduler_cfg.get("warmup_epochs", 0))
    total = int(scheduler_cfg.get("total_epoch", 50))
    final_factor = float(scheduler_cfg.get("final_factor", 0.0))
    warmup_power = float(scheduler_cfg.get("warmup_powers", 1.0))
    # warmup_lrs is absolute per group in the reference (to_tuple of one scalar,
    # scheduler.py:24-27) — not scaled by the LR ratio
    warmup_lr = float(scheduler_cfg.get("warmup_lrs", 0.0))

    ratios = {
        "prompt_learner": float(solver_cfg.get("prompt_learner_ratio", 1)),
        "text_projection": float(solver_cfg.get("text_projection_ratio", 1)),
        "selector_model": float(solver_cfg.get("selector_model_ratio", 1)),
        "temporal_model": float(solver_cfg.get("temporal_model_ratio", 1)),
    }

    def group_tx(group: str) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=warmup_cosine_schedule(
                base_lr * ratios[group],
                warmup,
                total,
                steps_per_epoch,
                final_factor=final_factor,
                warmup_power=warmup_power,
                warmup_lr=warmup_lr,
            ),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        )

    def label_fn(trainable):
        import jax

        return {
            key: jax.tree_util.tree_map(lambda _: GROUP_OF_KEY[key], subtree)
            for key, subtree in trainable.items()
        }

    return optax.multi_transform(
        {name: group_tx(name) for name in set(GROUP_OF_KEY.values())},
        label_fn,
    )
