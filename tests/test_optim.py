"""LR-schedule parity vs a torch re-implementation of the reference's
WarmupCosineAnnealingLR (reference: src/models/components/scheduler.py:21-68),
including the warmup_powers / warmup_lrs / final_factor knobs the configs can
set. The reference steps once per epoch; the optax schedule is a function of
floor(step / steps_per_epoch)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from anomalyclip_tpu.train.optim import warmup_cosine_schedule


def reference_lr(epoch, base_lr, warmup_epochs, total_epoch, final_factor,
                 warmup_power, warmup_lr):
    """scheduler.py:30-68 for one param group."""
    if warmup_epochs and epoch < warmup_epochs:
        progress = epoch / warmup_epochs
        factor = progress**warmup_power
        return factor * (base_lr - warmup_lr) + warmup_lr
    progress = (epoch - warmup_epochs) / (total_epoch - warmup_epochs)
    progress = min(progress, 1.0)
    cosine = (math.cos(math.pi * progress) + 1) / 2
    return base_lr * (cosine * (1 - final_factor) + final_factor)


@pytest.mark.parametrize(
    "warmup,total,final_factor,power,wlr",
    [
        (5, 50, 0.0, 1.0, 0.0),   # the shipped configs (ucfcrime/sht/xd)
        (0, 50, 0.0, 1.0, 0.0),   # no warmup
        (5, 100, 0.1, 2.0, 1e-6), # all knobs engaged
    ],
)
def test_schedule_matches_reference(warmup, total, final_factor, power, wlr):
    base_lr = 1e-4
    steps_per_epoch = 7
    sched = warmup_cosine_schedule(
        base_lr, warmup, total, steps_per_epoch,
        final_factor=final_factor, warmup_power=power, warmup_lr=wlr,
    )
    for epoch in range(total + 10):
        want = reference_lr(epoch, base_lr, warmup, total, final_factor, power, wlr)
        for step_in_epoch in (0, steps_per_epoch - 1):
            got = float(sched(np.int32(epoch * steps_per_epoch + step_in_epoch)))
            # schedule computes in fp32 (cos near pi loses ~2e-6 relative)
            assert got == pytest.approx(want, rel=5e-5, abs=1e-11), (epoch, step_in_epoch)


def test_epoch_zero_trains_at_zero_lr():
    """The reference quirk: with warmup, epoch 0 runs at lr=0 (WarmupLR.get_lr
    progress = 0/warmup at last_epoch=0)."""
    sched = warmup_cosine_schedule(1e-4, 5, 50, 3)
    assert float(sched(np.int32(0))) == 0.0
    assert float(sched(np.int32(2))) == 0.0   # still epoch 0
    assert float(sched(np.int32(3))) > 0.0    # epoch 1
