"""Deterministic input builders shared by scripts/gen_golden.py (torch in the
loop, freezes the fixtures) and tests/test_golden.py (torch-free re-check).

The seeds match tests/test_full_pipeline_oracle.py exactly, so the frozen
trajectory is the one the slow oracle test proves equal to the reference's
torch optimizer chain."""

from __future__ import annotations

import numpy as np


def abnormal_classes(num_classes: int, normal_id: int):
    return [c for c in range(num_classes) if c != normal_id]


def train_forward_inputs(num_classes: int, normal_id: int, n: int, l: int, d: int):
    """The oracle's train-forward batch: rng(123), 4 abnormal + 4 normal."""
    b = 8
    rng = np.random.default_rng(123)
    feats = rng.standard_normal((b, 1, n * l, d)).astype(np.float32)
    abn = abnormal_classes(num_classes, normal_id)
    labels = np.array(
        [abn[i % len(abn)] for i in range(b // 2)] + [normal_id] * (b // 2),
        dtype=np.int64,
    )
    return feats, labels


def trajectory_batches(num_classes: int, normal_id: int, n: int, l: int, d: int):
    """The slow oracle's 3-step batches: rng(77), 4 abnormal + 4 normal each."""
    half = 4
    rng = np.random.default_rng(77)
    abn = abnormal_classes(num_classes, normal_id)
    batches = []
    for k in range(3):
        feats = rng.standard_normal((2 * half, n * l, d)).astype(np.float32)
        labels = np.array(
            [abn[(k + i) % len(abn)] for i in range(half)] + [normal_id] * half,
            dtype=np.int64,
        )
        batches.append((feats, labels))
    return batches
