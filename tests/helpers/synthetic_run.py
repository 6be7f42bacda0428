"""Shared helper: compose a synthetic-experiment config rooted in a tmp dir."""

from __future__ import annotations

import os
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]


def synthetic_cfg(tmp_path: Path, *overrides: str):
    os.environ["PROJECT_ROOT"] = str(REPO_ROOT)
    os.environ["SYNTHETIC_ROOT"] = str(tmp_path / "synthetic")
    os.environ["LOG_DIR"] = str(tmp_path / "logs")
    from anomalyclip_tpu.config import compose

    return compose(
        REPO_ROOT / "configs",
        "train",
        ["experiment=synthetic", "data.num_workers=2", *overrides],
    )
