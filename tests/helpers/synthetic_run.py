"""Shared helper: compose a synthetic-experiment config rooted in a tmp dir."""

from __future__ import annotations

import os
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]


def synthetic_cfg(tmp_path: Path, *overrides: str):
    """Compose the synthetic experiment rooted in ``tmp_path``.

    ${oc.env:...} interpolation resolves at compose time, so the env vars are
    restored afterwards — one test's tmp paths must not leak into the next.
    """
    from anomalyclip_tpu.config import compose

    wanted = {
        "PROJECT_ROOT": str(REPO_ROOT),
        "SYNTHETIC_ROOT": str(tmp_path / "synthetic"),
        "LOG_DIR": str(tmp_path / "logs"),
    }
    saved = {k: os.environ.get(k) for k in wanted}
    os.environ.update(wanted)
    try:
        return compose(
            REPO_ROOT / "configs",
            "train",
            ["experiment=synthetic", "data.num_workers=2", *overrides],
        )
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
