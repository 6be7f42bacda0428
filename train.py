#!/usr/bin/env python
"""Training entry point.

Same invocation contract as the reference (reference: src/train.py:115-130,
README.md:80-96):

    python train.py experiment=ucfcrime
    python train.py experiment=xdviolence trainer.max_epochs=10 data.batch_size=32
    python train.py experiment=shanghaitech data.load_from_features=False

Composes configs/train.yaml with CLI overrides, trains, then tests the final
weights when ``test: True``.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def _apply_platform_overrides(argv) -> None:
    """Pick the backend before any jax device query. trainer=cpu / accelerator=cpu
    forces the host platform (the reference's configs/trainer/cpu.yaml analogue)."""
    wants_cpu = any(
        a in ("trainer=cpu", "trainer=dp_sim", "trainer.accelerator=cpu") for a in argv
    )
    if wants_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    _apply_platform_overrides(argv)

    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parent))

    from anomalyclip_tpu.config import compose
    from anomalyclip_tpu.utils.logging import get_logger

    log = get_logger("train")
    cfg = compose(Path(__file__).parent / "configs", "train", argv)
    if not cfg.get("data") or not cfg.get("model"):
        raise SystemExit(
            "No data/model configured. Run with an experiment bundle, e.g.\n"
            "  python train.py experiment=ucfcrime\n"
            "or pass data=<name> model=<name> explicitly."
        )

    if cfg.get("seed") is not None:
        import random

        import numpy as np

        random.seed(int(cfg.seed))
        np.random.seed(int(cfg.seed))

    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    module = AnomalyCLIPTrainModule(cfg)

    metrics: dict = {}
    if cfg.get("train", True):
        metrics = module.fit()

    if cfg.get("test", True) and not cfg.get("trainer", {}).get("fast_dev_run"):
        state = getattr(module, "_final_state", None)
        if state is not None:
            metrics = module.test(state=state)
        else:
            last = module.ckpt.latest()
            if last is not None:
                metrics = module.test(ckpt_path=last)
            else:
                log.warning("no checkpoint available to test")
    return metrics


if __name__ == "__main__":
    main()
