#!/usr/bin/env python
"""Evaluation entry point.

Same invocation contract as the reference (reference: src/eval.py:33-89):

    python eval.py data=ucfcrime model=anomaly_clip_ucfcrime \
        ckpt_path=logs/train/runs/ucfcrime/checkpoints/last
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    # full shared pre-pass (cpu forcing AND dp_sim fan-out — e.g. CPU-simulating
    # trainer.model_parallel needs the virtual device count here too)
    from anomalyclip_tpu.train_entry import _apply_platform_overrides

    _apply_platform_overrides(argv, reexec_module="anomalyclip_tpu.eval_entry")

    # multi-host bring-up before any backend-initializing jax call
    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parents[1]))

    from anomalyclip_tpu.config import compose, default_config_dir
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    cfg = compose(default_config_dir(), "eval", argv)

    if not cfg.get("data") or not cfg.get("model"):
        raise SystemExit(
            "No data/model configured. Run with explicit groups, e.g.\n"
            "  python eval.py data=ucfcrime model=anomaly_clip_ucfcrime ckpt_path=..."
        )

    from anomalyclip_tpu.utils.extras import apply_extras

    apply_extras(cfg)

    ckpt_path = cfg.get("ckpt_path")
    if not ckpt_path or ckpt_path == "???":
        raise SystemExit("eval.py requires ckpt_path=...")

    module = AnomalyCLIPTrainModule(cfg)
    return module.test(ckpt_path=ckpt_path)


def cli() -> int:
    """Console-script entry: main() returns a metrics dict, which setuptools
    wrappers pass to sys.exit() — translate to a clean exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
