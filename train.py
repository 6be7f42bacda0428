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


def _expand_multirun(overrides):
    """Expand comma-valued overrides into the cartesian grid of single runs
    (reference: hydra -m sweeps, src/train.py:125-129; tests/test_sweeps.py).

    `model.solver.lr=1e-5,1e-4 data.batch_size=16,32` -> 4 override lists.
    Values containing [] or () are treated as literals, not sweep lists.
    """
    import itertools

    axes = []
    for ov in overrides:
        if (
            "=" in ov
            and "," in ov.split("=", 1)[1]
            and not any(c in ov.split("=", 1)[1] for c in "[]()")
        ):
            key, vals = ov.split("=", 1)
            axes.append([f"{key}={v}" for v in vals.split(",")])
        else:
            axes.append([ov])
    return [list(combo) for combo in itertools.product(*axes)]


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    _apply_platform_overrides(argv)

    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parent))

    if "-m" in argv or "--multirun" in argv:
        overrides = [a for a in argv if a not in ("-m", "--multirun")]
        jobs = _expand_multirun(overrides)
        from anomalyclip_tpu.utils.logging import get_logger

        log = get_logger("train")
        log.info(f"multirun: {len(jobs)} jobs")
        results = {}
        for i, job in enumerate(jobs):
            job = job + [f"exp_name_suffix=/{i}"]
            log.info(f"multirun job {i}: {job}")
            try:
                results[i] = _single_run(job)
            except Exception as exc:  # one failed combo must not kill the sweep
                log.error(f"multirun job {i} failed: {exc!r}")
                results[i] = {"error": repr(exc)}
        return results

    return _single_run(argv)


def _single_run(argv) -> dict:

    from anomalyclip_tpu.config import compose
    from anomalyclip_tpu.utils.logging import get_logger

    log = get_logger("train")
    suffix = None
    kept = []
    for a in argv:
        if a.startswith("exp_name_suffix="):
            suffix = a.split("=", 1)[1]
        else:
            kept.append(a)
    argv = kept
    cfg = compose(Path(__file__).parent / "configs", "train", argv)
    if suffix:
        # re-compose with a per-job exp_name so each sweep job gets its own
        # run dir (${paths.output_dir} interpolates ${exp_name})
        cfg = compose(
            Path(__file__).parent / "configs",
            "train",
            argv + [f"exp_name={cfg.exp_name}{suffix}"],
        )
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

    # sweeper return contract (reference: src/train.py:125-129,
    # src/utils/utils.py:95-112 get_metric_value)
    optimized = cfg.get("optimized_metric")
    if optimized:
        if optimized not in metrics:
            raise KeyError(
                f"optimized_metric '{optimized}' not found in result metrics "
                f"{sorted(metrics)}"
            )
        value = metrics[optimized]
        log.info(f"optimized_metric {optimized}={value}")
        metrics = dict(metrics)
        metrics["optimized_metric_value"] = value
    return metrics


if __name__ == "__main__":
    main()
