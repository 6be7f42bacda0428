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


def _apply_platform_overrides(argv, reexec_module="anomalyclip_tpu.train_entry") -> None:
    """Pick the backend before any jax device query. trainer=cpu / accelerator=cpu
    forces the host platform (the reference's configs/trainer/cpu.yaml analogue);
    trainer=dp_sim additionally fans the host platform out to N virtual devices
    (the ddp_spawn-on-CPU simulation, reference configs/trainer/ddp_sim.yaml).
    Shared by the eval entry (which passes its own ``reexec_module``)."""
    wants_sim = any(a in ("trainer=dp_sim", "trainer=ddp_sim") for a in argv)
    wants_cpu = wants_sim or any(
        a in ("trainer=cpu", "trainer.accelerator=cpu") for a in argv
    )
    n = 2  # configs/trainer/dp_sim.yaml devices default
    if wants_sim:
        # only the sim fan-out needs a device *count*; outside it, values like
        # trainer.devices=auto are legal and must not be parsed here. Inside it,
        # tolerate non-numeric values too: "auto" keeps the default, and a
        # multirun comma sweep ("2,4" — expanded only later in main()) fans out
        # to the largest count so every job fits the virtual mesh.
        for a in argv:
            if a.startswith("trainer.devices="):
                counts = [
                    int(v) for v in a.split("=", 1)[1].split(",")
                    if v.strip().isdigit()
                ]
                if counts:
                    n = max(counts)
    if wants_sim:
        # drop any stale device-count flag before appending ours: a leftover
        # count (e.g. from a test harness) would otherwise win the parse and
        # either fan out the wrong mesh or re-exec forever (same strip as
        # __graft_entry__.dryrun_multichip)
        flags = " ".join(
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    if wants_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    if wants_sim:
        import jax

        if len(jax.devices()) < n:
            # an accelerator plugin consumed the XLA_FLAGS parse before the
            # host-platform fan-out could apply (same situation as
            # __graft_entry__.dryrun_multichip): re-exec without it
            import subprocess
            import sys as _sys

            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            # -m so the child resolves this module wherever it is installed;
            # prepend our parent dir for from-checkout invocations where the
            # package is importable only via the script's sys.path entry
            pkg_root = str(Path(__file__).resolve().parents[1])
            env["PYTHONPATH"] = os.pathsep.join(
                p for p in (pkg_root, env.get("PYTHONPATH")) if p
            )
            result = subprocess.run(
                [_sys.executable, "-m", reexec_module] + argv,
                env=env,
            )
            raise SystemExit(result.returncode)


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

    # multi-host bring-up MUST precede any jax call that initializes the XLA
    # backend (jax.distributed.initialize refuses to run afterwards) — including
    # the first logger's host check
    from anomalyclip_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    os.environ.setdefault("PROJECT_ROOT", str(Path(__file__).resolve().parents[1]))

    if any(a.startswith("hparams_search=") and a != "hparams_search=null" for a in argv):
        # the hydra convention spells sweeps `-m hparams_search=...`; the flag
        # is meaningless to the sweeper itself but must not reach compose()
        return _hparams_search([a for a in argv if a not in ("-m", "--multirun")])

    if "-m" in argv or "--multirun" in argv:
        overrides = [a for a in argv if a not in ("-m", "--multirun")]
        jobs = _expand_multirun(overrides)
        from anomalyclip_tpu.train.module import TrainingPreempted
        from anomalyclip_tpu.utils.logging import get_logger

        log = get_logger("train")
        log.info(f"multirun: {len(jobs)} jobs")
        results = {}
        for i, job in enumerate(jobs):
            job = job + [f"exp_name_suffix=/{i}"]
            log.info(f"multirun job {i}: {job}")
            try:
                results[i] = _single_run(job)
            except TrainingPreempted:
                # the machine is going away: do not burn the SIGTERM grace
                # period launching the next (doomed) job
                log.error(f"multirun preempted during job {i}; stopping the sweep")
                raise
            except Exception as exc:  # one failed combo must not kill the sweep
                log.error(f"multirun job {i} failed: {exc!r}")
                results[i] = {"error": repr(exc)}
        return results

    return _single_run(argv)


def _hparams_search(argv) -> dict:
    """Sequential hyperparameter search driven by a hparams_search config group
    (reference contract: configs/hparams_search/mnist_optuna.yaml + the
    optimized_metric return, src/train.py:125-129 — the reference's own sweep
    config is a rotted template; this one actually optimizes a logged metric).

    Samples trial overrides from `hparams_search.space` (random or full grid),
    runs each as a normal single run in its own run dir, and reports the best.
    """
    import itertools
    import math

    import numpy as np

    from anomalyclip_tpu.config import compose, default_config_dir
    from anomalyclip_tpu.utils.logging import get_logger

    log = get_logger("train")
    cfg = compose(default_config_dir(), "train", argv)
    hs = cfg.get("hparams_search")
    if not hs:
        raise SystemExit("hparams_search=<name> selected but group composed empty")
    optimized = cfg.get("optimized_metric")
    if not optimized:
        raise SystemExit("hparams_search requires optimized_metric in the config")
    space = dict(hs.get("space") or {})
    if not space:
        raise SystemExit("hparams_search.space is empty")
    direction = str(hs.get("direction", "max"))
    sampler = str(hs.get("sampler", "random"))
    rng = np.random.default_rng(int(hs.get("seed") or 0))

    def sample_random(spec):
        kind = spec.get("type", "choice")
        if kind == "choice":
            return spec["values"][int(rng.integers(len(spec["values"])))]
        if kind == "uniform":
            return float(rng.uniform(float(spec["low"]), float(spec["high"])))
        if kind == "loguniform":
            lo, hi = math.log(float(spec["low"])), math.log(float(spec["high"]))
            return float(math.exp(rng.uniform(lo, hi)))
        if kind == "int":
            return int(rng.integers(int(spec["low"]), int(spec["high"]) + 1))
        raise ValueError(f"unknown space type {kind!r} for hparams_search")

    n_trials = int(hs.get("n_trials", 8))
    if sampler == "grid":
        axes = []
        for key, spec in space.items():
            values = spec.get("values")
            if values is None:
                raise ValueError(f"grid sampler needs explicit values for {key}")
            axes.append([(key, v) for v in values])
        trials = [dict(combo) for combo in itertools.product(*axes)]
        n_trials = len(trials)
    elif sampler == "tpe":
        trials = None  # adaptive: sampled per-trial from the history below
    elif sampler == "random":
        trials = [
            {key: sample_random(spec) for key, spec in space.items()}
            for _ in range(n_trials)
        ]
    else:
        raise ValueError(f"unknown hparams_search.sampler {sampler!r}")

    log.info(f"hparams_search[{sampler}]: {n_trials} trials optimizing {optimized} ({direction})")
    from anomalyclip_tpu.train.module import TrainingPreempted

    results = []
    tpe_history = []  # [(params, value)] of successful trials, for the TPE sampler
    for i in range(n_trials):
        if trials is not None:
            trial = trials[i]
        else:
            from anomalyclip_tpu.train import tpe

            trial = tpe.suggest(
                space,
                tpe_history,
                rng,
                maximize=(direction == "max"),
                n_startup=int(hs.get("n_startup_trials", 4)),
                gamma=float(hs.get("gamma", 0.25)),
                sample_random=sample_random,
            )
        overrides = [f"{k}={v}" for k, v in trial.items()]
        job = argv + overrides + [f"exp_name_suffix=/trial_{i}"]
        log.info(f"trial {i}: {trial}")
        try:
            metrics = _single_run(job)
            value = metrics.get("optimized_metric_value")
        except TrainingPreempted:
            # preemption, not a bad combo: stop instead of starting doomed trials
            log.error(f"hparams search preempted during trial {i}; stopping")
            raise
        except Exception as exc:  # a failed trial must not kill the search
            log.error(f"trial {i} failed: {exc!r}")
            metrics, value = {"error": repr(exc)}, None
        # nan (e.g. a single-class val subset makes auroc undefined) must not
        # enter the TPE history or best-trial selection: max()/min() keep the
        # first element when every comparison with nan is False, so one nan
        # trial would be reported as the sweep best over real finite trials
        finite = value is not None and math.isfinite(float(value))
        if finite:
            tpe_history.append((trial, float(value)))
        results.append({"trial": i, "params": trial, "value": value})
    best = _best_trial(results, direction)
    if best is not None:
        log.info(
            f"hparams_search best: trial {best['trial']} {optimized}={best['value']:.4f} "
            f"params={best['params']}"
        )
    else:
        log.warning("hparams_search: no trial produced the optimized metric")
    return {"trials": results, "best": best}


def _best_trial(results, direction: str):
    """Best trial by finite value, or None. Trials whose value is None (failed
    run) or nan (undefined metric, e.g. a single-class val subset) are
    excluded — max()/min() keep the first element when every comparison with
    nan is False, so one nan trial would otherwise win over finite trials."""
    import math

    valid = [
        r for r in results
        if r["value"] is not None and math.isfinite(float(r["value"]))
    ]
    if not valid:
        return None
    pick = max if direction == "max" else min
    return pick(valid, key=lambda r: float(r["value"]))


def _single_run(argv) -> dict:

    from anomalyclip_tpu.config import compose, default_config_dir
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
    cfg = compose(default_config_dir(), "train", argv)
    if suffix:
        # re-compose with a per-job exp_name so each sweep job gets its own
        # run dir (${paths.output_dir} interpolates ${exp_name})
        cfg = compose(
            default_config_dir(),
            "train",
            argv + [f"exp_name={cfg.exp_name}{suffix}"],
        )
    if not cfg.get("data") or not cfg.get("model"):
        raise SystemExit(
            "No data/model configured. Run with an experiment bundle, e.g.\n"
            "  python train.py experiment=ucfcrime\n"
            "or pass data=<name> model=<name> explicitly."
        )

    # composed configs (e.g. debug bundles) can force the CPU platform too; this
    # must run before anything initializes the backend (first host-0 log check)
    if (cfg.get("trainer") or {}).get("accelerator") == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # backend already up (e.g. multirun logged first)
            pass

    from anomalyclip_tpu.utils.extras import apply_extras

    apply_extras(cfg)

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
        from anomalyclip_tpu.utils.logging import is_host_zero

        if optimized not in metrics:
            if not is_host_zero():
                # non-zero hosts get {} from test() by design (rank-zero metrics,
                # reference anomaly_clip_module.py:458); don't kill the job
                return metrics
            raise KeyError(
                f"optimized_metric '{optimized}' not found in result metrics "
                f"{sorted(metrics)}"
            )
        value = metrics[optimized]
        log.info(f"optimized_metric {optimized}={value}")
        metrics = dict(metrics)
        metrics["optimized_metric_value"] = value
    return metrics


def cli() -> int:
    """Console-script entry: main() returns a metrics dict, which setuptools
    wrappers pass to sys.exit() — translate to a clean exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
