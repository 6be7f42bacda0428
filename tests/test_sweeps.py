"""Sweep tests: subprocess-launched multirun and hparams_search, mirroring the
reference's test shape (reference: tests/test_sweeps.py — launched via `sh`) with
sweeps that actually optimize logged metrics."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


def _run_train(tmp_path, *args, timeout=420):
    env = {
        "PROJECT_ROOT": str(REPO_ROOT),
        "SYNTHETIC_ROOT": str(tmp_path / "synthetic"),
        "LOG_DIR": str(tmp_path / "logs"),
        "PATH": "/usr/bin:/bin",
        "JAX_PLATFORMS": "cpu",
        "HOME": str(tmp_path),
    }
    import os

    env["PATH"] = os.environ.get("PATH", env["PATH"])
    return subprocess.run(
        [sys.executable, str(REPO_ROOT / "train.py"), *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=str(REPO_ROOT),
    )


@pytest.mark.slow
def test_multirun_grid_creates_run_dirs(tmp_path):
    """`-m` comma grid -> one run dir per job (reference: tests/test_sweeps.py:24-36)."""
    result = _run_train(
        tmp_path,
        "-m",
        "experiment=synthetic",
        "trainer=cpu",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=1",
        "model.solver.lr=1e-5,1e-4",
        "test=False",
        "extras.print_config=False",
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    assert "multirun: 2 jobs" in result.stdout
    base = tmp_path / "logs" / "train" / "runs" / "synthetic"
    assert (base / "0").is_dir() and (base / "1").is_dir()


@pytest.mark.slow
def test_hparams_search_reports_best(tmp_path):
    result = _run_train(
        tmp_path,
        "experiment=synthetic",
        "trainer=cpu",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=2",
        "hparams_search=synthetic_random",
        "hparams_search.n_trials=2",
        "test=False",
        "extras.print_config=False",
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    assert "hparams_search[random]: 2 trials" in result.stdout
    assert "hparams_search best: trial" in result.stdout
    base = tmp_path / "logs" / "train" / "runs" / "synthetic"
    assert (base / "trial_0").is_dir() and (base / "trial_1").is_dir()


@pytest.mark.slow
def test_hparams_search_tpe_sampler(tmp_path):
    """sampler=tpe (the reference's Optuna-TPESampler analogue,
    configs/hparams_search/mnist_optuna.yaml): adaptive trials past the random
    startup phase, best reported."""
    result = _run_train(
        tmp_path,
        "experiment=synthetic",
        "trainer=cpu",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=2",
        "hparams_search=synthetic_tpe",
        "hparams_search.n_trials=3",
        "hparams_search.n_startup_trials=2",  # trial 2 exercises the TPE rule
        "test=False",
        "extras.print_config=False",
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    assert "hparams_search[tpe]: 3 trials" in result.stdout
    assert "hparams_search best: trial" in result.stdout
    base = tmp_path / "logs" / "train" / "runs" / "synthetic"
    assert (base / "trial_2").is_dir()


@pytest.mark.slow
def test_ddp_sim_alias_fans_out_virtual_devices(tmp_path):
    """trainer=ddp_sim (the reference's group name) must get the same 2-virtual-
    device CPU fan-out as trainer=dp_sim — regression for the alias bypassing
    train.py's platform override (which matches argv before compose runs)."""
    r = _run_train(
        tmp_path,
        "experiment=synthetic",
        "trainer=ddp_sim",
        "trainer.fast_dev_run=True",
        f"paths.output_dir={tmp_path / 'run'}",
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-2000:]
    assert "data mesh: OrderedDict({'data': 2})" in out, out[-2000:]


@pytest.mark.slow
def test_hparams_search_real_dataset_bundle_smoke(tmp_path):
    """The real-dataset search bundles (VERDICT r4 item 8) drive the same sweep
    machinery end-to-end: ucfcrime_random only sets optimized_metric +
    hparams_search, so composing it over the synthetic experiment exercises its
    space keys (model.solver.lr / model.net.num_topk / model.loss.lambda_sparse)
    against a runnable config."""
    result = _run_train(
        tmp_path,
        "experiment=synthetic",
        "trainer=cpu",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=2",
        "hparams_search=ucfcrime_random",
        "hparams_search.n_trials=2",
        "test=False",
        "extras.print_config=False",
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    assert "hparams_search[random]: 2 trials optimizing auc_roc" in result.stdout
    assert "hparams_search best: trial" in result.stdout
