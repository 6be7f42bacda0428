"""Preemption-safe training (train/module.py TrainingPreempted).

TPU-pod preemptions deliver SIGTERM with a grace period. fit() must save the
newest epoch-boundary state as a normal checkpoint, raise TrainingPreempted,
restore the previous SIGTERM handler, and resume cleanly from
``checkpoints/last`` (a capability the Lightning reference lacks entirely).

The signal is raised *in-process* from a hooked logger call, so delivery is
deterministic (main thread, mid-fit, after epoch 0's train metrics)."""

import signal

import pytest

from tests.helpers.synthetic_run import synthetic_cfg


@pytest.mark.slow
def test_sigterm_checkpoints_boundary_and_resumes(tmp_path):
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule, TrainingPreempted

    sentinel_called = []

    def sentinel(signum, frame):  # pragma: no cover - must NOT run
        sentinel_called.append(signum)

    old = signal.signal(signal.SIGTERM, sentinel)
    try:
        cfg = synthetic_cfg(tmp_path, "trainer.max_epochs=3")
        module = AnomalyCLIPTrainModule(cfg)

        orig_log = module.loggers.log_metrics

        def hooked(metrics, step=None):
            orig_log(metrics, step=step)
            # deterministic "preemption" right after epoch 0's train metrics:
            # fit's own handler is installed by now (we are inside the loop)
            if step == 0 and "train/loss" in metrics:
                signal.raise_signal(signal.SIGTERM)

        module.loggers.log_metrics = hooked

        with pytest.raises(TrainingPreempted, match="saved boundary: epoch 0"):
            module.fit()

        # fit restored our sentinel handler on the way out, without invoking it
        assert signal.getsignal(signal.SIGTERM) is sentinel
        assert not sentinel_called

        ckpts = module.save_dir / "checkpoints"
        assert (ckpts / "epoch_000").is_dir()
        assert (ckpts / "last").is_dir()
        restored = module.ckpt.restore(ckpts / "last")
        assert int(restored["epoch"]) == 0

        # resume from the preemption checkpoint: epoch 1 runs and lands on disk
        cfg2 = synthetic_cfg(
            tmp_path, "trainer.max_epochs=2", f"ckpt_path={ckpts / 'last'}"
        )
        module2 = AnomalyCLIPTrainModule(cfg2)
        metrics = module2.fit()
        assert "auc_roc" in metrics
        assert (module2.save_dir / "checkpoints" / "epoch_001").is_dir()
        resumed = module2.ckpt.restore(module2.save_dir / "checkpoints" / "epoch_001")
        assert int(resumed["epoch"]) == 1
        assert int(resumed["step"]) > int(restored["step"])
    finally:
        signal.signal(signal.SIGTERM, old)


def test_multirun_stops_on_preemption(monkeypatch):
    """A preemption must stop the whole sweep — the machine is going away, so
    launching the next job would burn the SIGTERM grace period on a doomed
    trial (unlike an ordinary failed combo, which the sweep contains)."""
    from anomalyclip_tpu import train_entry
    from anomalyclip_tpu.train.module import TrainingPreempted

    started = []

    def fake_single_run(job):
        started.append(job)
        raise TrainingPreempted("preempted during epoch 0")

    monkeypatch.setattr(train_entry, "_single_run", fake_single_run)
    with pytest.raises(TrainingPreempted):
        train_entry.main(["-m", "model.solver.lr=1e-5,1e-4"])
    assert len(started) == 1, "sweep must not start the next job after preemption"


@pytest.mark.slow
def test_preempt_save_off_switch(tmp_path, monkeypatch):
    """trainer.preempt_save=false must leave the process's SIGTERM handler
    alone (fast_dev_run keeps it to one step)."""
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    seen = []
    old = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        cfg = synthetic_cfg(
            tmp_path, "trainer.fast_dev_run=True", "trainer.preempt_save=false"
        )
        module = AnomalyCLIPTrainModule(cfg)

        installed = []
        orig_signal = signal.signal

        def spy(signum, handler):
            installed.append(signum)
            return orig_signal(signum, handler)

        monkeypatch.setattr(signal, "signal", spy)
        module.fit()
        assert signal.SIGTERM not in installed
    finally:
        signal.signal(signal.SIGTERM, old)


def test_sigterm_after_donating_step_saves_boundary(tmp_path):
    """Preemption BETWEEN steps of epoch 1: epoch 1's first train_step donates
    the device buffers of the state pytree that is also the epoch-0 boundary
    (donate_argnums in _build_train_step), so the boundary must be a host
    snapshot — a device alias would be deleted and the save would fail on
    every mid-epoch preemption. (CPU ignores donation, so this suite cannot
    see the deletion itself; the test pins the scenario and the host-snapshot
    path so the TPU run takes exactly the code path exercised here.)"""
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule, TrainingPreempted

    # every_n_epochs=2 keeps the REGULAR save from covering epoch 0 — with the
    # default cadence last_saved_epoch==0 already and _handle_preempt's guard
    # skips the boundary-snapshot save this test exists to exercise
    cfg = synthetic_cfg(
        tmp_path, "trainer.max_epochs=3",
        "callbacks.model_checkpoint.every_n_epochs=2",
    )
    module = AnomalyCLIPTrainModule(cfg)

    flags = {"epoch0_done": False, "fired": False}
    orig_log = module.loggers.log_metrics

    def hooked_log(metrics, step=None):
        orig_log(metrics, step=step)
        if step == 0 and "train/loss" in metrics:
            flags["epoch0_done"] = True

    module.loggers.log_metrics = hooked_log

    orig_build = module._build_train_step

    def build_hook(tx):
        step_fn = orig_build(tx)

        def wrapped(*args):
            out = step_fn(*args)
            # first step AFTER epoch 0's metrics == epoch 1's first step,
            # which has just donated the epoch-0 boundary's buffers
            if flags["epoch0_done"] and not flags["fired"]:
                flags["fired"] = True
                signal.raise_signal(signal.SIGTERM)
            return out

        return wrapped

    module._build_train_step = build_hook

    with pytest.raises(TrainingPreempted, match="saved boundary: epoch 0"):
        module.fit()
    assert flags["fired"]

    restored = module.ckpt.restore(module.save_dir / "checkpoints" / "epoch_000")
    assert int(restored["epoch"]) == 0
