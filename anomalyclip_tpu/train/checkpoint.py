"""Checkpoint save/restore with Orbax.

Replaces Lightning's ModelCheckpoint + trainer.fit(ckpt_path=...) resume (reference:
configs/callbacks/model_checkpoint.yaml, anomaly_clip_module.py via Lightning).
Layout under ``<run_dir>/checkpoints``:

    epoch_000/  epoch_001/  ...  last/      (Orbax directories)

Each checkpoint stores {trainable, opt_state, bn_state (as arrays), step, epoch}.
The normality centroid is a side-channel file ``ncentroid.npy`` in the run dir,
mirroring the reference's ``ncentroid.pt`` (anomaly_clip_module.py:140-171).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from anomalyclip_tpu.models.selector import BNState


def _to_saveable(state: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(state)
    bn = out.pop("bn_state")
    out["bn_mean"] = bn.mean
    out["bn_var"] = bn.var
    return jax.tree_util.tree_map(np.asarray, out)


def _from_saved(raw: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(raw)
    out["bn_state"] = BNState(mean=out.pop("bn_mean"), var=out.pop("bn_var"))
    return out


class CheckpointManager:
    def __init__(self, run_dir: str | Path, save_top_k: int = -1, save_last: bool = True):
        self.ckpt_dir = Path(run_dir) / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.save_last = save_last
        self._saver = ocp.StandardCheckpointer()

    def save_epoch(self, epoch: int, state: Dict[str, Any]) -> Path:
        """epoch_{epoch:03d} + refreshed ``last`` (save_last semantics of
        configs/callbacks/model_checkpoint.yaml).

        ``last`` is a symlink to the newest epoch directory — one serialize per
        epoch instead of two. ``save_top_k > 0`` keeps only the newest k epoch
        checkpoints (monitor: null in the reference default, so "top" = newest).

        Multi-host: EVERY process must call this at the same program point —
        Orbax's save is itself a collective (it runs sync_global_processes
        barriers internally; a host-zero-only call deadlocks its peers). Orbax
        writes array data from the primary host only; the symlink/retention
        filesystem mutations below are additionally host-zero-gated so a
        shared checkpoint directory has exactly one mutator.
        """
        payload = _to_saveable(state)
        path = self.ckpt_dir / f"epoch_{epoch:03d}"
        self._saver.save(path.resolve(), payload, force=True)
        self._saver.wait_until_finished()
        if jax.process_index() != 0:
            return path
        if self.save_last:
            last = self.ckpt_dir / "last"
            tmp = self.ckpt_dir / ".last.tmp"
            if tmp.is_symlink() or tmp.exists():
                tmp.unlink()
            tmp.symlink_to(path.name)
            tmp.replace(last)  # atomic swap
        if self.save_top_k and self.save_top_k > 0:
            epochs = self._epoch_dirs()
            for old in epochs[: -self.save_top_k]:
                import shutil

                shutil.rmtree(old, ignore_errors=True)
        return path

    def _epoch_dirs(self) -> list:
        """epoch_* dirs in NUMERIC epoch order — lexicographic sort breaks
        past the 3-digit padding (epoch_1000 < epoch_999), which would make
        retention delete the newest checkpoints and latest() return a stale
        one on runs with max_epochs >= 1000. Unparseable epoch_* names sort
        first (retention prunes them before real epochs)."""
        def key(p: Path) -> int:
            e = self.epoch_of(p)
            return -1 if e is None else e

        return sorted(self.ckpt_dir.glob("epoch_*"), key=key)

    def restore(
        self, path: str | Path, template: Optional[Dict[str, Any]] = None
    ) -> Dict[str, Any]:
        """Restore a checkpoint; pass ``template`` (a state dict of the same
        structure, e.g. a freshly initialized one) to reconstruct namedtuple-typed
        nodes like the optax state — Orbax otherwise returns plain dicts."""
        path = Path(path).resolve()
        if template is not None:
            target = jax.tree_util.tree_map(np.asarray, _to_saveable(template))
            restored = self._saver.restore(path, target)
        else:
            restored = self._saver.restore(path)
        return _from_saved(restored)

    def latest(self) -> Optional[Path]:
        last = self.ckpt_dir / "last"
        if last.is_dir():
            return last
        epochs = self._epoch_dirs()
        return epochs[-1] if epochs else None

    def epoch_of(self, path: str | Path) -> Optional[int]:
        """Epoch number of a checkpoint dir, parsed from its BASENAME only —
        matching anywhere in the absolute path would key every child off a
        run dir that happens to contain an 'epoch_<n>' token."""
        match = re.fullmatch(r"epoch_(\d+)", Path(path).name)
        return int(match.group(1)) if match else None


def save_ncentroid(run_dir: str | Path, ncentroid: np.ndarray) -> Path:
    path = Path(run_dir) / "ncentroid.npy"
    np.save(path, np.asarray(ncentroid))
    return path


def load_ncentroid(run_dir: str | Path) -> Optional[np.ndarray]:
    path = Path(run_dir) / "ncentroid.npy"
    return np.load(path) if path.is_file() else None
