"""Persistent XLA compilation cache (utils/extras.py:enable_compilation_cache).

Pins: (a) the helper writes real cache entries to the chosen directory — a
restarted process would reload them instead of recompiling; (b) the
extras.compilation_cache knob gates it; (c) the env-var fallback resolves.
Run in subprocesses so the global jax config of the test process stays clean.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def _run(script: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = {**os.environ, **extra_env, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize would grab the tunnel
    return subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env=env,
    )


def test_cache_entries_written_and_env_fallback(tmp_path):
    cache = tmp_path / "xla"
    script = """
from anomalyclip_tpu.utils.extras import enable_compilation_cache
d = enable_compilation_cache(min_compile_secs=0.0)  # env-var fallback path
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32)
jax.jit(lambda a: (a @ a).sum())(x).block_until_ready()
print(d)
"""
    out = _run(script, {"JAX_COMPILATION_CACHE_DIR": str(cache)})
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == str(cache)  # env fallback resolved
    entries = list(cache.iterdir())
    assert entries, "no persistent cache entries written"


def test_apply_extras_knob_gates_the_cache(monkeypatch, tmp_path):
    from anomalyclip_tpu.utils import extras as ex

    calls = []
    monkeypatch.setattr(
        ex, "enable_compilation_cache", lambda d=None, **kw: calls.append(d) or "x"
    )
    ex.apply_extras({"extras": {"compilation_cache": False}})
    assert calls == []
    ex.apply_extras({"extras": {"compilation_cache_dir": str(tmp_path)}})
    assert calls == [str(tmp_path)]  # default-on, explicit dir forwarded
