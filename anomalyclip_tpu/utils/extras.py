"""Pre-task extras: warning filters, tag enforcement, config-tree printing.

The reference applies these before every task (reference: src/utils/utils.py:12-39
``extras`` + src/utils/rich_utils.py): `ignore_warnings` silences python warnings,
`enforce_tags` refuses to run untagged experiments, `print_config` pretty-prints the
fully composed config tree. The print here is plain YAML per top-level group (no
rich dependency) — same information, grep-able in logs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import yaml

from anomalyclip_tpu.config.compose import to_dict
from anomalyclip_tpu.utils.logging import get_logger, is_host_zero

log = get_logger(__name__)


def enable_compilation_cache(
    cache_dir: Optional[str] = None, min_compile_secs: float = 1.0
) -> str:
    """Turn on JAX's persistent (on-disk) XLA compilation cache.

    Compiled executables are memoized across processes, so a serve/predict
    restart — or the next eval of the same config — skips the 20-40s TPU
    compiles entirely. This is the TPU-native answer to the reference's
    "startup is just unpickling a checkpoint": here startup cost is
    compilation, and the cache removes it. Entries are keyed by HLO +
    compile options + backend, so sharing one directory across configs,
    processes, and hardware generations is safe.

    Resolution order: explicit ``cache_dir`` > $JAX_COMPILATION_CACHE_DIR >
    ``~/.cache/anomalyclip_tpu/xla``. Returns the directory used.
    """
    import jax

    cache_dir = str(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "anomalyclip_tpu" / "xla"
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # skip caching trivial executables (host scalar ops etc.)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir

_PRINT_ORDER = (
    "data",
    "model",
    "callbacks",
    "logger",
    "trainer",
    "paths",
    "extras",
)


def maybe_enable_compilation_cache(extras: Any) -> Optional[str]:
    """Gate + enable from an extras-like mapping ({compilation_cache: bool,
    compilation_cache_dir: str|None}) — the one implementation behind
    apply_extras and every CLI bootstrap. Returns the dir, or None if off."""
    extras = extras or {}
    if not extras.get("compilation_cache", True):
        return None
    return enable_compilation_cache(extras.get("compilation_cache_dir"))


def apply_extras(cfg: Any) -> None:
    """Apply cfg.extras before the task runs (utils.py:12-39 contract)."""
    extras = cfg.get("extras") or {}

    cache_dir = maybe_enable_compilation_cache(extras)
    if cache_dir:
        log.info(f"persistent XLA compilation cache: {cache_dir}")

    if extras.get("ignore_warnings"):
        import warnings

        warnings.filterwarnings("ignore")

    if extras.get("enforce_tags"):
        tags = list(cfg.get("tags") or [])
        if not tags or tags == ["dev"]:
            raise SystemExit(
                "extras.enforce_tags: no experiment tags set — pass "
                "tags=[your_tag] (or disable with extras.enforce_tags=False)"
            )

    if extras.get("print_config") and is_host_zero():
        tree = to_dict(cfg)
        lines = ["config tree:"]
        for key in _PRINT_ORDER:
            if key in tree:
                body = yaml.safe_dump({key: tree.pop(key)}, sort_keys=False)
                lines.append(body.rstrip())
        rest = {k: v for k, v in tree.items()}
        if rest:
            lines.append(yaml.safe_dump(rest, sort_keys=False).rstrip())
        log.info("\n".join(lines))
