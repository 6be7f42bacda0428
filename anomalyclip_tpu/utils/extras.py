"""Pre-task extras: warning filters, tag enforcement, config-tree printing.

The reference applies these before every task (reference: src/utils/utils.py:12-39
``extras`` + src/utils/rich_utils.py): `ignore_warnings` silences python warnings,
`enforce_tags` refuses to run untagged experiments, `print_config` pretty-prints the
fully composed config tree. The print here is plain YAML per top-level group (no
rich dependency) — same information, grep-able in logs.
"""

from __future__ import annotations

from typing import Any

import yaml

from anomalyclip_tpu.config.compose import to_dict
from anomalyclip_tpu.utils.logging import get_logger, is_host_zero

log = get_logger(__name__)

_PRINT_ORDER = (
    "data",
    "model",
    "callbacks",
    "logger",
    "trainer",
    "paths",
    "extras",
)


def apply_extras(cfg: Any) -> None:
    """Apply cfg.extras before the task runs (utils.py:12-39 contract)."""
    extras = cfg.get("extras") or {}

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
