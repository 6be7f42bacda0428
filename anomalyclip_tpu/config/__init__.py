from anomalyclip_tpu.config.compose import (
    ConfigNode,
    compose,
    load_yaml,
    parse_cli_overrides,
    to_dict,
)

__all__ = ["ConfigNode", "compose", "load_yaml", "parse_cli_overrides", "to_dict"]
