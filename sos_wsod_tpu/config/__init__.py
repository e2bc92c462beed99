from .cfg_node import CfgNode
from .defaults import get_default_cfg


def get_cfg() -> CfgNode:
    """Return a fresh copy of the full default config (stage 1 + 2/3 keys merged).

    Unlike the reference — which has three separate config universes
    (uwsod d2-0.2 + add_wsl_config, d2-0.4, ubteacher) — this framework ships one
    tree containing every key, so any released YAML merges cleanly.
    """
    return get_default_cfg().clone()


__all__ = ["CfgNode", "get_cfg", "get_default_cfg"]
