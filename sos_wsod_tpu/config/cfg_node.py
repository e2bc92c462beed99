"""Hierarchical config node with YAML ``_BASE_`` inheritance and dotted CLI overrides.

TPU-native re-design of the reference's yacs-based config system
(reference: detectron2/detectron2/config/config.py and yacs). We keep the exact
config *keys* (MODEL.*, WSL.*, OICRPLUS.*, SEMISUPNET.*, ...) so the reference's
released YAML configs remain readable by this framework, but the implementation
is a small dependency-free dict subclass.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, List

import yaml

_BASE_KEY = "_BASE_"


class CfgNode(dict):
    """A dict with attribute access, freezing, and recursive merge.

    Mirrors the behavior the reference relies on from yacs
    (reference: uwsod/projects/WSL/wsl/config/defaults.py:7, unbias/ubteacher/config.py:5):
      - attribute-style access (cfg.MODEL.WSL.REFINE_NUM)
      - merge_from_file with ``_BASE_`` inheritance (relative to the child file)
      - merge_from_list(["KEY.SUBKEY", value, ...]) CLI overrides
      - freeze()/defrost() immutability
    """

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        if init_dict:
            for k, v in init_dict.items():
                if isinstance(v, dict) and not isinstance(v, CfgNode):
                    v = CfgNode(v)
                super().__setitem__(k, v)

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(f"Config is frozen; cannot set {name}")
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        super().__setitem__(name, value)

    def __setitem__(self, name: str, value: Any) -> None:
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(f"Config is frozen; cannot set {name}")
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        super().__setitem__(name, value)

    # -- immutability ------------------------------------------------------
    def freeze(self) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = CfgNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        return out

    def __reduce__(self):
        # Pickle support: rebuild from a plain dict snapshot (drops frozen flag).
        return (CfgNode, (self.to_dict(),))

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else v
        return out

    # -- merging -----------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self)

    def merge_from_file(self, filename: str, allow_unsafe: bool = False) -> None:
        loaded = _load_yaml_with_base(filename)
        _merge_a_into_b(CfgNode(loaded), self)

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, f"Override list has odd length: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            parts = key.split(".")
            node: CfgNode = self
            for p in parts[:-1]:
                assert p in node, f"Non-existent config key: {key}"
                node = node[p]
            leaf = parts[-1]
            assert leaf in node, f"Non-existent config key: {key}"
            old = node[leaf]
            node[leaf] = _coerce_value(value, old, key)

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=None, sort_keys=True)

    def __str__(self) -> str:
        return self.dump()


def _coerce_value(value: Any, old: Any, full_key: str) -> Any:
    """Parse CLI string value and check type compatibility against the default."""
    if isinstance(value, str):
        # yacs decodes CLI values with literal_eval first (python tuples like
        # "('a','b')" are not valid YAML), falling back to YAML parsing
        import ast

        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            try:
                value = yaml.safe_load(value)
            except yaml.YAMLError:
                pass
    if isinstance(value, (list, tuple)) and isinstance(old, (list, tuple)):
        return type(old)(value)
    if old is None or value is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, bool):
            return value
        raise ValueError(f"Type mismatch for {full_key}: expected bool, got {value!r}")
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, (int, float, str)) and isinstance(value, type(old)):
        return value
    if type(old) is type(value):
        return value
    raise ValueError(
        f"Type mismatch for {full_key}: {type(old).__name__} vs {type(value).__name__} ({value!r})"
    )


def _merge_a_into_b(a: "CfgNode", b: "CfgNode") -> None:
    for k, v_a in a.items():
        if k == _BASE_KEY:
            continue
        if k in b and isinstance(b[k], CfgNode) and isinstance(v_a, (dict, CfgNode)):
            _merge_a_into_b(CfgNode(v_a) if not isinstance(v_a, CfgNode) else v_a, b[k])
        else:
            if k in b:
                v_a = _coerce_value(v_a, b[k], k)
            dict.__setitem__(b, k, CfgNode(v_a) if isinstance(v_a, dict) else v_a)


def _load_yaml_with_base(filename: str) -> Dict[str, Any]:
    """Load YAML, recursively resolving ``_BASE_`` (reference configs nest 4-deep,
    e.g. voc07_oicr_plus.yaml -> ... -> configs/Base-RCNN-DilatedC5.yaml)."""
    with open(filename, "r") as f:
        cfg = yaml.safe_load(f) or {}
    base = cfg.pop(_BASE_KEY, None)
    if base is None:
        return cfg
    if not os.path.isabs(base):
        base = os.path.join(os.path.dirname(filename), base)
    base_cfg = _load_yaml_with_base(base)
    merged = CfgNode(base_cfg)
    _merge_a_into_b(CfgNode(cfg), merged)
    return merged.to_dict()
