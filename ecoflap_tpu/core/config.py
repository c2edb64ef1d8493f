"""Config system — YAML trees + CLI dot-list overrides.

Rebuild of the reference's OmegaConf-based ``Config``
(LAVIS/lavis/common/config.py:16-144) without the OmegaConf dependency:
plain-YAML nested dicts, deep-merge of (model defaults <- runtime yaml <-
``--options`` dot-list), and the same three views (``run_cfg``,
``model_cfg``, ``datasets_cfg``).

Dot-list syntax matches the reference CLI: ``--options model.arch=blip2_t5
run.batch_size=8`` (config.py:120-144). Values parse as YAML scalars, so
``true``/``3``/``0.5`` type correctly.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Mapping, Optional, Sequence

import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def deep_merge(base: Mapping, override: Mapping) -> Dict[str, Any]:
    """Recursive dict merge; override wins; lists replace wholesale."""
    out: Dict[str, Any] = dict(copy.deepcopy(base))
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def parse_dot_list(options: Optional[Sequence[str]]) -> Dict[str, Any]:
    """['a.b=1', 'c=x'] -> nested dict, YAML-typed values."""
    tree: Dict[str, Any] = {}
    for opt in options or []:
        if "=" not in opt:
            raise ValueError(f"option {opt!r} must be key=value")
        key, raw = opt.split("=", 1)
        value = yaml.safe_load(raw)
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"option {opt!r} clashes with a scalar")
        node[parts[-1]] = value
    return tree


class Config:
    """Merged config with the reference's three views."""

    def __init__(
        self,
        cfg_path: Optional[str] = None,
        options: Optional[Sequence[str]] = None,
        defaults: Optional[Mapping[str, Any]] = None,
        tree: Optional[Mapping[str, Any]] = None,
    ) -> None:
        merged: Dict[str, Any] = dict(defaults or {})
        if cfg_path:
            merged = deep_merge(merged, load_yaml(cfg_path))
        if tree:
            merged = deep_merge(merged, tree)
        merged = deep_merge(merged, parse_dot_list(options))
        self.config = merged

    @property
    def run_cfg(self) -> Dict[str, Any]:
        return self.config.get("run", {})

    @property
    def model_cfg(self) -> Dict[str, Any]:
        return self.config.get("model", {})

    @property
    def datasets_cfg(self) -> Dict[str, Any]:
        return self.config.get("datasets", {})

    def get(self, dotted: str, default: Any = None) -> Any:
        node: Any = self.config
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def pretty(self) -> str:
        return yaml.safe_dump(self.config, sort_keys=False)
