"""Config system: YAML + dotted-target instantiation + CLI overrides.

Mirrors the reference's OmegaConf plumbing (lvdm/util.py:168-185
``instantiate_from_config``/``get_obj_from_str``; main.py:639-641 merge
of --base yamls with dotlist overrides) on plain PyYAML + dataclasses.
Every object is declared as ``{"target": "pkg.mod.Name", "params": {...}}``.
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Dict, List, Optional

import yaml


def get_obj_from_str(path: str):
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(cfg: Dict) -> Any:
    if "target" not in cfg:
        raise KeyError(f"config needs a 'target': {cfg}")
    cls = get_obj_from_str(cfg["target"])
    params = dict(cfg.get("params") or {})
    # nested {"target": ...} dicts instantiate recursively
    for k, v in list(params.items()):
        if isinstance(v, dict) and "target" in v:
            params[k] = instantiate_from_config(v)
    if dataclasses.is_dataclass(cls):
        # dataclass configs want tuples for list fields
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for k, v in list(params.items()):
            if isinstance(v, list) and k in fields:
                params[k] = tuple(v)
    return cls(**params)


def deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_configs(paths: List[str], dotlist: Optional[List[str]] = None) -> Dict:
    """Merge --base yamls left-to-right, then apply key=value dotlist
    overrides (main.py:639-641)."""
    cfg: Dict = {}
    for path in paths:
        with open(path) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    for item in dotlist or []:
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def save_config(cfg: Dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
