"""Config-driven application assembly (reference
`csp_gateway/server/config/__init__.py:19-43` + the hydra/ccflow YAML
convention in `server/config/gateway/*.yaml`).

Dependency-light reimplementation of the pieces the reference's YAML
actually uses:

- ``_target_: dotted.path.Cls`` nodes instantiate recursively with
  their remaining keys as kwargs;
- ``${a.b}`` interpolates another config value; ``${env:VAR,default}``
  (also accepted spelled ``oc.env``) reads the environment;
- module lists may reference registry entries by path
  (``/modules/example_module``);
- ``overrides=["a.b=c", "+x=1"]`` apply dotted-path assignments before
  resolution (hydra's command-line override shape).

``load_gateway`` returns the instantiated ``gateway`` entry, matching
the reference's entry point.
"""

from __future__ import annotations

import importlib
import os
import re
from typing import Any, Dict, List, Optional, Union

import yaml

__all__ = ["load_config", "load_gateway", "instantiate"]

_INTERP = re.compile(r"\$\{([^}]+)\}")


def _import_target(path: str) -> Any:
    module, _, attr = path.rpartition(".")
    if not module:
        raise ValueError(f"_target_ must be a dotted path, got {path!r}")
    return getattr(importlib.import_module(module), attr)


def _get_path(root: Any, dotted: str) -> Any:
    cur = root
    for part in dotted.strip("/").replace("/", ".").split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        else:
            cur = cur[part]
    return cur


def _set_path(root: Dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.lstrip("+").split(".")
    cur = root
    for part in parts[:-1]:
        cur = cur.setdefault(part, {})
    cur[parts[-1]] = value


def _parse_scalar(text: str) -> Any:
    return yaml.safe_load(text)


def _resolve_interp(value: Any, root: Any, _seen: Optional[frozenset] = None) -> Any:
    if isinstance(value, str):
        whole = _INTERP.fullmatch(value.strip())
        if whole:
            return _lookup(whole.group(1), root, _seen)

        def sub(m: re.Match) -> str:
            return str(_lookup(m.group(1), root, _seen))

        return _INTERP.sub(sub, value)
    if isinstance(value, dict):
        return {k: _resolve_interp(v, root, _seen) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_interp(v, root, _seen) for v in value]
    return value


def _lookup(expr: str, root: Any, _seen: Optional[frozenset] = None) -> Any:
    expr = expr.strip()
    for prefix in ("oc.env:", "env:"):
        if expr.startswith(prefix):
            name, _, default = expr[len(prefix):].partition(",")
            return os.environ.get(name.strip(), _parse_scalar(default.strip()) if default else None)
    seen = _seen or frozenset()
    if expr in seen:
        raise ValueError(f"interpolation cycle through ${{{expr}}}")
    # Chained interpolation (a: ${b}, b: ${env:X}) must resolve
    # transitively, as hydra/OmegaConf does — a raw lookup would hand
    # back the literal '${env:X}' string.
    return _resolve_interp(_get_path(root, expr), root, seen | {expr})


def instantiate(node: Any, root: Any = None) -> Any:
    """Recursively build objects from ``_target_`` nodes.  Registry
    references (strings starting with '/') resolve against ``root``
    and instantiate in place — the reference's ``- /modules/x`` list
    convention."""
    root = root if root is not None else node
    if isinstance(node, str) and node.startswith("/"):
        return instantiate(_get_path(root, node), root)
    if isinstance(node, list):
        return [instantiate(v, root) for v in node]
    if isinstance(node, dict):
        built = {k: instantiate(v, root) for k, v in node.items() if k != "_target_"}
        if "_target_" in node:
            target = _import_target(node["_target_"])
            return target(**built)
        return built
    return node


def load_config(
    source: Union[str, Dict[str, Any]],
    overrides: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """YAML path (or pre-parsed dict) → interpolated, override-applied
    config dict (not yet instantiated — see ``instantiate``)."""
    if isinstance(source, str):
        with open(source) as fh:
            cfg = yaml.safe_load(fh) or {}
    else:
        cfg = dict(source)
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        _set_path(cfg, key.strip(), _parse_scalar(raw.strip()))
    return _resolve_interp(cfg, cfg)


def load_gateway(
    source: Union[str, Dict[str, Any]],
    overrides: Optional[List[str]] = None,
    key: str = "gateway",
) -> Any:
    """The reference's entry point: load config, instantiate, return
    the gateway object (`config/__init__.py:40-43`)."""
    cfg = load_config(source, overrides)
    if key not in cfg:
        raise KeyError(f"config has no {key!r} entry")
    return instantiate(cfg[key], cfg)
