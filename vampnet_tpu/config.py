"""Config/flag system — an argbind-compatible replacement (SURVEY.md L8).

The reference drives every script with `argbind`: YAML files with `$include`
composition, `Class.attr` keys, `scope/` prefixes for per-split overrides, and
CLI `--args.load conf.yml --Class.attr value` overrides (reference
scripts/exp/train.py:48-73, conf/*.yml, README "a note on argbind").

This module reproduces that surface on plain dataclasses/dicts:

    args = parse_args()                       # --args.load + --Key value
    cfg  = load_config("conf/lora/lora.yml")  # resolves $include chains
    with scope(args, "train"):                # train/AudioDataset.x wins
        val = bound(args, "AudioDataset", "duration")
"""
from __future__ import annotations

import argparse
import contextlib
import copy
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

_ACTIVE_SCOPES: List[str] = []


def load_config(path) -> Dict[str, Any]:
    """Load a YAML config, resolving `$include` lists recursively. Later
    includes override earlier ones; the including file overrides includes
    (argbind semantics)."""
    path = Path(path)
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    includes = data.pop("$include", [])
    merged: Dict[str, Any] = {}
    for inc in includes:
        inc_path = Path(inc)
        if not inc_path.exists():
            inc_path = path.parent / inc
        merged.update(load_config(inc_path))
    merged.update(data)
    return merged


def parse_args(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    """Parse `--args.load conf.yml` plus arbitrary `--Key value` overrides
    into a flat config dict."""
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--args.load", dest="load", default=None)
    parser.add_argument("--args.debug", dest="debug", default=None)
    known, rest = parser.parse_known_args(argv)
    args: Dict[str, Any] = {}
    if known.load:
        args.update(load_config(known.load))
    key = None
    for tok in rest:
        if tok.startswith("--"):
            if "=" in tok:
                k, v = tok[2:].split("=", 1)
                args[k] = _parse_value(v)
                key = None
            else:
                key = tok[2:]
                args[key] = True  # bare flag
        elif key is not None:
            prev = args.get(key)
            if prev is True:
                args[key] = _parse_value(tok)
            elif isinstance(prev, list):
                prev.append(_parse_value(tok))
            else:
                args[key] = [prev, _parse_value(tok)]
    return args


def _parse_value(v: str) -> Any:
    try:
        return yaml.safe_load(v)
    except Exception:
        return v


@contextlib.contextmanager
def scope(args: Dict[str, Any], name: str = ""):
    """Activate a scope: keys `name/Key` shadow `Key` inside the context
    (argbind.scope semantics, reference train.py:93-98,742)."""
    if name:
        _ACTIVE_SCOPES.append(name)
    try:
        yield args
    finally:
        if name:
            _ACTIVE_SCOPES.pop()


def bound(args: Dict[str, Any], prefix: str, attr: str, default: Any = None) -> Any:
    """Look up `prefix.attr`, honoring active scopes (innermost first)."""
    key = f"{prefix}.{attr}" if prefix else attr
    for s in reversed(_ACTIVE_SCOPES):
        scoped_key = f"{s}/{key}"
        if scoped_key in args:
            return args[scoped_key]
    return args.get(key, default)


def bind_kwargs(args: Dict[str, Any], prefix: str, **defaults) -> Dict[str, Any]:
    """Collect all `prefix.attr` keys (scope-aware) merged over defaults —
    the argbind.bind(Class) call pattern."""
    out = dict(defaults)
    for k in sorted(args):
        base = k.split("/")[-1]
        if base.startswith(prefix + "."):
            attr = base[len(prefix) + 1 :]
            if "/" in k:
                s = k.rsplit("/", 1)[0]
                if s not in _ACTIVE_SCOPES:
                    continue
            if "." in attr:
                continue
            out[attr] = bound(args, prefix, attr, out.get(attr))
    return out


def dump_args(args: Dict[str, Any], path) -> None:
    """Write resolved args (reference train.py:661 writes args.yml)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(args, f, default_flow_style=False)


def generate_conf(path, include: List[str], overrides: Dict[str, Any]) -> None:
    """Write a derived conf (the fine_tune.py conf-generation workflow,
    reference scripts/exp/fine_tune.py:25-68)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = {"$include": include, **overrides} if include else dict(overrides)
    with open(path, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)
