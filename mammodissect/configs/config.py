"""Dataclass-config utilities: YAML/JSON overlay + dotted CLI overrides.

Usage:
    cfg = load_config(DissectConfig, "runs/dissect_vindr.yaml",
                      overrides=["similarity_fn=wpmi", "top_k=50"])

Replaces the reference's three overlapping config systems (argparse flags at
`describe_broad_neurons.py:15-49`, hardcoded dicts at `concept_vit/utils.py:434-443`,
hydra YAML under `configs/` with the root `zs_clip.yaml`)."""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def _load_file(path: str) -> Dict[str, Any]:
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml

            return yaml.safe_load(text) or {}
        except ImportError:
            raise RuntimeError("pyyaml not available; use JSON config files")
    return json.loads(text)


def _coerce(value: str, field_type) -> Any:
    """Parse a CLI override string to the field's type. field_type may be a type
    OR a string annotation — config dataclasses live in modules with
    `from __future__ import annotations`, so dataclasses.fields reports types as
    strings ('bool', 'Optional[float]', ...)."""
    if isinstance(field_type, str):
        t = field_type.replace("Optional[", "").rstrip("]").strip()
        field_type = {"int": int, "float": float, "bool": bool, "str": str}.get(t)
    if field_type is int:
        return int(value)
    if field_type is float:
        return float(value)
    if field_type is bool:
        return value.lower() in ("1", "true", "y", "yes")
    if field_type is str:
        return value
    try:
        return json.loads(value)
    except (json.JSONDecodeError, ValueError):
        return value


def apply_overrides(data: Dict[str, Any], overrides: Sequence[str],
                    cls: Optional[Type] = None) -> Dict[str, Any]:
    """'key=value' / 'nested.key=value' overrides into a config dict."""
    types = {}
    if cls is not None and dataclasses.is_dataclass(cls):
        types = {f.name: f.type for f in dataclasses.fields(cls)}
    out = dict(data)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        ftype = types.get(parts[0]) if len(parts) == 1 else None
        node[parts[-1]] = _coerce(value, ftype)
    return out


def load_config(cls: Type[T], path: Optional[str] = None,
                overrides: Sequence[str] = ()) -> T:
    data: Dict[str, Any] = _load_file(path) if path else {}
    data = apply_overrides(data, overrides, cls)
    field_names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - field_names
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    # tuples serialized as lists
    for f in dataclasses.fields(cls):
        if f.name in data and isinstance(data[f.name], list) and f.type in (tuple, "tuple"):
            data[f.name] = tuple(data[f.name])
    return cls(**data)


def save_config(cfg, path: str):
    data = dataclasses.asdict(cfg)
    with open(path, "w") as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            yaml.safe_dump(data, f, sort_keys=False)
        else:
            json.dump(data, f, indent=2, default=str)
