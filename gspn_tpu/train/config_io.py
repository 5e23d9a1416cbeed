"""Config (de)serialization — dataclass config trees to/from JSON, saved
next to checkpoints so runs are self-describing (SURVEY.md §5 "Config /
flags": the reference's argparse flags are only recoverable from shell
history; here they ride with the run)."""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any


def _to_jsonable(obj: Any):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__dataclass__": type(obj).__name__,
            **{
                f.name: _to_jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, type):  # jnp dtypes arrive as types
        return str(obj.__name__)
    if callable(getattr(obj, "dtype", None)):
        return str(obj)
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        return str(obj)


def config_from_jsonable(obj: Any, registry: dict[str, type], *, _field=None):
    """Inverse of :func:`_to_jsonable` for dataclass config trees.

    ``registry`` maps the ``__dataclass__`` tag (class ``__name__``) to
    the dataclass type. Field types are recovered from the dataclass
    definition: JSON lists become tuples where the field's default is a
    tuple (the config convention here — every sequence field is a
    tuple), and a field named ``dtype`` accepts the string produced by
    ``_to_jsonable`` ("float32", "bfloat16", ...) and resolves it via
    ``jax.numpy``. Unknown ``__dataclass__`` tags raise, so artifacts
    from a newer library version fail loudly instead of half-loading.
    """
    if isinstance(obj, dict) and "__dataclass__" in obj:
        tag = obj["__dataclass__"]
        if tag not in registry:
            raise ValueError(
                f"unknown config dataclass {tag!r}; known: "
                f"{sorted(registry)}"
            )
        cls = registry[tag]
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in obj.items():
            if k == "__dataclass__":
                continue
            if k not in fields:
                raise ValueError(f"{tag} has no field {k!r}")
            kwargs[k] = config_from_jsonable(v, registry, _field=fields[k])
        return cls(**kwargs)
    if isinstance(obj, dict):
        return {k: config_from_jsonable(v, registry) for k, v in obj.items()}
    if isinstance(obj, list):
        inner = [config_from_jsonable(x, registry) for x in obj]
        return tuple(inner)
    if _field is not None and _field.name == "dtype" and isinstance(obj, str):
        import jax.numpy as jnp

        return getattr(jnp, obj)
    return obj


def save_config(path: str | pathlib.Path, **configs):
    """Write {name: config} trees as JSON. Accepts dataclasses, dicts,
    argparse Namespaces."""
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    payload = {}
    for name, cfg in configs.items():
        if hasattr(cfg, "__dict__") and not dataclasses.is_dataclass(cfg):
            cfg = vars(cfg)
        payload[name] = _to_jsonable(cfg)
    p.write_text(json.dumps(payload, indent=2, default=str))
    return p


def load_config(path: str | pathlib.Path) -> dict:
    return json.loads(pathlib.Path(path).read_text())
