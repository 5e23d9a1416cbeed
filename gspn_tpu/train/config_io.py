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
