"""Config system: attribute-accessible nested dicts loaded from YAML.

Capability parity with the reference's YAML config surface
(reference: src/train.py:55-61 — which relied on a missing `utils.AttrDict`;
this is that class, done properly).  The schema is the reference's:
three top-level sections `data / training / model`, model subsections
`signal / encoder / [assigner] / decoder` (reference: src/train.py:87-118).
"""

from __future__ import annotations

import copy
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursive wrapping, and .get defaults.

    Missing attribute access returns ``None`` (the reference configs rely on
    optional keys like ``continue_training:`` being falsy when absent).
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__()
        merged: dict = {}
        for a in args:
            if a is None:
                continue
            merged.update(a)
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            return None

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        """Plain nested dict (for serialization)."""
        out: dict = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    x.to_dict() if isinstance(x, Config) else x for x in v
                )
            else:
                out[k] = v
        return out

    def flat_items(self, prefix: str = "") -> Iterator[tuple]:
        for k, v in self.items():
            path = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, Config):
                yield from v.flat_items(path)
            else:
                yield path, v

    def override(self, other: Mapping | None) -> "Config":
        """Recursive update (used by infer-time config overrides,
        reference: src/infer.py:57-76)."""
        if not other:
            return self
        for k, v in other.items():
            if isinstance(v, Mapping) and isinstance(self.get(k), Config):
                self[k].override(v)
            else:
                self[k] = v
        return self


def parse_range(value: Any) -> tuple | None:
    """Parse the reference's ad-hoc string ranges, e.g. feat_range: "1,1000"
    (reference: src/train.py:60-61)."""
    if value is None:
        return None
    if isinstance(value, (list, tuple)):
        lo, hi = value
        return int(lo), int(hi)
    parts = str(value).split(",")
    return int(parts[0]), int(parts[1])


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return Config(raw or {})
