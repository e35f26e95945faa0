"""Shared YAML loading utilities.

The reference uses RapidYAML which hands back raw scalar strings and sniffs
types itself in the order int → double → bool → string
(``src/yaml_common.cpp:205+``). PyYAML's default resolver differs (e.g. it
fails on ``1e-9`` floats and eagerly converts ``0.0`` mapping values that the
SNN format needs as core addresses), so we load every scalar as a raw string
and coerce explicitly at each use site via ``coerce_scalar``.
"""

from __future__ import annotations

from typing import Any, IO

import yaml


class RawLoader(yaml.SafeLoader):
    """SafeLoader with implicit scalar resolution disabled: all scalars load
    as plain strings (structure resolution is unaffected)."""


# Drop every implicit resolver so scalars stay strings.
RawLoader.yaml_implicit_resolvers = {}

# libyaml-backed variant (scan/parse in C, ~10x faster on multi-MB nets);
# resolution still goes through the Python Resolver table, so stripping
# the implicit resolvers works identically.
if hasattr(yaml, "CSafeLoader"):

    class RawCLoader(yaml.CSafeLoader):
        pass

    RawCLoader.yaml_implicit_resolvers = {}
    _FAST_LOADER: Any = RawCLoader
else:  # pragma: no cover - libyaml always present in this image
    _FAST_LOADER = RawLoader


def raw_load(stream: IO[str] | str) -> Any:
    return yaml.load(stream, Loader=_FAST_LOADER)


def coerce_scalar(value: Any) -> Any:
    """Type-sniff a raw scalar in reference order: int, float, bool, str."""
    if not isinstance(value, str):
        return value
    text = value.strip()
    if not text:
        return value
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    lowered = text.lower()
    if lowered in ("true", "yes"):
        return True
    if lowered in ("false", "no"):
        return False
    return value
