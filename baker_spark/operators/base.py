"""Operator base class + registry.

The reference wires filters by name from TOML (`FilterDesc{Name, New,
Config, Help}`, /root/reference/desc.go:76-81). Here an operator is a
declarative DataFrame -> DataFrame transform; a chain of operators is a
left-fold (`/root/reference/topology.go:204-218` runs them record-at-a-
time; Catalyst collapses our fold into one whole-stage-codegen stage).

Null semantics: the reference has no null distinct from "" (a field value
is []byte; empty == null, /root/reference/record.go:35-39). `is_empty`
below treats NULL and '' identically, and operators that write "cleared"
fields write ''.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


class Operator:
    """A declarative row-operator. Subclasses set ``name`` (the TOML
    component name, matched case-insensitively like the reference,
    /root/reference/config.go:300-351) and implement ``apply``."""

    name: str = ""

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


REGISTRY: dict[str, type[Operator]] = {}


def register(cls: type[Operator]) -> type[Operator]:
    REGISTRY[cls.name.lower()] = cls
    return cls


_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def _snake(key: str) -> str:
    return _CAMEL_RE.sub("_", key).lower()


def create(name: str, **config) -> Operator:
    """Instantiate an operator by (case-insensitive) name with TOML-style
    CamelCase or snake_case config keys. Unknown keys are rejected like
    the reference's config decode (config.go:404-406)."""
    cls = REGISTRY.get(name.lower())
    if cls is None:
        raise KeyError(f"unknown operator {name!r}; known: {sorted(REGISTRY)}")
    kwargs = {_snake(k): v for k, v in config.items()}
    try:
        return cls(**kwargs)
    except TypeError as e:
        import inspect

        valid = [p for p in inspect.signature(cls.__init__).parameters if p != "self"]
        raise ValueError(
            f"bad config for {cls.name}: {e}; valid keys: {valid}"
        ) from e


def is_empty(col: Column | str) -> Column:
    """Baker-style null test: NULL or empty string (record.go:35-39)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (c == F.lit(""))


def chain(df: DataFrame, ops: list[Operator]) -> DataFrame:
    for op in ops:
        df = op.apply(df)
    return df
