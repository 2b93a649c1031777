"""Per-module query/oracle registry — the one definition of the
``@query`` decorator every catalog module previously copy-pasted.

Each module calls :func:`make_registry` once and decorates its queries;
``queries/__init__`` aggregates the per-module dicts (and rejects
duplicate names across modules)."""

from __future__ import annotations


def make_registry():
    """Returns ``(QUERIES, ORACLES, query)`` — fresh dicts plus the
    decorator that fills them."""
    queries: dict = {}
    oracles: dict = {}

    def query(name: str, oracle: str | None = None):
        def deco(fn):
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, query
