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
    /root/reference/config.go:300-351) and implement ``apply``.

    Hoisting metadata (used by :func:`prefilter` to push pure predicates
    above an engine-inserted shuffle barrier such as ``fan_out``):

    - ``keep_predicate()`` — for side-effect-free predicate operators,
      the keep-condition as a Column over STRING views of the fields it
      reads (so it evaluates identically on a natively-typed scan and on
      the all-string record frame); ``None`` for everything else.
    - ``reads`` — fields the predicate reads (None = unknown).
    - ``writes`` — fields the operator writes; ``None`` means unknown
      (treated as a hoisting barrier), ``[]`` means pure predicate.
    """

    name: str = ""
    #: fields written by this operator; None = unknown (barrier for hoisting)
    writes: list[str] | None = None
    #: fields read by the keep-predicate; None = not a hoistable predicate
    reads: list[str] | None = None
    #: True for predicates whose per-row evaluation is costly (regex,
    #: parse-to-int). The barrier hoist skips these: when ``fan_out``
    #: actually repartitions, the pre-exchange stage is the narrow
    #: (often serial) scan, and an expensive predicate there costs more
    #: wall time than its exchange savings unless it is very selective —
    #: measured ~10% on the reference-topology bench. They still run
    #: exactly once, in the parallel post-exchange chain. (On a real
    #: multi-split input fan_out is a no-op and Catalyst pushes ALL
    #: predicates into the scan as usual — this flag only shapes the
    #: engine's own above-the-exchange hoist.)
    expensive_predicate: bool = False

    def keep_predicate(self) -> Column | None:
        return None

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


def hoist_predicates(ops: list[Operator]) -> list[Column]:
    """Keep-predicates that may legally run BEFORE the chain.

    Walk the chain in order, tracking which fields earlier operators
    write. A pure predicate hoists iff it reads none of them (predicates
    commute with each other; re-evaluating one later is idempotent, so
    the unchanged chain can still run afterwards). An operator with
    unknown writes is a barrier — nothing after it hoists. This mirrors
    what Catalyst's PushDownPredicates does, but across the engine's own
    fan-out/repartition barrier, which Catalyst must not cross.

    Delegates to :func:`split_chain` — the five-clause hoist-legality
    condition lives in exactly one place, so the two entry points can
    never drift on which predicates run below the barrier."""
    return split_chain(ops)[0]


def prefilter(df: DataFrame, ops: list[Operator]) -> DataFrame:
    """Apply the chain's hoistable predicates to ``df`` (typically the
    natively-typed scan) so a following ``fan_out``/``repartition``
    shuffles only surviving rows. The full chain still runs after the
    barrier — its predicates then drop nothing, cheaply."""
    for p in hoist_predicates(ops):
        df = df.filter(p)
    return df


def split_chain(ops: list[Operator]) -> tuple[list[Column], list[Operator]]:
    """Like :func:`hoist_predicates`, but also returns the chain with the
    fully-hoisted predicates ELIDED. An op may be dropped from the
    post-barrier chain iff its keep-predicate hoisted AND it writes
    nothing (``writes == []``): then ``apply()`` is exactly
    ``filter(keep_predicate)``, which already ran below the barrier, and
    a second evaluation would drop nothing — each filter runs once, like
    the reference's single-pass chain (topology.go:204-218). Transforms
    and barriers keep their place and order."""
    preds: list[Column] = []
    remaining: list[Operator] = []
    written: set[str] = set()
    barrier = False
    for op in ops:
        kp = op.keep_predicate()
        hoisted = (
            not barrier
            and kp is not None
            and not op.expensive_predicate
            and op.reads is not None
            and not (set(op.reads) & written)
        )
        if hoisted:
            preds.append(kp)
        if hoisted and op.writes == []:
            pass  # pure predicate, fully represented by the hoisted filter
        else:
            remaining.append(op)
        if op.writes is None:
            barrier = True
        else:
            written |= set(op.writes)
    return preds, remaining
