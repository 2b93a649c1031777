"""ClauseFilter — keep rows matching a boolean s-expression over field
equality atoms.

Reference semantics (/root/reference/filter/clausefilter.go:143-282):
  grammar    : clause := '(' ('and'|'or'|'not') clause* ')' | '(' field value ')'
  empty text : keep everything (true)
  '(and)'    : matches nothing (false)     [sic — see parseClauseSexp]
  '(or)'     : matches everything (true)
  '(and X)'  : X         (single-arg collapses to the argument)
  atom       : byte-equality of field value against the literal

The s-expression compiles to a single Catalyst ``Column`` expression, so
short-circuiting, CNF conversion and predicate pushdown come from the
optimizer instead of the reference's hand-rolled tree walk.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, functions as F

from baker_spark.operators.base import Operator, register


def tokenize(text: str) -> list[str]:
    return text.replace("(", " ( ").replace(")", " ) ").split()


def _parse(tokens: list[str], pos: int):
    """Recursive-descent parse -> (node, next_pos); node is a nested list."""
    if tokens[pos] != "(":
        return tokens[pos], pos + 1
    pos += 1
    children = []
    while pos < len(tokens) and tokens[pos] != ")":
        node, pos = _parse(tokens, pos)
        children.append(node)
    if pos >= len(tokens):
        raise ValueError("unbalanced s-expression")
    return children, pos + 1


def parse_sexpr(text: str):
    tokens = tokenize(text)
    if not tokens:
        return None
    node, pos = _parse(tokens, 0)
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in s-expression: {tokens[pos:]}")
    return node


def compile_clause_sql(node, columns: list[str] | None = None) -> str:
    """Compile a parsed s-expression node to a Spark-SQL predicate
    string (round 14): one expr parse instead of ~5 py4j Column round
    trips per atom. Identical expression — names backtick-escaped,
    values single-quote/backslash-escaped, every combinator
    parenthesized like the Column operators were."""
    if node is None:
        return "true"
    if not isinstance(node, list) or not node:
        raise ValueError(f"bad clause node: {node!r}")
    head = node[0]
    args = node[1:]
    if head == "and":
        if not args:
            return "false"  # clausefilter.go:151-156 — '(and)' is false
        return "(" + " AND ".join(compile_clause_sql(a, columns) for a in args) + ")"
    if head == "or":
        if not args:
            return "true"  # clausefilter.go:151-156 — '(or)' is true
        return "(" + " OR ".join(compile_clause_sql(a, columns) for a in args) + ")"
    if head == "not":
        if len(args) != 1:
            raise ValueError("'not' takes exactly one clause")
        return f"(NOT {compile_clause_sql(args[0], columns)})"
    # atom: (field value) — byte equality; empty field == null (baker
    # fidelity). The string cast makes the atom evaluate identically on a
    # natively-typed scan (predicate hoisting) and the all-string frame.
    if len(node) != 2 or isinstance(node[1], list) or isinstance(head, list):
        raise ValueError(f"cannot interpret clause {node!r}")
    field, value = head, node[1]
    if columns is not None and field not in columns:
        raise KeyError(f"no such field: {field}")
    col = f"cast(`{field.replace('`', '``')}` as string)"
    if value == "":
        return f"({col} IS NULL OR {col} = '')"
    lit = "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return f"(coalesce({col}, '') = {lit})"


def compile_clause(node, columns: list[str] | None = None) -> Column:
    """Compile a parsed s-expression node to a Column predicate."""
    return F.expr(compile_clause_sql(node, columns))


def clause_fields(node) -> list[str]:
    """Atom field names referenced by a parsed s-expression."""
    if node is None:
        return []
    if isinstance(node, list) and node and node[0] in ("and", "or", "not"):
        out: list[str] = []
        for child in node[1:]:
            out.extend(clause_fields(child))
        return out
    if isinstance(node, list) and len(node) == 2:
        return [node[0]]
    return []


@register
class ClauseFilter(Operator):
    """Keep rows matching a boolean s-expression over field equality
    atoms: (and ...) (or ...) (not ...) (field value); empty clause keeps
    everything (/root/reference/filter/clausefilter.go:14-77)."""

    name = "ClauseFilter"
    writes: list[str] = []

    def __init__(self, clause: str = ""):
        self.clause = clause.strip()
        self._ast = parse_sexpr(self.clause) if self.clause else None
        self.reads = sorted(set(clause_fields(self._ast)))

    def predicate(self, columns: list[str] | None = None) -> Column:
        return compile_clause(self._ast, columns)

    def keep_predicate(self) -> Column | None:
        if self._ast is None:
            return None  # empty clause keeps everything — nothing to hoist
        return self.predicate()

    def apply(self, df: DataFrame) -> DataFrame:
        if self._ast is None:
            return df
        return df.filter(self.predicate(df.columns))
