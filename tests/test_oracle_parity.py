"""The local mirror of the driver's correctness gate: every query in
__spark_entry__.queries() vs its DuckDB oracle, exact value equality."""

import pytest

from tests.oracle_harness import compare, duck_connect
from tests.conftest import SF_DIR

import __spark_entry__ as entry_mod

ALL = sorted(entry_mod.queries().keys())


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns  # stable schema


def test_all_queries_have_oracles():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(q) - set(o)
    # every operator should have an oracle unless genuinely non-SQL
    assert not missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", ALL)
def test_oracle_types_driver_safe(duck, name):
    """The driver hashes Arrow values, so a DuckDB HUGEINT (int128, from an
    un-cast sum() over BIGINT) hash-mismatches Spark's int64 even when the
    values are numerically identical. Local value-compare can't see that —
    assert at the type level instead."""
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        return
    types = [str(t).upper() for t in duck.sql(sql).types]
    bad = [t for t in types if "HUGEINT" in t or "INT128" in t]
    assert not bad, f"{name}: oracle emits driver-unsafe types {types}"


@pytest.mark.parametrize("name", ALL)
def test_oracle_parity(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = fn(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0
        return
    ok, msg = compare(df, duck, sql)
    assert ok, f"{name}: {msg}"


SF01 = "/root/testdata/sf0.1"

#: queries whose aggregates grow with data volume — the class that can
#: silently overflow a too-small DECIMAL at 10x the gate's scale while
#: staying green at sf0.01 (q_stats_sizes did exactly this: the sum fit
#: DECIMAL(18) at the gate SF, overflowed at sf0.1 — Spark NULLed the
#: cast under ANSI-off, DuckDB errored).
VOLUME_AGGREGATES = [
    "q_stats_sizes",
    "q1_pricing_summary",
    "q_salted_agg",
    "dp_token_counts",
    "dp_corpus_pipeline",
]


@pytest.mark.parametrize("name", VOLUME_AGGREGATES)
def test_volume_aggregates_hold_at_10x_scale(spark, name):
    """Parity spot-check at sf0.1 for volume-growing aggregates."""
    import os

    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    duck01 = duck_connect(SF01)
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ok, msg = compare(fn(spark, SF01), duck01, sql)
    assert ok, f"{name} at sf0.1: {msg}"
