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
