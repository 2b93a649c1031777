"""The comparator itself: the >1M-row streamed-digest path must be
exactly as strict as the sorted-tuple path (same normalization), since
it silently takes over for big pair results in the large-SF sweeps."""

import duckdb
import pytest

import tests.oracle_harness as oh


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture()
def small_threshold(monkeypatch):
    monkeypatch.setattr(oh, "BIG_RESULT_ROWS", 10)


def test_digest_path_matches_equal_results(spark, duck, small_threshold):
    df = spark.range(100).selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s")
    ok, msg = oh.compare(
        df, duck, "SELECT range AS id, range * 2 AS v, CAST(range AS VARCHAR) AS s FROM range(100)"
    )
    assert ok and "digest" in msg


def test_digest_path_catches_single_value_difference(spark, duck, small_threshold):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    ok, msg = oh.compare(
        df,
        duck,
        "SELECT range AS id, range * 2 + (CASE WHEN range = 99 THEN 1 ELSE 0 END) AS v FROM range(100)",
    )
    assert not ok and "digest" in msg


def test_digest_path_catches_count_difference(spark, duck, small_threshold):
    df = spark.range(100).selectExpr("id")
    ok, msg = oh.compare(df, duck, "SELECT range AS id FROM range(101)")
    assert not ok and "count" in msg


def test_digest_path_is_multiset_not_set(spark, duck, small_threshold):
    # two copies of a row vs one copy + a different row: a set/xor-based
    # digest would cancel duplicates; the sum digest must not
    df = spark.createDataFrame([(1,), (1,), (2,)], "id long")
    ok, _ = oh.compare(
        df, duck, "SELECT 1 AS id UNION ALL SELECT 1 UNION ALL SELECT 2"
    )
    assert ok
    ok, msg = oh.compare(
        df, duck, "SELECT 1 AS id UNION ALL SELECT 2 UNION ALL SELECT 2"
    )
    assert not ok


def test_small_results_still_use_exact_sorted_compare(spark, duck):
    df = spark.range(5).selectExpr("id")
    ok, msg = oh.compare(df, duck, "SELECT range AS id FROM range(5)")
    assert ok and "digest" not in msg
