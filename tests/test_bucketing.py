"""Bucketed co-located join: the write-once-shuffle-never pattern.

Asserts the actual scale guarantee — the joint plan contains NO Exchange
on either side — and that results equal the plain (shuffling) join.
"""

import contextlib
import io

from pyspark.sql import functions as F

from baker_spark.sources.bucketing import bucketize, colocated_join
from baker_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark):
    # (warehouse dir is static session config; the default spark-warehouse
    # under cwd is fine — saveAsTable overwrites on re-run)
    li = bucketize(spark, SF_DIR, "lineitem", "l_orderkey", buckets=4)
    o = bucketize(spark, SF_DIR, "orders", "o_orderkey", buckets=4)

    # at test SF both sides fit the broadcast threshold, which would
    # bypass (and disable) the bucketed scan; turn it off to exercise
    # the plan shape that matters at fact-x-fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, li, o, "l_orderkey", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing replaced both shuffles

        expected = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
