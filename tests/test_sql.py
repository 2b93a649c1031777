from baker_spark.sql import sql


def test_sql_catalog(spark, sf_dir):
    df = sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
        """,
    )
    rows = {r.l_returnflag: r.n for r in df.collect()}
    assert set(rows) == {"A", "N", "R"} and all(n > 0 for n in rows.values())
