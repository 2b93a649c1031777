"""Round-14 optimization pins: the expr-string rewrites in
baker_spark/datapipe/vectors.py must be VALUE-IDENTICAL to the Column
formulations they replaced (the rewrites target driver-side build cost
only — py4j round trips — never results)."""

import pytest
from pyspark.sql import functions as F

from baker_spark.datapipe import vectors as V
from baker_spark.session import fan_out
from baker_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _old_lsh_buckets(df, vec_col="embedding", id_col="vec_id", planes=None, keep=()):
    """The r13 Column-chained formulation, kept verbatim as the pin."""
    planes = planes or V.hyperplanes()
    df = fan_out(df, by=id_col)
    v = V.as_double(vec_col)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x).cast("double") for x in plane])
        bucket = bucket + F.when(V.dot(v, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return df.select(F.col(id_col), *[F.col(c) for c in keep], bucket.alias("bucket"))


def test_lsh_buckets_expr_matches_column_form(emb):
    old = _old_lsh_buckets(emb).orderBy("vec_id").collect()
    new = V.lsh_buckets(emb).orderBy("vec_id").collect()
    assert old == new and len(old) > 0


def test_quantize_expr_matches_column_form(emb):
    old = emb.select(
        F.col("vec_id"), V.quantize(V.as_double("embedding")).alias("q")
    ).orderBy("vec_id").collect()
    new = emb.selectExpr(
        "vec_id",
        V.spark_quantize_sql("cast(`embedding` as array<double>)") + " AS q",
    ).orderBy("vec_id").collect()
    assert old == new and len(old) > 0


def test_dot_long_expr_matches_column_form(emb):
    q = emb.select(
        F.col("vec_id"), V.quantize(V.as_double("embedding")).alias("q")
    )
    old = q.select("vec_id", V.dot_long(F.col("q"), F.col("q")).alias("n2")).orderBy(
        "vec_id"
    ).collect()
    new = q.selectExpr("vec_id", V.spark_dot_long_sql("q", "q") + " AS n2").orderBy(
        "vec_id"
    ).collect()
    assert old == new and len(old) > 0


def test_cosine_pairs_expr_matches_column_form(spark, emb):
    """Pin the full pair kernel (quantize + self-norm + c4 CASE) against
    the r13 Column formulation, threshold low enough to emit rows."""
    q = emb.select(F.col("vec_id").alias("id"), V.quantize(V.as_double("embedding")).alias("q"))
    qn = q.select("id", "q", V.dot_long(F.col("q"), F.col("q")).alias("n2"))
    a = qn.select(F.col("id").alias("id_a"), F.col("q").alias("qa"), F.col("n2").alias("na"))
    b = qn.select(F.col("id").alias("id_b"), F.col("q").alias("qb"), F.col("n2").alias("nb"))
    d = V.dot_long(F.col("qa"), F.col("qb"))
    c4 = F.when((F.col("na") == 0) | (F.col("nb") == 0), F.lit(0.0)).otherwise(
        F.floor(
            d.cast("double")
            * F.lit(10000.0)
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
        )
    )
    old = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", c4.cast("long").alias("cosine_c4"))
        .filter(F.col("cosine_c4") >= 1000)
        .orderBy("id_a", "id_b")
        .collect()
    )
    new = (
        V.cosine_pairs(emb, threshold_c4=1000, max_rows=100_000)
        .orderBy("id_a", "id_b")
        .collect()
    )
    assert old == new and len(old) > 0
