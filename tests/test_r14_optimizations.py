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


def test_clausefilter_expr_matches_column_form(spark):
    """The expr-string clause compiler must keep every reference edge:
    empty clause, (and)/(or), single-arg collapse, empty-value atom,
    null fields, quotes/backslashes in values."""
    from functools import reduce
    from baker_spark.operators.clausefilter import (
        ClauseFilter,
        parse_sexpr,
    )

    df = spark.createDataFrame(
        [("N", "O", None), ("A", "", "x'y"), (None, "F", "a\\b"), ("N", "F", "z")],
        "f1 string, f2 string, f3 string",
    )

    def old_compile(node):
        if node is None:
            return F.lit(True)
        head, args = node[0], node[1:]
        if head == "and":
            return (
                reduce(lambda a, b: a & b, (old_compile(a) for a in args))
                if args
                else F.lit(False)
            )
        if head == "or":
            return (
                reduce(lambda a, b: a | b, (old_compile(a) for a in args))
                if args
                else F.lit(True)
            )
        if head == "not":
            return ~old_compile(args[0])
        f, v = head, node[1]
        col = F.col(f).cast("string")
        if v == "":
            return col.isNull() | (col == F.lit(""))
        return F.coalesce(col, F.lit("")) == F.lit(v)

    for clause in [
        "(and (f1 N) (or (f2 O) (not (f3 x'y))))",
        "(or (and) (f3 a\\b))",
        "(not (f2 F))",
        "(f1 N)",
        "(and (f1 N))",
    ]:
        ast = parse_sexpr(clause)
        old = sorted(map(tuple, df.filter(old_compile(ast)).collect()), key=repr)
        new = sorted(map(tuple, ClauseFilter(clause).apply(df).collect()), key=repr)
        assert old == new, clause
    # empty clause keeps everything
    assert ClauseFilter("").apply(df).count() == 4


def test_regexmatch_expr_matches_column_form(spark):
    from functools import reduce
    from baker_spark.operators.transforms import RegexMatch

    df = spark.createDataFrame(
        [("abc", "x1"), ("a'b", None), (None, "d\\e"), ("", "zz")],
        "f1 string, f2 string",
    )
    pairs = [("f1", r"^a.*"), ("f2", r"[xz\d]|d\\e")]

    def old_pred(pairs, invert):
        m = reduce(
            lambda a, b: a & b,
            (
                F.coalesce(F.col(f).cast("string"), F.lit("")).rlike(rx)
                for f, rx in pairs
            ),
            F.lit(True),
        )
        return ~m if invert else m

    for invert in (False, True):
        old = sorted(map(tuple, df.filter(old_pred(pairs, invert)).collect()), key=repr)
        op = RegexMatch([p[0] for p in pairs], [p[1] for p in pairs], invert_match=invert)
        new = sorted(map(tuple, op.apply(df).collect()), key=repr)
        assert old == new, invert
    # Fields=[] keeps everything; inverted drops everything
    assert RegexMatch([], []).apply(df).count() == 4
    assert RegexMatch([], [], invert_match=True).apply(df).count() == 0


def test_schema_cache_one_entry_per_path(spark, tmp_path):
    """A rewritten file REPLACES its cache entry (no per-rewrite leak)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from baker_spark.sources import tables as T

    sf = str(tmp_path)
    path = os.path.join(sf, "documents.parquet")
    pq.write_table(pa.table({"doc_id": [1], "text": ["a"]}), path)
    T.load_table(spark, sf, "documents")
    n0 = len(T._SCHEMA_CACHE)
    pq.write_table(pa.table({"doc_id": [1], "lang": ["en"]}), path)
    os.utime(path, ns=(1, 1))
    df = T.load_table(spark, sf, "documents")
    assert set(df.columns) == {"doc_id", "lang"}
    assert len(T._SCHEMA_CACHE) == n0, "rewrite leaked a stale cache entry"
