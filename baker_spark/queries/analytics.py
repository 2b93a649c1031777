"""Headline analytics queries — the aggregation/join/window/stats surface
the Spark engine adds over the reference's record-at-a-time model (the
reference's only aggregating sink is Stats, output/stats.go; everything
else here comes from the DataFrame engine "for free" per SURVEY.md §2.6,
but is part of this engine's query capability and the bench suite).

Determinism: monetary aggregates run in exact DECIMAL(18,6) and are
emitted as floor(x*10^k) BIGINT fixed-point (``*_c2`` cents / ``*_c6``
micros — see functions/numeric.py for why doubles can't be compared
across engines).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from baker_spark.functions.numeric import DEC, c2_long, cents, dec, duck_c2_long, micros
from baker_spark.sinks.stats import Stats
from baker_spark.sinks.filewriter import serialize_line
from baker_spark.sources.tables import load_table

from baker_spark.queries.registry import make_registry

QUERIES, ORACLES, query = make_registry()


# --------------------------------------------------------------- flagship ---

@query(
    "q1_pricing_summary",
    f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         {duck_c2_long('l_quantity')} AS qc,
         {duck_c2_long('l_extendedprice')} AS pc,
         {duck_c2_long('l_discount')} AS dc,
         {duck_c2_long('l_tax')} AS tc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qc) AS BIGINT) AS sum_qty_c2,
       CAST(sum(pc) AS BIGINT) AS sum_base_c2,
       CAST(sum(pc * (100 - dc)) // 100 AS BIGINT) AS sum_disc_c2,
       CAST(sum(pc * (100 - dc) * (100 + tc)) // 10000 AS BIGINT) AS sum_charge_c2,
       CAST((sum(qc) * 10000) // count(*) AS BIGINT) AS avg_qty_c6,
       count(*) AS count_order
FROM c GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy two-key aggregation. The shipdate
    filter and 8-column pruning push down to the parquet scan; money
    converts to exact BIGINT cents at the scan (c2_long) so the whole
    aggregate runs in long arithmetic — measured ~1.7x faster than
    DECIMAL(18,6) sums with bit-identical results (every product/sum
    below stays exact integer: price_c2 * (100-disc_c2) * (100+tax_c2)
    is the charge in 1e-6 units; floor(x*100) == that sum div 10000)."""
    li = load_table(spark, sf_dir, "lineitem")
    qc, pc = c2_long("l_quantity"), c2_long("l_extendedprice")
    dc, tc = c2_long("l_discount"), c2_long("l_tax")
    staged = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    ).select(
        "l_returnflag",
        "l_linestatus",
        qc.alias("qc"),
        pc.alias("pc"),
        (pc * (F.lit(100) - dc)).alias("d4"),
        (pc * (F.lit(100) - dc) * (F.lit(100) + tc)).alias("c6"),
    )
    # per-row arithmetic stays in long; the SUM buffers run in
    # DECIMAL(38,0) (precision 38 ≈ 1e38 headroom) because sum(c6) ~5e16
    # at SF1 would wrap int64 around SF~150 while DuckDB promotes to
    # HUGEINT — long sums would silently diverge exactly at scale
    return staged.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("cast(sum(cast(qc as decimal(38,0))) as bigint)").alias("sum_qty_c2"),
        F.expr("cast(sum(cast(pc as decimal(38,0))) as bigint)").alias("sum_base_c2"),
        F.expr("sum(cast(d4 as decimal(38,0))) div 100").alias("sum_disc_c2"),
        F.expr("sum(cast(c6 as decimal(38,0))) div 10000").alias("sum_charge_c2"),
        F.expr("(sum(cast(qc as decimal(38,0))) * 10000) div count(*)").alias("avg_qty_c6"),
        F.count("*").alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    f"""
SELECT o.o_orderkey,
       CAST(sum({duck_c2_long('l.l_extendedprice')} * (100 - {duck_c2_long('l.l_discount')})) // 100 AS BIGINT) AS revenue_c2,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue_c2 DESC, o.o_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.

    NO forced broadcasts: customer and orders both scale with SF, and a
    F.broadcast hint is a hard override — at SF100 it would ship a
    multi-GB orders-x-customer build to the driver past the 8 GB wall.
    Unhinted, the static planner broadcasts them at small SF (the file
    sizes are under the auto threshold) and AQE re-plans at runtime when
    they are not — exactly the adaptive behavior a 100 TB run needs.
    lineitem never shuffles twice either way."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    rev_c4 = c2_long("l_extendedprice") * (F.lit(100) - c2_long("l_discount"))
    return (
        li.join(
            o.join(c, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_orderkey", "o_orderdate", rev_c4.alias("r4"))
        .groupBy("o_orderkey", "o_orderdate")
        # DECIMAL(38,0) sum buffer: int64 r4 sums wrap around SF~150 (see q1)
        .agg(F.expr("sum(cast(r4 as decimal(38,0))) div 100").alias("revenue_c2"))
        .select(
            "o_orderkey",
            "revenue_c2",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue_c2"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    f"""
SELECT n.n_name AS nation,
       CAST(sum({duck_c2_long('l.l_extendedprice')} * (100 - {duck_c2_long('l.l_discount')})) // 100 AS BIGINT) AS revenue_c2
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: snowflake join. Forced broadcast ONLY on the
    fixed-size dims (region 5 rows, nation 25 — constants at any SF);
    supplier/customer/orders scale with SF, so their join strategy is
    left to the planner: statically broadcast at small SF, shuffle at
    the scale where a forced hint would OOM the driver."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    rev_c4 = c2_long("l_extendedprice") * (F.lit(100) - c2_long("l_discount"))
    return (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == F.col("s_nationkey")))
        .select(F.col("n_name").alias("nation"), rev_c4.alias("r4"))
        .groupBy("nation")
        # DECIMAL(38,0) sum buffer: int64 r4 sums wrap around SF~150 (see q1)
        .agg(F.expr("sum(cast(r4 as decimal(38,0))) div 100").alias("revenue_c2"))
    )


# ---------------------------------------------------------------- windows ---

@query(
    "q_topk_per_group",
    """
SELECT event_type, event_id, CAST(rn AS INTEGER) AS rn FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
)
def q_topk_per_group(spark, sf_dir):
    """Top-K per group via window — the canonical 'argmax per key'."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "rn")
    )


@query(
    "q_session_windows",
    """
WITH t AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_sec
  FROM events
),
s AS (
  SELECT user_id, sec,
         CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM t
)
SELECT user_id, session_id, count(*) AS n_events, min(sec) AS session_start
FROM s GROUP BY user_id, session_id
""",
)
def q_session_windows(spark, sf_dir):
    """Sessionization: lag + cumulative-sum gap detection (30 min gap)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    ws = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    new_sess = F.when(
        F.lag("sec").over(w).isNull() | ((F.col("sec") - F.lag("sec").over(w)) > 1800), 1
    ).otherwise(0)
    return (
        ev.withColumn("session_id", F.sum(new_sess).over(ws))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("sec").alias("session_start"))
    )


# ------------------------------------------------------------------ stats ---

@query(
    "q_stats_sizes",
    """
WITH sized AS (
  SELECT strlen(concat_ws(',', COALESCE(CAST(event_id AS VARCHAR), ''), COALESCE(event_type, ''), COALESCE(props, ''))) AS size
  FROM events
)
SELECT count(*) AS n, CAST(min(size) AS INTEGER) AS min_size,
       CAST(max(size) AS INTEGER) AS max_size,
       CAST(CAST(sum(size) AS DECIMAL(38,0)) * 1000000 // count(*) AS BIGINT) AS avg_size_c6
FROM sized
""",
)
def q_stats_sizes(spark, sf_dir):
    """The Stats sink's record-size distribution (output/stats.go:41-101)
    over the serialized string record."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string"), "event_type", "props"
    )
    # serialize_line semantics (sinks/filewriter.py): coalesce each
    # field to '' so a NULL keeps its separator — bare concat_ws
    # SKIPS nulls and under-counts the real output bytes
    size = F.octet_length(serialize_line(list(ev.columns), ",")).alias("size")
    return ev.select(size).agg(
        F.count("*").alias("n"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        # DECIMAL(38,0) end-to-end: DECIMAL(18) overflowed at sf0.1
        # (sum(size) ~ 2.1e12, * 1e6 needs 19 digits) — Spark NULLed the
        # cast silently under ANSI-off while DuckDB errored. Exact
        # integer floor-division keeps both engines bit-identical.
        F.expr(
            "CAST(CAST(sum(size) AS DECIMAL(38,0)) * 1000000 div count(*) AS BIGINT)"
        ).alias("avg_size_c6"),
    )


@query(
    "q_stats_quantiles",
    """
SELECT CAST(floor(quantile_cont(CAST(length(props) AS DOUBLE), 0.25) * 1000000) AS BIGINT) AS p25_c6,
       CAST(floor(quantile_cont(CAST(length(props) AS DOUBLE), 0.50) * 1000000) AS BIGINT) AS p50_c6,
       CAST(floor(quantile_cont(CAST(length(props) AS DOUBLE), 0.75) * 1000000) AS BIGINT) AS p75_c6
FROM events
""",
)
def q_stats_quantiles(spark, sf_dir):
    """Exact quartiles as scalar *_c6 fixed-point columns (never DOUBLE
    arrays in oracle-checked output — functions/numeric.py convention).
    Quarters are binary-exact fractions, so the lerp over integer lengths
    is exact in both engines and floor(x*1e6) agrees bit-for-bit. At
    100 TB the engine swaps in percentile_approx (same sketch family as
    the reference's perks/quantile, output/stats.go:16)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.length("props").cast("double")
    return ev.agg(
        *[
            micros(F.percentile(x, F.lit(q))).alias(f"p{n}_c6")
            for q, n in [(0.25, 25), (0.5, 50), (0.75, 75)]
        ]
    )


@query(
    "q_stats_report",
    """
WITH sized AS (
  SELECT strlen(concat_ws(',', COALESCE(CAST(event_id AS VARCHAR), ''), COALESCE(event_type, ''), COALESCE(props, ''))) AS size,
         CAST(length(props) AS DOUBLE) AS plen
  FROM events
)
SELECT count(*) AS n, CAST(min(size) AS INTEGER) AS min_size,
       CAST(max(size) AS INTEGER) AS max_size,
       CAST(CAST(sum(size) AS DECIMAL(38,0)) * 1000000 // count(*) AS BIGINT) AS avg_size_c6,
       CAST(floor(quantile_cont(plen, 0.25) * 1000000) AS BIGINT) AS p25_c6,
       CAST(floor(quantile_cont(plen, 0.50) * 1000000) AS BIGINT) AS p50_c6,
       CAST(floor(quantile_cont(plen, 0.75) * 1000000) AS BIGINT) AS p75_c6
FROM sized
""",
)
def q_stats_report(spark, sf_dir):
    """The Stats sink's full one-row report — the size-distribution and
    quantile facets (q_stats_sizes / q_stats_quantiles, still in the
    catalog individually) merged into ONE aggregation pass, mirroring
    how the reference's Stats sink emits a single combined report
    (output/stats.go:41-231). Same exact-arithmetic rules as the facets:
    DECIMAL(38) floor-division for the mean, binary-exact quartile lerp
    for the percentiles."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string"), "event_type", "props"
    )
    # serialize_line semantics (sinks/filewriter.py): coalesce each
    # field to '' so a NULL keeps its separator — bare concat_ws
    # SKIPS nulls and under-counts the real output bytes
    size = F.octet_length(serialize_line(list(ev.columns), ",")).alias("size")
    plen = F.length("props").cast("double").alias("plen")
    return ev.select(size, plen).agg(
        F.count("*").alias("n"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        F.expr(
            "CAST(CAST(sum(size) AS DECIMAL(38,0)) * 1000000 div count(*) AS BIGINT)"
        ).alias("avg_size_c6"),
        *[
            micros(F.percentile(F.col("plen"), F.lit(q))).alias(f"p{n}_c6")
            for q, n in [(0.25, 25), (0.5, 50), (0.75, 75)]
        ],
    )


@query(
    "q_field_frequency",
    """
WITH f AS (SELECT event_type AS value, count(*) AS n FROM events GROUP BY event_type)
SELECT value, n, CAST(n * 1000000 // (SELECT sum(n) FROM f) AS BIGINT) AS share_c6 FROM f
""",
)
def q_field_frequency(spark, sf_dir):
    """Stats sink per-field frequency distribution + share of total.

    The total is a broadcast 1-row scalar, NOT a global window over the
    frequency table: the Stats frequency facet's cardinality is the
    field's distinct-value count, which a high-card field makes
    corpus-sized — an unpartitioned window would move ALL of it to one
    partition (the WINDOW1P anti-pattern plan_audit flags). The two
    references to ``freq`` share one shuffle via ReusedExchange."""
    ev = load_table(spark, sf_dir, "events")
    freq = ev.groupBy(F.col("event_type").alias("value")).agg(F.count("*").alias("n"))
    total = freq.agg(F.sum("n").alias("_den"))
    return freq.crossJoin(F.broadcast(total)).select(
        "value", "n", F.expr("n * 1000000 div _den").alias("share_c6")
    )


@query(
    "q_cube_rollup",
    """
SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_rollup(spark, sf_dir):
    """Grouping-set aggregation (cube) — part of the added SQL surface."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
        )
    )


@query(
    "q_window_funcs",
    """
SELECT event_id, user_id,
       CAST(floor((CAST(value AS DECIMAL(18,6)) -
                   coalesce(lag(CAST(value AS DECIMAL(18,6)))
                            OVER (PARTITION BY user_id ORDER BY event_id), 0)) * 100)
            AS BIGINT) AS delta_c2,
       CAST(floor(sum(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100)
            AS BIGINT) AS moving3_c2,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS seq
FROM events
""",
)
def q_window_funcs(spark, sf_dir):
    """Ordered-window surface: lag delta, 3-row moving sum, row_number —
    one shuffle on user_id serves all three frames (same partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    w3 = w.rowsBetween(-2, 0)
    v = dec("value")
    return ev.select(
        "event_id",
        "user_id",
        cents(v - F.coalesce(F.lag(v).over(w), F.lit(0).cast(DEC))).alias("delta_c2"),
        cents(F.sum(v).over(w3)).alias("moving3_c2"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


@query(
    "q_salted_agg",
    """
SELECT event_type, count(*) AS n,
       CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 100) AS BIGINT) AS sum_value_c2
FROM events GROUP BY event_type
""",
)
def q_salted_agg(spark, sf_dir):
    """Skew-resistant two-phase aggregation: partial agg on
    (key, salt = event_id % 16) spreads a hot key over 16 reducers, the
    final agg combines 16 tiny partials. Provably equal to the direct
    groupBy (the oracle IS the direct groupBy) — decimal sums are exact,
    so regrouping cannot change the result. This is the salting pattern
    for 100 TB hot-key distributions; Spark's AQE skew handling covers
    joins but not aggregations, hence the explicit variant."""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "_salt")
        .agg(F.count("*").alias("pn"), F.sum(dec("value")).alias("psum"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), cents(F.sum("psum")).alias("sum_value_c2")
    )


@query(
    "q_stats_timestamps",
    """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_bucket,
       count(*) AS n
FROM events GROUP BY 1
""",
)
def q_stats_timestamps(spark, sf_dir):
    """The Stats sink's timestamp distribution (output/stats.go:165-231):
    per-hour record counts — one map-side-combined shuffle on the
    hour bucket."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return ev.groupBy(bucket.alias("hour_bucket")).agg(F.count("*").alias("n"))


@query(
    "q_anti_join",
    """
SELECT o.o_orderkey, o.o_orderpriority
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > TIMESTAMP '1998-08-01 00:00:00'
)
  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def q_anti_join(spark, sf_dir):
    """Fact-fact left_anti: 1998 orders with nothing shipped after
    Aug 1998. Both sides prune at the scan (date pushdown); the anti
    join shuffles only the filtered keys."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-08-01 00:00:00").cast("timestamp_ntz")
    )
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_orderpriority")


def _duck_grouped_pct(k: int) -> str:
    """Integer-exact lerp quantile at q=k/100 over ranked (rn, n, x):
    lo = (n-1)*k div 100, frac = (n-1)*k mod 100,
    micros = x[lo]*1e6 + frac*(x[lo+1]-x[lo])*1e4 — pure BIGINT math."""
    lo = f"((n - 1) * {k}) // 100"
    lo_v = f"max(CASE WHEN rn = {lo} THEN x END)"
    hi_v = f"coalesce(max(CASE WHEN rn = ({lo}) + 1 THEN x END), {lo_v})"
    return (
        f"CAST({lo_v} * 1000000 + max(((n - 1) * {k}) % 100)"
        f" * ({hi_v} - {lo_v}) * 10000 AS BIGINT) AS p{k}_c6"
    )


@query(
    "q_percentile_by_group",
    f"""
WITH v AS (
  SELECT event_type, CAST(length(props) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY length(props)) - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, {_duck_grouped_pct(50)}, {_duck_grouped_pct(90)}, {_duck_grouped_pct(99)}
FROM v GROUP BY event_type
""",
)
def q_percentile_by_group(spark, sf_dir):
    """Grouped p50/p90/p99 as scalar *_c6 fixed-point, computed as exact
    order statistics in pure integer arithmetic (rank the values per
    group, lerp between ranks lo=(n-1)*k div 100 and lo+1 scaled by
    frac=(n-1)*k mod 100) — q=0.9/0.99 are not binary-exact, so
    double-lerp engines can disagree in the last ulp; integer math
    cannot. One shuffle (the event_type window) serves rank, count and
    the final groupBy; the 100 TB swap is percentile_approx."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.length("props").cast("long").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("x")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "x",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )

    def pct(k: int):
        lo = F.expr(f"((n - 1) * {k}) div 100")
        lo_v = F.max(F.when(F.col("rn") == lo, F.col("x")))
        hi_v = F.coalesce(F.max(F.when(F.col("rn") == lo + 1, F.col("x"))), lo_v)
        frac = F.max(F.expr(f"((n - 1) * {k}) % 100"))
        return (lo_v * 1000000 + frac * (hi_v - lo_v) * 10000).cast("long").alias(f"p{k}_c6")

    return ranked.groupBy("event_type").agg(pct(50), pct(90), pct(99))
