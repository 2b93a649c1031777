"""Loader for the driver-provided synthetic tables (/root/testdata/sf*).

The tables are parquet; ``events.ts`` is physically TIMESTAMP(NANOS) which
Spark cannot read natively — we read it as a nanosecond long
(``spark.sql.legacy.parquet.nanosAsLong``) and floor-truncate to micros,
matching DuckDB's nanos->micros truncation so the correctness oracle
compares bit-identical timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from baker_spark.session import configure, release_caches

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: columns stored as TIMESTAMP(NANOS) in parquet, read back as long nanos.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: parquet SCHEMA cache (metadata only — StructType per table file).
#: `spark.read.parquet` runs a 1-task footer-inference job on EVERY call
#: (measured 0.18-0.24s per table at sf0.1); with the schema passed
#: explicitly the reader skips it (0.04-0.10s). A catalog query builds
#: its tables on every invocation, so a 6-table join (q5) paid ~1s of
#: repeated footer reads per run. This is the standard at-scale shape
#: too: production tables carry their schema in a catalog (metastore /
#: Iceberg manifest) precisely so readers never infer per query. No row
#: data is cached — only the column list the footer declares. One
#: entry PER PATH, holding (stat-key, schema) — round 14, ADVICE r13:
#: a file rewritten at the same path during the process lifetime
#: (regenerated testdata, an output re-read as input) must re-infer
#: its footer schema, not come back with stale columns reading as
#: NULL; keying the dict by path (with the stat tuple INSIDE the
#: value) also means a rewrite replaces the entry instead of leaking
#: one stale entry per rewrite forever. Honest limitation: the stat
#: key folds the path and its DIRECT children only, so a part file
#: rewritten in place one directory level down (name.parquet/part=x/
#: part-0.parquet) is not sensed — directory mtimes move on entry
#: create/delete, not on grandchild content. Every writer in this
#: repo (and Spark's own commit protocol) creates new part files
#: rather than rewriting them in place, which DOES move the child
#: dir's mtime; a deployment layering an in-place rewriter under a
#: partitioned table must clear the cache itself (release point:
#: _SCHEMA_CACHE.clear()).
_SCHEMA_CACHE: dict = {}


def _schema_key(path: str) -> tuple:
    """(mtime_ns, size) of the path; for a directory table the stats
    fold over the direct children too (a part file overwritten in
    place changes its own mtime even when the dir inode keeps its
    timestamp)."""
    try:
        st = os.stat(path)
        key = [st.st_mtime_ns, st.st_size]
        if os.path.isdir(path):
            for name in sorted(os.listdir(path)):
                cst = os.stat(os.path.join(path, name))
                key += [name, cst.st_mtime_ns, cst.st_size]
        return tuple(key)
    except OSError:
        # unreadable/remote path: fall back to a constant key (the
        # reader itself will raise if the path truly doesn't exist)
        return ()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    # every registered query loads its tables before building: releasing
    # here bounds operator caches (LSH band tables etc.) to one query's
    # lifetime instead of accumulating across catalog sweeps.
    # ORDERING CONTRACT: a query builder must load ALL its tables before
    # its first managed_persist — loading another table afterwards would
    # release the builder's own fresh cache (every catalog query follows
    # this: load_table calls come first, persists after)
    release_caches()
    path = os.path.join(sf_dir, f"{name}.parquet")
    skey = _schema_key(path)
    cached = _SCHEMA_CACHE.get(path)
    if cached is None or cached[0] != skey:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = (skey, df.schema)
    else:
        df = spark.read.schema(cached[1]).parquet(path)
    for col in _NANOS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            # integer-divide nanos->micros (DuckDB truncates identically);
            # `div` keeps the math in BIGINT — `/` would round-trip through
            # DOUBLE, whose 2^53 exact range ns epochs (~1.8e18) exceed
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
    try:
        # stamp for fan_out's split-count cache (see session.fan_out):
        # the key identifies "this exact scan in this session" (the
        # nanos projection above does not change scan splits); derived
        # frames drop the attribute and introspect as before
        df._baker_split_key = (spark.sparkContext.applicationId, path)
    except Exception:
        pass
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each table as a temp view so operators can be used from SQL."""
    tables = load_tables(spark, sf_dir, names)
    for n, df in tables.items():
        df.createOrReplaceTempView(n)
    return tables
