"""Stateful / external-data row operators: Dedup, ExternalMatch,
CountAndTag, Crypt (SURVEY.md §2.2 rows 4-6, 9)."""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from baker_spark.operators.base import Operator, register


@register
class Dedup(Operator):
    """Drop records whose tuple of fields was seen before
    (/root/reference/filter/dedup.go:13-98 — a global in-memory set keyed
    by fields joined with \\x1e; documented to OOM on huge streams,
    dedup.go:14-21).

    Spark version: ``dropDuplicates(fields)`` — hash-partitioned by key and
    spill-to-disk, so it scales where the reference OOMs. "First seen" is
    arbitrary under parallelism, so ``order_by`` optionally pins the
    survivor (min of order_by per key) for deterministic output.
    """

    name = "Dedup"

    def __init__(self, fields: list[str], order_by: str | None = None):
        self.fields, self.order_by = list(fields), order_by

    def apply(self, df: DataFrame) -> DataFrame:
        # key on coalesce(field, ''): the record model treats NULL and
        # '' as the SAME empty value (record.go:35-39 — a short CSV line
        # and an explicit empty cell both key as empty bytes in the
        # reference's set), but dropDuplicates/partitionBy would keep
        # one of each
        keys = [
            F.coalesce(F.col(f).cast("string"), F.lit("")).alias(f"_bk_k{i}")
            for i, f in enumerate(self.fields)
        ]
        key_names = [f"_bk_k{i}" for i in range(len(self.fields))]
        df = df.select("*", *keys)
        if self.order_by is None:
            return df.dropDuplicates(key_names).drop(*key_names)
        w = Window.partitionBy(*key_names).orderBy(F.col(self.order_by).asc())
        return (
            df.withColumn("_bk_rn", F.row_number().over(w))
            .filter(F.col("_bk_rn") == 1)
            .drop("_bk_rn", *key_names)
        )


@register
class ExternalMatch(Operator):
    """Semi/anti join against an external value set
    (/root/reference/filter/external_match.go:25-264: CSV of values from
    file/S3, ``KeepOnMatch`` selects keep-vs-discard).

    The value set is tiny relative to the stream, so this is a broadcast
    left_semi / left_anti join — no shuffle of the big side. ``values``
    may be an iterable of strings, a callable returning one (refresh per
    invocation, mirroring RefreshEvery), a DataFrame, or file path(s) to
    CSV (gz/zstd handled by Spark codecs).
    """

    name = "ExternalMatch"

    def __init__(
        self,
        field_name: str,
        values: Iterable[str] | Callable[[], Iterable[str]] | DataFrame | None = None,
        files: list[str] | None = None,
        csv_column: int = 0,
        keep_on_match: bool = False,
    ):
        self.field = field_name
        self.values = values
        self.files = files
        self.csv_column = csv_column
        self.keep = keep_on_match

    def _values_df(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        v = self.values
        if callable(v):
            v = v()
        if isinstance(v, DataFrame):
            vdf = v.toDF("_bk_match")
        elif v is not None:
            # schema EXPLICIT: an empty values iterable (a refresh
            # callable's off cycle, an empty external list) must match
            # nothing like the reference's empty set does — inference
            # over zero rows raises CANNOT_INFER_EMPTY_SCHEMA instead
            vdf = spark.createDataFrame(
                [(str(x),) for x in v], "_bk_match string"
            )
        elif self.files:
            raw = spark.read.csv(list(self.files))
            col = raw.columns[self.csv_column]
            vdf = raw.select(F.col(col).alias("_bk_match"))
        else:
            raise ValueError("ExternalMatch needs values or files")
        # empty==null applies to the VALUE side too: a NULL entry (empty
        # CSV cell, NULL in a values frame) must match an empty record
        # field — without this coalesce the eqNullSafe below compares
        # '' to NULL and silently never matches
        vdf = vdf.select(
            F.coalesce(F.col("_bk_match").cast("string"), F.lit("")).alias("_bk_match")
        )
        return vdf.dropDuplicates(["_bk_match"])

    def apply(self, df: DataFrame) -> DataFrame:
        vdf = F.broadcast(self._values_df(df))
        how = "left_semi" if self.keep else "left_anti"
        # coalesce to '' first: the record model has no NULL distinct
        # from empty (record.go:35-39) — a NULL field must match an
        # empty-string value exactly like StringMatch/ClauseFilter do
        field = F.coalesce(F.col(self.field).cast("string"), F.lit(""))
        cond = field.eqNullSafe(vdf["_bk_match"])
        return df.join(vdf, cond, how)


@register
class CountAndTag(Operator):
    """Pass-through that publishes a counter broken down by a field's
    value (/root/reference/filter/count_and_tag.go:10-81). The row stream
    is unchanged; ``tag_counts`` computes the metric as a DataFrame and
    ``apply`` also attaches a named ``observe`` for the total count so the
    metric is collected for free during the real action."""

    name = "CountAndTag"

    def __init__(self, metric: str, field: str, default_value: str = "unknown"):
        self.metric, self.field, self.default = metric, field, default_value
        self.observation = None  # set per apply(); .get after an action

    def tag_column(self) -> Column:
        return F.coalesce(F.nullif(F.col(self.field).cast("string"), F.lit("")), F.lit(self.default)).alias("tag")

    def tag_counts(self, df: DataFrame) -> DataFrame:
        return df.groupBy(self.tag_column()).agg(F.count("*").alias("n"))

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Observation

        try:
            self.observation = Observation()
            return df.observe(self.observation, F.count(F.lit(1)).alias("count"))
        except Exception:
            # a never-attached Observation would make metric_value()
            # raise NO_OBSERVE_BEFORE_GET instead of returning {}
            self.observation = None
            return df  # e.g. streaming DataFrames — metric skipped

    def metric_value(self) -> dict:
        """Observed counters after an action ran (free — no extra pass)."""
        return self.observation.get if self.observation is not None else {}


@register
class Crypt(Operator):
    """Encrypt/decrypt a field with Fernet into dst; rows whose operation
    fails are dropped (/root/reference/filter/crypt.go:14-148).

    Implemented as an Arrow-vectorized pandas UDF (Fernet has no JVM
    builtin). Encryption output is nondeterministic (random IV), but
    decrypt(encrypt(x)) == x which is what tests/oracles verify.
    """

    name = "Crypt"

    def __init__(
        self,
        src_field: str,
        dst_field: str,
        key: str | bytes = "",
        decrypt: bool = False,
        ttl: int = 0,
        algorithm: str = "fernet",
    ):
        if algorithm.lower() != "fernet":
            raise ValueError("only the fernet algorithm is supported")
        from cryptography.fernet import Fernet  # fail fast if key is bad

        Fernet(key)
        self.src, self.dst = src_field, dst_field
        self.key = key if isinstance(key, bytes) else key.encode()
        self.decrypt, self.ttl = decrypt, ttl

    def apply(self, df: DataFrame) -> DataFrame:
        key, dec, ttl = self.key, self.decrypt, self.ttl

        @F.pandas_udf("string")
        def crypt(s: pd.Series) -> pd.Series:
            from cryptography.fernet import Fernet

            f = Fernet(key)

            def one(v):
                if v is None:
                    return None
                try:
                    if dec:
                        return f.decrypt(v.encode(), ttl=ttl or None).decode()
                    return f.encrypt(v.encode()).decode()
                except Exception:
                    return None

            return s.map(one)

        # coalesce first: NULL == '' in the record model; the reference
        # encrypts an empty value fine and only drops on crypt ERRORS
        # (decrypting '' still fails -> dropped, same as crypt.go)
        src_col = F.coalesce(F.col(self.src).cast("string"), F.lit(""))
        out = df.withColumn(self.dst, crypt(src_col))
        return out.filter(F.col(self.dst).isNotNull())  # error -> drop row
