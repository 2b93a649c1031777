"""Stats — the aggregating sink (/root/reference/output/stats.go:18-33).

The reference streams three ε-approximate quantile distributions to a CSV
report: record sizes (stats.go:41-101), per-field value frequencies
(stats.go:103-163) and timestamps (stats.go:165-231), using the
perks/quantile sketch. Spark's ``percentile_approx`` is the same sketch
family (Greenwald-Khanna); ``exact=True`` switches to the exact
``percentile`` for oracle-comparable output at test scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

#: the reference's quantile targets (stats.go:16,281-288)
DEFAULT_QUANTILES = [0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99]


@dataclass
class Stats:
    """Aggregating sink: record-size distribution, per-field value
    frequencies, timestamp distribution, quantiles (output/stats.go)."""

    fields: list[str] = field(default_factory=list)  # frequency-tracked fields
    timestamp_field: str | None = None
    quantiles: list[float] = field(default_factory=lambda: list(DEFAULT_QUANTILES))
    exact: bool = False
    #: topology field_separator — record sizes measure ToText bytes
    separator: str = ","

    def _quants(self, col):
        fn = F.percentile if self.exact else F.percentile_approx
        return fn(col, F.array(*[F.lit(q) for q in self.quantiles]))

    def record_sizes(self, df: DataFrame) -> DataFrame:
        """Distribution of serialized record length (stats.go:41-101)."""
        from baker_spark.sinks.filewriter import serialize_line

        # octet_length: the reference counts len(raw.Record) BYTES
        # (stats.go:308); F.length counts characters and diverges on
        # any non-ASCII corpus
        size = F.octet_length(serialize_line(df.columns, self.separator)).alias("size")
        return df.select(size).agg(
            F.count("*").alias("n"),
            F.min("size").alias("min_size"),
            F.max("size").alias("max_size"),
            F.avg("size").alias("avg_size"),
            self._quants(F.col("size")).alias("size_quantiles"),
        )

    def field_frequencies(self, df: DataFrame, top_k: int = 0) -> dict[str, DataFrame]:
        """Per-field value-frequency distributions (stats.go:103-163)."""
        out = {}
        for f in self.fields:
            freq = df.groupBy(F.col(f).cast("string").alias("value")).agg(
                F.count("*").alias("n")
            )
            if top_k:
                freq = freq.orderBy(F.desc("n"), "value").limit(top_k)
            out[f] = freq
        return out

    def timestamp_distribution(self, df: DataFrame) -> DataFrame:
        """Timestamp distribution (stats.go:165-231)."""
        if not self.timestamp_field:
            raise ValueError("timestamp_field not configured")
        ts = F.col(self.timestamp_field).cast("long").alias("ts")
        return df.select(ts).agg(
            F.count("ts").alias("n"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            self._quants(F.col("ts")).alias("ts_quantiles"),
        )

    def write(self, df: DataFrame) -> dict:
        # one report = 2 + len(fields) aggregation jobs over the same
        # rows; persist so the upstream lineage (source + filter chain)
        # materializes once, not once per section. Only release a cache
        # THIS method created: persist() on an already-cached frame
        # returns the same entry, and unpersisting it here would evict
        # the caller's cache out from under their later actions.
        own_cache = not df.is_cached
        if own_cache:
            df = df.persist()
        try:
            report = {"sizes": self.record_sizes(df).collect()[0].asDict()}
            for f, freq in self.field_frequencies(df, top_k=100).items():
                report[f"freq:{f}"] = [r.asDict() for r in freq.collect()]
            if self.timestamp_field:
                report["times"] = self.timestamp_distribution(df).collect()[0].asDict()
        finally:
            if own_cache:
                df.unpersist()
        return report
