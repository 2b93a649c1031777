"""One correctness query per reference row-operator (SURVEY.md §2.2/§2.5),
run over the driver's synthetic tables with a DuckDB oracle each.

Conventions:
- every computed column is aliased identically in Spark and SQL
- doubles never flow through aggregation (see functions/numeric.py)
- processing-time / metadata operators reduce to oracle-checkable
  invariants (e.g. "every row got a url") since DuckDB can't see them
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from baker_spark import operators as ops
from baker_spark.functions.hashing import duck_md5_long, md5_long
from baker_spark.sources.tables import load_table

from baker_spark.queries.registry import make_registry

QUERIES, ORACLES, query = make_registry()


def _events_str(spark, sf_dir):
    """events in the baker data model: string fields, plus a string epoch."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id").cast("string").alias("user_id_s"),
        F.unix_timestamp(F.col("ts")).cast("string").alias("epoch_s"),
        F.col("props"),
    )


# ---------------------------------------------------------------- filters ---

@query(
    "op_clausefilter",
    "SELECT event_id, event_type FROM events "
    "WHERE (event_type = 'click' OR event_type = 'error') AND NOT event_type = 'view'",
)
def op_clausefilter(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    clause = "(and (or (event_type click) (event_type error)) (not (event_type view)))"
    return ops.ClauseFilter(clause).apply(df)


@query(
    "op_clearfields",
    "SELECT event_id, '' AS event_type, CAST(user_id AS VARCHAR) AS user_id_s FROM events",
)
def op_clearfields(spark, sf_dir):
    df = _events_str(spark, sf_dir).select("event_id", "event_type", "user_id_s")
    return ops.ClearFields(["event_type"]).apply(df)


@query(
    "op_concatenate",
    "SELECT c_custkey, concat(c_name, '|', c_mktsegment) AS ck FROM customer",
)
def op_concatenate(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    out = ops.Concatenate(["c_name", "c_mktsegment"], target="ck", separator="|").apply(df)
    return out.select("c_custkey", "ck")


@query(
    "op_countandtag",
    # ''/NULL event_type tags as the default (count_and_tag.go default tag)
    "SELECT CASE WHEN event_type IS NULL OR event_type = '' THEN 'unknown' "
    "ELSE event_type END AS tag, count(*) AS n FROM events GROUP BY 1",
)
def op_countandtag(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return ops.CountAndTag(metric="events_by_type", field="event_type").tag_counts(df)


@query("op_crypt", "SELECT doc_id, text FROM documents")
def op_crypt(spark, sf_dir):
    # encrypt -> decrypt roundtrip; Fernet IVs are random but decrypt
    # restores the plaintext exactly (crypt.go: drop-on-error preserved)
    key = b"8Llfjrs9NM32AsE9PIeaFIdCRp8cSTwwI_Hw2B9QLuo="
    df = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    enc = ops.Crypt(src_field="text", dst_field="ct", key=key).apply(df)
    dec = ops.Crypt(src_field="ct", dst_field="text", key=key, decrypt=True).apply(
        enc.drop("text")
    )
    return dec.select("doc_id", "text")


@query(
    "op_dedup",
    "SELECT user_id, event_type, min(event_id) AS event_id "
    "FROM events GROUP BY user_id, event_type",
)
def op_dedup(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").select("user_id", "event_type", "event_id")
    out = ops.Dedup(fields=["user_id", "event_type"], order_by="event_id").apply(df)
    return out.select("user_id", "event_type", "event_id")


@query(
    "op_expandjson",
    # coalesce: a missing key leaves dst untouched (''), never NULL
    "SELECT event_id, coalesce(json_extract_string(props, '$.k'), '') AS k_val "
    "FROM events",
)
def op_expandjson(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").select("event_id", "props")
    out = ops.ExpandJSON(source="props", fields={"k": "k_val"}).apply(df)
    return out.select("event_id", "k_val")


@query(
    "op_expandlist",
    "SELECT doc_id, split_part(text, ' ', 1) AS w0, split_part(text, ' ', 3) AS w2 "
    "FROM documents",
)
def op_expandlist(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = ops.ExpandList(source="text", fields={0: "w0", 2: "w2"}, separator=" ").apply(df)
    return out.select("doc_id", "w0", "w2")


@query(
    "op_externalmatch",
    "SELECT event_id, event_type, 'semi' AS variant FROM events "
    "WHERE event_type IN ('click', 'view') "
    "UNION ALL "
    "SELECT event_id, event_type, 'anti' AS variant FROM events "
    "WHERE event_type NOT IN ('click', 'view')",
)
def op_externalmatch(spark, sf_dir):
    # both KeepOnMatch modes (external_match.go:25-53) in one gated query
    df = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    semi = ops.ExternalMatch(
        field_name="event_type", values=["click", "view"], keep_on_match=True
    ).apply(df)
    anti = ops.ExternalMatch(field_name="event_type", values=["click", "view"]).apply(df)
    return semi.withColumn("variant", F.lit("semi")).unionByName(
        anti.withColumn("variant", F.lit("anti"))
    )


@query(
    "op_formattime",
    "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt, "
    "CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS VARCHAR) AS ms FROM events",
)
def op_formattime(spark, sf_dir):
    df = _events_str(spark, sf_dir)
    out = ops.FormatTime(src_field="epoch_s", dst_field="dt", src_format="unix", dst_format="DateTime").apply(df)
    out = ops.FormatTime(src_field="epoch_s", dst_field="ms", src_format="unix", dst_format="unixms").apply(out)
    return out.select("event_id", "dt", "ms")


@query(
    "op_hash",
    "SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256 FROM customer",
)
def op_hash(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = ops.Hash(src_field="c_name", dst_field="h_md5", function="md5", encoding="hex").apply(df)
    out = ops.Hash(src_field="c_name", dst_field="h_sha256", function="sha256", encoding="hex").apply(out)
    return out.select("c_custkey", "h_md5", "h_sha256")


@query(
    "op_metadata",
    "SELECT event_id, 'events.parquet' AS file, true AS mtime_ok FROM events",
)
def op_metadata(spark, sf_dir):
    # row-level facets for both metadata ops: EVERY row's source-file url
    # (metadata_url.go:12-79) and mtime sanity (metadata_lastmodified.go:
    # 12-58) are hash-compared per row — a single mis-assigned url now
    # flips that row's hash, where the old 1-row aggregate only counted.
    # mtime itself stays an invariant (>0) because DuckDB cannot see the
    # filesystem mtime of the parquet it reads.
    df = load_table(spark, sf_dir, "events")
    out = ops.MetadataUrl(dst_field="src_url").apply(df)
    out = ops.MetadataLastModified(dst_field="mtime").apply(out)
    return out.select(
        "event_id",
        F.element_at(F.split(F.col("src_url"), "/"), -1).alias("file"),
        (F.col("mtime").cast("long") > 0).alias("mtime_ok"),
    )


@query(
    "op_notnull",
    "SELECT doc_id, lang FROM documents WHERE text IS NOT NULL AND text <> ''",
)
def op_notnull(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return ops.NotNull(["text"]).apply(df).select("doc_id", "lang")


@query("op_partialclone", "SELECT doc_id, lang FROM documents")
def op_partialclone(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return ops.PartialClone(fields=["doc_id", "lang"]).apply(df)


@query(
    "op_regexmatch",
    "SELECT doc_id, 'match' AS variant FROM documents WHERE regexp_matches(text, 'spark') "
    "AND regexp_matches(lang, '^(en|de)$') "
    "UNION ALL "
    "SELECT doc_id, 'invert' AS variant FROM documents WHERE NOT (regexp_matches(text, 'spark') "
    "AND regexp_matches(lang, '^(en|de)$'))",
)
def op_regexmatch(spark, sf_dir):
    # both InvertMatch modes (regex_match.go:11-100) in one gated query
    df = load_table(spark, sf_dir, "documents")
    kept = ops.RegexMatch(fields=["text", "lang"], regexs=["spark", "^(en|de)$"]).apply(df)
    inv = ops.RegexMatch(
        fields=["text", "lang"], regexs=["spark", "^(en|de)$"], invert_match=True
    ).apply(df)
    return kept.select("doc_id").withColumn("variant", F.lit("match")).unionByName(
        inv.select("doc_id").withColumn("variant", F.lit("invert"))
    )


@query(
    "op_replacefields",
    "SELECT c_custkey, c_name AS name_copy, 'tagged' AS tag FROM customer",
)
def op_replacefields(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name").withColumn(
        "name_copy", F.lit("")
    ).withColumn("tag", F.lit(""))
    out = ops.ReplaceFields(
        copy_fields=["c_name", "name_copy"], replace_fields=["tagged", "tag"]
    ).apply(df)
    return out.select("c_custkey", "name_copy", "tag")


@query("op_setstringfromurl", "SELECT event_id, 'events' AS tbl FROM events")
def op_setstringfromurl(spark, sf_dir):
    # row-level: every event row's source url contains 'events', so the
    # operator must set tbl='events' on each row and drop none — hash-
    # compared per row instead of the old 1-row count
    df = load_table(spark, sf_dir, "events")
    out = ops.SetStringFromURL(field="tbl", strings=["events", "orders"]).apply(df)
    return out.select("event_id", "tbl")


@query("op_slice", "SELECT p_partkey, substr(p_name, 1, 8) AS sliced FROM part")
def op_slice(spark, sf_dir):
    df = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    out = ops.Slice(src="p_name", dst="sliced", start_idx=0, end_idx=8).apply(df)
    return out.select("p_partkey", "sliced")


@query(
    "op_stringmatch",
    "SELECT event_id, event_type, 'drop' AS variant FROM events "
    "WHERE event_type NOT IN ('click', 'view') "
    "UNION ALL "
    "SELECT event_id, event_type, 'keep' AS variant FROM events "
    "WHERE event_type IN ('click', 'view')",
)
def op_stringmatch(spark, sf_dir):
    # both InvertMatch modes (string_match.go:11-82) in one gated query
    df = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dropped = ops.StringMatch(field="event_type", strings=["click", "view"]).apply(df)
    kept = ops.StringMatch(
        field="event_type", strings=["click", "view"], invert_match=True
    ).apply(df)
    return dropped.withColumn("variant", F.lit("drop")).unionByName(
        kept.withColumn("variant", F.lit("keep"))
    )


@query(
    "op_timestamp",
    "SELECT event_id, CAST('1704067200' AS VARCHAR) AS frozen_ts, "
    "CAST(1 AS BIGINT) AS live_ok FROM events",
)
def op_timestamp(spark, sf_dir):
    """Both halves of the operator, per row: the frozen clock
    (fixed_time — timestamp.go's deterministic test hook) hash-matches
    an exact per-row oracle value, and the live clock is bounded per
    row (epoch > 2020, the strongest oracle-expressible claim about
    genuine processing time). Upgraded round 9 from a 1-row count
    invariant to a full-cardinality row-level check."""
    df = load_table(spark, sf_dir, "events")
    live = ops.Timestamp(field="proc_ts").apply(df)
    frozen = ops.Timestamp(field="frozen_ts", fixed_time=1704067200).apply(live)
    return frozen.select(
        "event_id",
        "frozen_ts",
        (F.col("proc_ts").cast("long") > 1600000000).cast("long").alias("live_ok"),
    )


_TR_START = int(datetime(2024, 1, 3, tzinfo=timezone.utc).timestamp())
_TR_END = int(datetime(2024, 1, 6, tzinfo=timezone.utc).timestamp())


@query(
    "op_timestamprange",
    f"SELECT event_id FROM events WHERE CAST(floor(epoch(ts)) AS BIGINT) >= {_TR_START} "
    f"AND CAST(floor(epoch(ts)) AS BIGINT) < {_TR_END}",
)
def op_timestamprange(spark, sf_dir):
    df = _events_str(spark, sf_dir)
    out = ops.TimestampRange(
        field="epoch_s", start_datetime="2024-01-03 00:00:00", end_datetime="2024-01-06 00:00:00"
    ).apply(df)
    return out.select("event_id")


@query("op_urlescape", "SELECT doc_id, substr(text, 1, 40) AS roundtrip FROM documents")
def op_urlescape(spark, sf_dir):
    # encode -> decode roundtrip (DuckDB has no url_encode to compare against)
    df = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("snippet")
    )
    enc = ops.URLEscape(src_field="snippet", dst_field="escaped").apply(df)
    dec = ops.URLEscape(src_field="escaped", dst_field="roundtrip", unescape=True).apply(enc)
    return dec.select("doc_id", "roundtrip")


@query(
    "op_urlparam",
    "SELECT event_id, event_type AS ty FROM events",
)
def op_urlparam(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("https://ex.com/t?uid="),
            F.col("user_id").cast("string"),
            F.lit("&ty="),
            F.col("event_type"),
        ).alias("url"),
    )
    out = ops.URLParam(src_field="url", dst_field="ty", param="ty").apply(df)
    return out.select("event_id", "ty")


# ----------------------------------------------------- topology operators ---

@query(
    "op_validation",
    "SELECT doc_id, lang, "
    "(SELECT count(*) FROM documents WHERE NOT regexp_matches(lang, '^en$')) AS n_quarantined "
    "FROM documents WHERE regexp_matches(lang, '^en$')",
)
def op_validation(spark, sf_dir):
    # valid rows (config.go:474-523) + quarantine count (topology.go:376-386)
    # in one gated query; the count rides along as a broadcast scalar
    df = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    v = ops.Validation({"lang": "^en$"})
    # ungrouped aggregate: always one row, even when nothing is invalid
    # (invalid_counts returns ZERO rows then, and the crossJoin would
    # annihilate every valid row while the oracle's scalar subquery keeps
    # them with n_quarantined=0)
    return v.apply(df).crossJoin(F.broadcast(v.total_invalid(df)))


@query(
    "op_sharding",
    f"SELECT {duck_md5_long('CAST(user_id AS VARCHAR)')} % 8 AS shard, "
    "count(*) AS n FROM events GROUP BY 1",
)
def op_sharding(spark, sf_dir):
    # deterministic shard assignment: same key -> same shard, cross-engine
    df = load_table(spark, sf_dir, "events")
    shard = F.pmod(md5_long(F.col("user_id").cast("string")), F.lit(8)).alias("shard")
    return df.groupBy(shard).agg(F.count("*").alias("n"))


@query(
    "op_explode",
    # coalesce mirrors Explode's NULL==''-record-model fidelity: DuckDB
    # unnest(string_split(NULL)) emits zero rows, Spark's operator one
    "SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS word "
    "FROM documents",
)
def op_explode(spark, sf_dir):
    # record fan-out: the exploded rows THEMSELVES are hash-compared —
    # a transposed word or a row fanned out under the wrong doc_id now
    # fails the gate, where the old word-count sum could not see it
    df = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = ops.Explode(source="text", dst="word", separator=" ").apply(df)
    return out.select("doc_id", "word")


@query(
    "op_fieldselect",
    "SELECT event_id, value FROM events WHERE event_type = 'purchase'",
)
def op_fieldselect(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    df = ops.ClauseFilter("(event_type purchase)").apply(df)
    return ops.FieldSelect(fields=["event_id", "value"]).apply(df)
