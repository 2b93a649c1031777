"""Query catalog — every operator from SURVEY.md §2 exercised over the
driver's synthetic tables, each with an ANSI-SQL DuckDB oracle.

Modules contribute ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]``; this package aggregates them for
``__spark_entry__``.

The driver's correctness gate checks the FIRST 50 queries in catalog
order, so ``GATE_ORDER`` pins exactly which 50 get a hard oracle row:
all §2.2 filters + §2.5 topology ops (variant pairs merged into one
query each), the benched analytics queries, the Stats-sink facets, and
every benched / flagship-scale datapipe query. Everything after the
window is still swept by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from baker_spark.queries import analytics, baker_ops, datapipe_queries, extended

# the driver's 50-query correctness window, in order
GATE_ORDER = [
    # §2.2 — the 24 reference filters (invert/semi-anti/metadata variants
    # merged so each filter keeps a green row without spending two slots)
    "op_clausefilter",
    "op_clearfields",
    "op_concatenate",
    "op_countandtag",
    "op_crypt",
    "op_dedup",
    "op_expandjson",
    "op_expandlist",
    "op_externalmatch",
    "op_formattime",
    "op_hash",
    "op_metadata",
    "op_notnull",
    "op_partialclone",
    "op_regexmatch",
    "op_replacefields",
    "op_setstringfromurl",
    "op_slice",
    "op_stringmatch",
    "op_timestamp",
    "op_timestamprange",
    "op_urlescape",
    "op_urlparam",
    # §2.5 — topology-level operators
    "op_validation",
    "op_sharding",
    "op_explode",
    "op_fieldselect",
    # analytics — every benched query gets a hard correctness row
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_per_group",
    "q_session_windows",
    "q_cube_rollup",
    # Stats sink (output/stats.go) — the one-row size+quantile report
    # (the q_stats_sizes / q_stats_quantiles facets stay in the catalog,
    # swept by the parity tests; merging them freed gate slots for the
    # round-5 clustering flagships below)
    "q_stats_report",
    "q_field_frequency",
    # datapipe — benched queries + flagship scale paths
    "dp_dedup_exact",
    "dp_minhash_lsh_pairs",
    "dp_ngram_jaccard_pairs",
    "dp_simhash_pairs",
    "dp_ann_topk",
    "dp_token_counts",
    "dp_scrub",
    "dp_corpus_pipeline",
    # round-5 clustering / data-selection flagships
    "dp_kmeans_train",
    "dp_semdedup",
    # round-6/7 additions rotated INTO the window so each gets a driver
    # correctness artifact (PQ/IVF-PQ search, the LSH hot-bucket cap,
    # and the real PNG/WAV header decode). Rotated out to make room —
    # each with green rows in CORRECTNESS_r05+r06 and still swept at
    # four SFs by tests/test_oracle_parity.py: dp_cosine_pairs_bucketed,
    # dp_dedup_clusters, dp_lsh_verified_pairs, dp_decontaminate,
    # dp_sequence_packing.
    "dp_pq_codes",
    "dp_pq_adc_topk",
    "dp_ivfpq_topk",
    "dp_minhash_capped",
    "dp_multimodal_decode",
]


def _merged() -> dict:
    out = {}
    for mod in (baker_ops, analytics, datapipe_queries, extended):
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_queries() -> dict:
    merged = _merged()
    missing = [n for n in GATE_ORDER if n not in merged]
    if missing:
        raise ValueError(f"GATE_ORDER names not registered: {missing}")
    out = {n: merged[n] for n in GATE_ORDER}
    out.update({n: fn for n, fn in merged.items() if n not in out})
    return out


def all_oracles() -> dict:
    merged = {}
    for mod in (baker_ops, analytics, datapipe_queries, extended):
        merged.update(mod.ORACLES)
    return {n: merged[n] for n in all_queries() if n in merged}
