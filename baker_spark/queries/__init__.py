"""Query catalog — every operator from SURVEY.md §2 exercised over the
driver's synthetic tables, each with an ANSI-SQL DuckDB oracle.

Modules contribute ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]``; this package aggregates them for
``__spark_entry__``.

The driver's correctness gate checks the FIRST 50 queries in catalog
order, so ``GATE_ORDER`` pins exactly which 50 get a hard driver oracle
row THIS round. The window ROTATES per the pinned contract
(COVERAGE.md §gate-rotation): new queries enter on arrival, rows green
for >=3 consecutive driver rounds may rotate out while a sibling gates
their machinery, and benched rows rotate back in when they lack a
recent receipt. As of round 13 the window holds: every BENCH_QUERIES
row except the two lightest (dp_token_counts, whose arithmetic
underlies several still-gated dp rows, and dp_scrub — both four-SF
CI-swept), the quirk-bearing §2.2 filters + §2.5 topology ops, the
Stats-sink facets, the r12-arrival datapipe tiers, the kmeans/PQ/IVF
family, and the streaming surface. Rotation changes which rows get a
DRIVER receipt,
never which queries are checked — everything outside the window is
swept value-exact at four SFs by tests/test_oracle_parity.py every CI
run.
"""

from __future__ import annotations

from baker_spark.queries import (
    analytics,
    baker_ops,
    datapipe_queries,
    extended,
    streaming_queries,
)

# the driver's 50-query correctness window, in order.
#
# ROUND-9 ROTATION (VERDICT r8 "next round" #2): the freshness pass.
# Rotated IN: dp_bigram_surprisal (the ONE catalog query with no driver
# row ever — landed after the r8 window was pinned), dp_ann_search (new
# this round), every §2.2/§2.5 op whose newest row is r07 — including
# the four whose semantics round 8 touched (op_urlparam decode, op_hash
# raw default, op_timestamprange ParseInt strictness, op_formattime
# layout table) — the r07-gated q_* analytics/stats surface, and the
# r07-gated dp tail (token_counts, dedup_clusters, kmeans, PQ family).
# Rotated OUT: the 41 first-gated-in-r08 queries (1 round fresh) plus
# eight r07 rows whose machinery a fresh r08 sibling row covers
# (dp_dedup_fingerprint~dp_fingerprint, dp_minhash_capped~
# dp_minhash_lsh_pairs, dp_multimodal_decode~dp_multimodal_features,
# dp_decontaminate~dp_decontaminate_shuffle, dp_cosine_pairs_bucketed~
# dp_cosine_pairs/dp_embedding_dedup, dp_lsh_verified_pairs~
# dp_ann_lsh_buckets+dp_ngram_jaccard_pairs, dp_semdedup~
# dp_embedding_dedup, dp_sequence_packing) — all still swept at four
# SFs every CI run by tests/test_oracle_parity.py.
GATE_ORDER = [
    # flagship + r11 carry (fresh enough to hold their slots)
    "q1_pricing_summary",
    "dp_ann_search",
    "dp_bigram_surprisal",
    # ROUND-13 ROTATION (VERDICT r12 "next round" #2): the benched rows
    # come back in — dp_minhash_lsh_pairs / dp_simhash_pairs /
    # dp_ann_topk / dp_dedup_exact / dp_corpus_pipeline /
    # q5_local_supplier_volume / q_cube_rollup are headline BENCH_r13
    # rows and their newest driver receipt was r11; a perf number whose
    # correctness receipt is stale is half a number. Rotated OUT (7-for-
    # 7): q_asof_join / q_set_ops / q_pivot / q_unpivot / q_range_join /
    # q_scalar_subquery / q_grouping_sets — all r12-gated green on
    # arrival-quality hashes, machinery swept four-SF by
    # test_oracle_parity every CI run (grouping-set machinery also stays
    # gated via the rotated-in q_cube_rollup). Rotation contract:
    # COVERAGE.md §gate-rotation.
    "q5_local_supplier_volume",
    "q_cube_rollup",
    "dp_dedup_exact",
    "dp_minhash_lsh_pairs",
    "dp_simhash_pairs",
    "dp_ann_topk",
    "dp_corpus_pipeline",
    # r12 rotation carry: the kmeans/PQ/IVF family (rotated back in r12
    # after the r11 window dropped it; keep — these are dp_ann_search's
    # trainers/encoders and the family is the ANN flagship).
    "dp_kmeans_train",
    "dp_pq_codes",
    "dp_pq_adc_topk",
    "dp_ivfpq_topk",
    "dp_phash_band_saturation",
    # ROUND-12 LATE ADDITIONS (contract rule 1: every NEW query enters
    # the window its first round): the audio saturation leg and the
    # full Gopher A1.2 repetition battery. Rotated OUT to hold 50:
    # op_regexmatch (plain rlike; the same machinery runs driver-gated
    # inside the bench chain and RegexMatch e2e) and op_countandtag
    # (count+tag shape gated via q_field_frequency), both green
    # r09-r11 and four-SF CI-swept.
    "dp_audio_band_saturation",
    "dp_gopher_repetition",
    # dp_exact_substring_dedup (new: Lee et al. ExactSubstr — the
    # within-document surgical tier) enters over q5_local_supplier_volume
    # (green r09-r11; its broadcast-join machinery stays gated via
    # q3_shipping_priority and the CI four-SF sweep);
    # dp_token_frequency (new: corpus vocabulary tf/df top-200) enters
    # over q_cube_rollup (green r09-r11; grouping-set machinery now
    # gated via the rotated-in q_grouping_sets); dp_url_dedup (new:
    # canonical-URL dedup tier) enters over q_stats_timestamps (green
    # r09-r11; the Stats time facet's machinery stays gated via
    # q_stats_sizes/quantiles/report).
    "dp_exact_substring_dedup",
    "dp_token_frequency",
    "dp_url_dedup",
    # ROUND-13 ADDITION (contract rule 1): dp_kn_perplexity — the
    # CCNet-style cross-slice KN-smoothed bigram perplexity filter
    # (train on lang='en', score all; the reference-distribution tier
    # the corpus-self MLE rows can't express) — enters over
    # q_stats_quantiles (green r09-r12, 4-round streak; the identical
    # exact-percentile machinery stays driver-gated inside
    # q_stats_report's combined report, and the facet is swept four-SF
    # by test_oracle_parity every CI run).
    "dp_kn_perplexity",
    # §2.2 filters with reference-quirk semantics — kept gated
    "op_clausefilter",
    "op_crypt",
    "op_dedup",
    "op_expandjson",
    "op_externalmatch",
    "op_formattime",          # Go layout table
    "op_metadata",            # graceful missing-metadata
    "op_timestamprange",      # ParseInt strictness
    "op_urlparam",            # URL-decoded values
    # §2.5 topology ops, newest rows r07
    "op_validation",
    "op_sharding",
    "op_explode",
    "op_fieldselect",
    # analytics / stats surface, newest rows r07
    "q3_shipping_priority",
    "q_topk_per_group",
    "q_session_windows",
    "q_stats_sizes",
    "q_stats_report",
    "q_field_frequency",
    # dp tail, newest rows r07
    "dp_dedup_clusters",
    # ROUND-11 ADDITIONS (published filter sets): never driver-gated,
    # rotated in over dp_token_counts / q_percentile_by_group (both
    # green in r10; token_counts' arithmetic underlies several
    # still-gated dp rows, q_percentile_by_group's quantile machinery
    # stays gated through q_stats_quantiles, and both are swept four-SF
    # by test_oracle_parity every CI run).
    "dp_gopher_quality",
    "dp_c4_filters",
    # ROUND-11 ADDITIONS (multimodal near-dup + observability): never
    # driver-gated, rotated in over q_anti_join / q_window_funcs /
    # q_salted_agg (all green r10; the anti-join shape stays gated via
    # op_externalmatch, window machinery via q_session_windows +
    # q_topk_per_group, and the salted-agg demo is swept four-SF like
    # everything outside the window). dp_image_phash_pairs drives the
    # full encode -> pixel-decode -> phash -> banded-hamming chain;
    # dp_audio_fp_pairs gates the audio leg of the same engine;
    # dp_image_neardup_ingest gates the verified-band ingest decision.
    "dp_image_phash_pairs",
    "dp_audio_fp_pairs",
    "dp_image_neardup_ingest",
    # ROUND-11 ROTATION (VERDICT r10 "next round" #5): the streaming
    # surface enters the driver gate — real Structured Streaming runs
    # (ordered micro-batch replay) hash-compared to batch oracles.
    # Rotated OUT: dp_kmeans_train / dp_pq_codes / dp_pq_adc_topk /
    # dp_ivfpq_topk (1 round fresh; the same trainers/encoders are
    # driver-gated through dp_ann_search + swept four-SF by
    # tests/test_oracle_parity.py every CI run).
    "dp_streaming_dedup",
    "dp_streaming_running_counter",
    "dp_streaming_sessions",
    "dp_streaming_ingest_ledger",
]


def _merged() -> dict:
    out = {}
    for mod in (baker_ops, analytics, datapipe_queries, extended, streaming_queries):
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
    for mod in (baker_ops, analytics, datapipe_queries, extended, streaming_queries):
        merged.update(mod.ORACLES)
    return {n: merged[n] for n in all_queries() if n in merged}
