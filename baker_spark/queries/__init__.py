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

# the driver's 50-query correctness window, in order.
#
# ROUND-8 ROTATION: every catalog query that had NEVER appeared in a
# driver CORRECTNESS artifact (41 of them, VERDICT r7 "next round" #2)
# is rotated IN this round, so by the round-8 artifact the entire
# catalog has at least one hard driver-gated row. Rotated out to make
# room: the §2.2 filter/topology ops and round-5/6/7 flagships, each
# with 4-7 consecutive green rounds (r01-r07) and still swept at four
# SFs every CI run by tests/test_oracle_parity.py.
GATE_ORDER = [
    # changed THIS round — capped defaults / auto scrub engine — so the
    # semantics change lands with a fresh driver row, plus the flagship
    "q1_pricing_summary",
    "dp_minhash_lsh_pairs",   # now capped by default (DEFAULT_BUCKET_CAP)
    "dp_simhash_pairs",       # now capped by default (DEFAULT_BAND_CAP)
    "dp_corpus_pipeline",     # scrub engine auto-pick wired in
    "dp_scrub",               # jvm-pinned scrub sibling
    "dp_dedup_exact",         # flagship scale path continuity
    "dp_ngram_jaccard_pairs", # r7 exchange-count change continuity
    "dp_ann_topk",
    # never-gated backlog: dedup/pairs family
    "dp_minhash_exhaustive",  # new: explicit cap opt-out
    "dp_simhash_exhaustive",  # new: explicit cap opt-out
    "dp_simhash",
    "dp_simhash_capped",
    "dp_dedup_incremental",
    "dp_minhash_jaccard_est",
    "dp_fingerprint",
    "dp_embedding_dedup",
    "dp_decontaminate_shuffle",
    # never-gated: vectors / ANN family
    "dp_cosine_pairs",
    "dp_ann_lsh_buckets",
    "dp_ann_topk_bucketed",
    "dp_ann_recall",
    "dp_ivf_assign",
    "dp_ivf_topk",
    # never-gated: text analysis family
    "dp_langid",
    "dp_quality",
    "dp_quality_filter",
    "dp_tfidf_topk",
    "dp_unigram_logprob",
    "dp_dsir_weights",
    "dp_scrub_arrow",
    "dp_repetition",
    "dp_chunking",
    "dp_vocab_topk",
    "dp_bigram_topk",
    "dp_kmv_distinct",
    "dp_repeated_passages",
    "dp_passage_scrub",
    # never-gated: corpus assembly / sampling family
    "dp_sample_stratified",
    "dp_train_split",
    "dp_shard_manifest",
    "dp_source_quota",
    "dp_lang_mix_weights",
    # never-gated: extended SQL surface
    "q_asof_join",
    "q_set_ops",
    "q_pivot",
    "q_unpivot",
    "q_range_join",
    "q_scalar_subquery",
    "q_grouping_sets",
    # new this round: sample-exact pixel/PCM decode
    "dp_multimodal_features",
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
