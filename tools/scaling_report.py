"""Empirical scaling evidence: run the bench suite at every available
scale factor and report per-query wall time plus the fitted scaling
exponent between consecutive SFs.

At 100x more data a linearly-scaling query grows its work 100x but its
wall time ideally much less (more partitions to parallelize). Locally —
same core count at each SF — wall time growth directly exposes the work
exponent: exponent ~1 = linear (scan/agg), ~2 = quadratic (a pair join
that will not survive 100 TB). The point of the report is a regression
guard: any query whose exponent drifts toward 2 gets flagged before it
matters.

Usage: python tools/scaling_report.py [--sfs sf0.001,sf0.01,sf0.1]
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baker_spark import get_spark  # noqa: E402
from baker_spark.queries import all_queries  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402

#: sf dirs resolve against the driver's read-only testdata first, then
#: the repo-local dir where tools/gen_testdata.py extends the ladder
#: (sf1 — one decade past what the driver ships)
TESTDATA_ROOTS = [
    "/root/testdata",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata"),
]


def resolve_sf(sf: str) -> str | None:
    for root in TESTDATA_ROOTS:
        p = os.path.join(root, sf)
        if os.path.isdir(p):
            return p
    return None

#: the bench suite plus the pairwise/iterative operators whose scaling
#: behavior is the interesting part.
REPORT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_per_group",
    "q_session_windows",
    "q_cube_rollup",
    "q_percentile_by_group",
    "dp_dedup_exact",
    "dp_dedup_incremental",
    "dp_quality_filter",
    "dp_unigram_logprob",
    "dp_bigram_surprisal",
    "dp_kn_perplexity",
    "dp_tfidf_topk",
    "dp_train_split",
    "dp_source_quota",
    "dp_repeated_passages",
    "dp_passage_scrub",
    "dp_minhash_lsh_pairs",
    "dp_minhash_exhaustive",
    "dp_lsh_verified_pairs",
    "dp_simhash_pairs",
    "dp_simhash_exhaustive",
    "dp_simhash_capped",
    "dp_dedup_clusters",
    "dp_ann_topk",
    "dp_ann_search",
    "dp_vocab_topk",
    "dp_corpus_pipeline",
    "dp_dsir_weights",
    "dp_kmeans_train",
    "dp_semdedup",
    "dp_pq_codes",
    "dp_pq_adc_topk",
    "dp_ivfpq_topk",
    "dp_multimodal_features",
]

#: queries whose work is inherently pairwise on candidate sets — an
#: exponent above 1 at tiny SFs is expected noise there, not a smell.
PAIRWISE = {
    "dp_minhash_lsh_pairs", "dp_minhash_exhaustive", "dp_lsh_verified_pairs",
    "dp_simhash_pairs", "dp_simhash_exhaustive", "dp_simhash_capped",
    "dp_dedup_clusters", "dp_semdedup",
}

#: bench.py's headline queries (minus the bench-internal filter chain):
#: the only rows measured at SFs past sf1 — the sf10 decade exists to
#: extend the headline exponents, not to grind the whole catalog
#: through a quadratic-oracle-free sweep.
HEADLINE = {
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_per_group",
    "q_session_windows",
    "q_cube_rollup",
    "dp_dedup_exact",
    "dp_dedup_incremental",
    "dp_minhash_lsh_pairs",
    "dp_simhash_pairs",
    "dp_simhash_capped",
    "dp_ann_topk",
    "dp_token_counts",
    "dp_scrub",
    "dp_corpus_pipeline",
}

#: SFs past this run only HEADLINE queries
FULL_SWEEP_MAX_SF = 1.0

#: iterative (driver-round) queries: wall time at toy SFs is fixed
#: per-round overhead, so their exponent reads low or negative.
ITERATIVE = {"dp_kmeans_train", "dp_semdedup", "dp_pq_codes", "dp_pq_adc_topk", "dp_ivfpq_topk"}

#: dp_repeated_passages' exponent (~0.6-0.7) is OUTPUT growth, not a plan
#: defect: a 10x corpus produced 11.2x repeated grams (1,096 -> 12,235 at
#: sf0.01 -> sf0.1) — more documents collide more. The plan itself is one
#: explode + one aggregation, linear in tokens.

N_RUNS = 2


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sfs = ["sf0.001", "sf0.01", "sf0.1"]
    argv = sys.argv[1:]
    for i, arg in enumerate(argv):
        if arg.startswith("--sfs="):
            sfs = arg.split("=", 1)[1].split(",")
        elif arg == "--sfs" and i + 1 < len(argv):  # documented space form
            sfs = argv[i + 1].split(",")
    missing = [s for s in sfs if resolve_sf(s) is None]
    sfs = [s for s in sfs if resolve_sf(s) is not None]
    if not sfs:
        raise SystemExit(
            f"no usable scale factors: {missing} not found under {TESTDATA_ROOTS}"
        )
    spark = get_spark("baker_spark_scaling")
    queries = all_queries()

    # warmup
    load_table(spark, resolve_sf(sfs[0]), "lineitem").limit(100).count()

    results: dict[str, dict[str, float]] = {}
    for sf in sfs:
        sf_dir = resolve_sf(sf)
        headline_only = float(sf[2:]) > FULL_SWEEP_MAX_SF
        # warm the page cache for THIS SF's files before timing anything:
        # without it the first queries at a big SF pay a cold disk read
        # the later ones don't (measured: q1 at sf10 read 7.3s cold vs
        # 2.6s warm), which corrupts the fitted exponents with an
        # IO-order artifact rather than plan cost
        import glob as _glob

        for tbl in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
            force(spark.read.parquet(tbl))
        for name in REPORT_QUERIES:
            if headline_only and name not in HEADLINE:
                continue
            best = float("inf")
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                force(queries[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[sf] = best
            print(f"{sf} {name}: {best:.3f}s", flush=True)

    lines = [
        "# SCALING — bench suite wall time vs scale factor",
        "",
        "Best-of-%d per cell on local[%s]; `exp` fits t ~ sf^exp between the"
        % (N_RUNS, os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count())),
        "largest SF pair. Fixed per-job overhead dominates small SFs, which",
        "*understates* data-dependent growth there — the last column is the",
        "honest one. exp <= ~1: linear (scan/agg/top-k shapes). Pairwise",
        "operators (marked *) grow with candidate count, not corpus size;",
        "their guard is the LSH/banding prune keeping candidates sparse.",
        "dp_repeated_passages' exponent is OUTPUT growth (10x corpus ->",
        "11.2x repeated grams at these SFs), not plan growth: the plan is",
        "one explode + one aggregation, linear in tokens.",
        "",
        "sf1 and sf10 are repo-generated (tools/gen_testdata.py — one and two",
        "decades past the driver's data; PARITY_SF1.md records the 100/100",
        "oracle sweep at sf1). Rows marked — were not run at that SF: past",
        "sf1 only bench.py's headline queries are measured, so each row's",
        "exponent fits its LAST MEASURED pair (sf1->sf10 for headliners,",
        "sf0.1->sf1 for the rest).",
        "",
        "dp_dedup_incremental's catalog row derives batch AND ledger from the",
        "same growing table (both 10x per decade — the worst case). The",
        "production path is write_seen_ledger + incremental_dedup_against_ledger:",
        "fp-bucketed ledger, per-batch hash anti-join with no ledger shuffle or",
        "sort. tools/ledger_bench.py holds the batch constant while the ledger",
        "grows 10x (1M -> 10M keys): bucketed 0.83s vs plain 1.35s per batch,",
        "growth exponent 0.15 vs 0.27 — the ledger's growth leaks into per-batch",
        "cost at roughly half the rate, and what remains is the linear scan of",
        "one narrow pre-bucketed column, not shuffle traffic.",
        "",
        "q_percentile_by_group (>0.5) is exact-percentile sort growth. The",
        "pairwise rows (*) grow with candidate count under the synthetic",
        "corpus's 30-word vocabulary skew. dp_simhash_pairs' 1.68 exponent is",
        "pure OUTPUT growth: the corpus emits 2,919,770,281 pairs at sf10 vs",
        "29.68M at sf1 (measured — x98 pairs for x10 docs, because every doc",
        "draws from 30 words), while engine throughput IMPROVES (12.9M pairs/s",
        "at sf10 vs 8M at sf1). The capped twin dp_simhash_capped (band_cap=40,",
        "same exclusion rule in its oracle) is the production shape: 4.8s and",
        "exp 0.29 across the same decade. lsh_pairs' bucket_cap",
        "(dp_minhash_capped) bounds the minhash mega-bucket the same way.",
        "ngram-jaccard's verify now regroups the prefix stage's persisted",
        "shingle table (13 -> 9 exchanges, one fewer document scan). IVF-PQ",
        "search carries centroid_id in the codes table: probing is a",
        "pushed-down cell filter, nothing corpus-sized broadcast.",
        "",
        "Round-7 regression fixed BY this sweep: fingerprint() spent ~20s of",
        "dp_dedup_incremental's and dp_corpus_pipeline's sf10 cells inside ONE",
        "regexp_replace char-class pass (Spark's RegExpReplace scans",
        "~125ns/char even with zero matches). Tokenizing via split on delimiter",
        "runs — identical tokens — cut both rows ~7x (21.9s -> 3.5s, 23.6s ->",
        "3.5s) and their exponents from 1.07/0.92 to 0.40/0.47.",
        "",
        "| query | " + " | ".join(sfs) + " | exp(last pair) |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    for name in REPORT_QUERIES:
        # a headline-only sweep (every SF past FULL_SWEEP_MAX_SF) never
        # measures the non-headline names at all — render their rows as
        # all-dash instead of dying on the lookup after the timed sweep
        row = results.get(name, {})
        cells = [f"{row[sf]:.2f}s" if sf in row else "\u2014" for sf in sfs]
        have = [sf for sf in sfs if sf in row]
        if len(have) >= 2:
            a, b = have[-2], have[-1]
            ratio_sf = float(b[2:]) / float(a[2:])
            exp = math.log(row[b] / row[a]) / math.log(ratio_sf)
            exp_s = f"{exp:.2f}"
        else:
            exp_s = "n/a"
        mark = "\\*" if name in PAIRWISE else ""
        mark += "\u2020" if name in ITERATIVE else ""
        lines.append(f"| {name}{mark} | " + " | ".join(cells) + f" | {exp_s} |")
    lines += [
        "",
        "\u2020 iterative: wall time at these SFs is fixed driver-round overhead",
        "(k-means collects k*dim ints per Lloyd iteration \u2014 3-4 jobs per run \u2014",
        "plus Arrow kernel startup), which is why dp_kmeans_train can *fall* with",
        "SF. The data-dependent work per iteration is one narrow int64 kernel",
        "pass + one map-side-combined (cid, pos) aggregate \u2014 linear in rows.",
        "dp_semdedup adds the per-cell pair kernel on top (quadratic in the",
        "largest CELL, never the corpus \u2014 raise k to split cells).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
