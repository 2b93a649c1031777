#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "records_per_sec": ...}

The suite covers the engine's three workload families:
- the reference's own shape: a record-at-a-time filter topology over the
  string-cast lineitem (compare against BASELINE.md's 178k rec/s per
  8 vCPU published number — here it's parquet->chain->gzip csv)
- analytics: scan-agg (q1), broadcast joins (q3/q5), windows
- document pipeline: exact + minhash-LSH dedup, simhash pairs, ANN top-k

Each query is forced with a noop write (full materialization, no driver
collect). A warmup action absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from baker_spark import operators as ops  # noqa: E402
from baker_spark.queries import all_queries  # noqa: E402
from baker_spark.session import fan_out, get_spark  # noqa: E402
from baker_spark.sinks.filewriter import serialize_line  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_per_group",
    "q_session_windows",
    "q_cube_rollup",
    "dp_dedup_exact",
    "dp_minhash_lsh_pairs",
    "dp_simhash_pairs",
    "dp_ann_topk",
    "dp_token_counts",
    "dp_scrub",
    "dp_corpus_pipeline",
]

#: best-of-N: run 1 pays plan compilation + whole-stage codegen, run 2
#: still JITs; run 3+ is steady state — the number a 100 TB projection
#: scales from (at that scale compile cost is noise; here it is not).
#: All N per-query times are ALSO emitted (``runs`` key) so a reader can
#: tell a real regression from same-commit variance — see PERFORMANCE.md
#: for the pinned envelope.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))


def baker_chain(spark, sf_dir):
    """The reference's published topology shape: string records through a
    filter chain to compressed files (README.md:111-120). lineitem rows
    stand in for the ~4.5 KB log lines.

    The scan is a single parquet row group (serial task), so the chain's
    pure predicates are hoisted above the fan-out shuffle
    (ops.split_chain): only surviving rows are exchanged, the filters
    evaluate inside the scan stage where Catalyst wants them, and the
    fully-hoisted pure predicates are elided from the post-shuffle chain
    (each filter runs once, like the reference's single-pass chain)."""
    chain = [
        ops.ClauseFilter("(or (l_returnflag A) (l_returnflag N))"),
        ops.NotNull(["l_orderkey", "l_partkey"]),
        ops.RegexMatch(fields=["l_linenumber"], regexs=["^[0-9]+$"]),
        ops.Concatenate(["l_orderkey", "l_linenumber"], target="line_id", separator="-"),
        ops.Hash(src_field="line_id", dst_field="line_hash", function="md5", encoding="hex"),
        ops.TimestampRange(
            # l_partkey, not l_quantity: the op now carries ParseInt
            # strictness (a float's "23.0" string rightly drops), and the
            # chain wants the parse-to-long WORK on every row, not a
            # drop-everything filter
            field="l_partkey", start_datetime=None, end_datetime=None
        ),  # parse-to-long predicate
    ]
    li = load_table(spark, sf_dir, "lineitem")
    preds, rest = ops.split_chain(chain)
    for p in preds:
        li = li.filter(p)  # predicates run at the (native) scan
    li = fan_out(li, by="l_orderkey")  # ≈ [filterchain] procs — shuffles only survivors
    df = li.select(*[F.col(c).cast("string").alias(c) for c in li.columns])
    return ops.chain(df, rest)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def cpu_canary() -> dict[str, float]:
    """Machine-state stamp for cross-run comparability: the same fixed
    md5 loop single-process and 32-processes-wide. On an idle 32-core
    box the wide wall ~= the single wall; under host-level contention
    it stretches proportionally — so a slow suite with a stretched
    canary is machine drift, not an engine regression (and vice
    versa). ~0.7s total, measured before any Spark work."""
    import hashlib
    import subprocess

    def one() -> float:
        t0 = time.perf_counter()
        h = hashlib.md5()
        for _ in range(2_000_000):
            h.update(b"x" * 32)
        return round(time.perf_counter() - t0, 3)

    single = one()
    code = "import hashlib\nh=hashlib.md5()\nfor i in range(2_000_000): h.update(b'x'*32)"
    t0 = time.perf_counter()
    procs = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(32)]
    for p in procs:
        p.wait()
    return {"canary_1p_s": single, "canary_32p_s": round(time.perf_counter() - t0, 3)}


#: contention gate for the HEADLINE chain number, on the ABSOLUTE
#: 32-wide canary wall. Calibration (round 10, this container): a fully
#: idle host measures canary_32p_s ~0.31-0.34 with the 32p/1p ratio
#: ~2.3 — the ratio carries a constant (process spawn + SMT/frequency
#: effects), and worse, frequency throttling stretches BOTH canaries so
#: a hot capture can show a NORMAL ratio (round 9's contended artifact:
#: 1p 0.263 / 32p 0.553, ratio 2.1 — under the idle-ratio baseline!).
#: The absolute 32p wall separates them cleanly: 0.31 idle vs 0.55 hot.
#: Gate at 1.5x idle: when the first pass is captured hotter than this,
#: the chain re-runs once and the canary is re-stamped so BENCH_r{N}
#: headlines are comparable across rounds (both passes stay in `runs`).
CANARY_GATE_32P_S = 0.45


def _chain_runs(spark, sf_dir) -> list[float]:
    """N_RUNS of the full reference-topology analog: read -> filter
    chain -> serialize (ToText, logline.go:152-220) -> gzip files. Same
    write path as sinks/filewriter.py: one concat_ws line per record
    through the text writer — byte-identical to the quote-disabled CSV
    writer and ~9% faster (the CSV escape machinery does nothing useful
    with quoting off)."""
    out_dir = tempfile.mkdtemp(prefix="baker_bench_out_")
    runs = []
    # +2 over the per-query N_RUNS: the chain is the HEADLINE number
    # (records_per_sec derives from its min) and it is the suite's
    # JIT-heaviest pipeline — round-10 measurement showed run 4 still
    # descending (1.43s) toward the deep-warm steady state (~1.15s, the
    # interleaved same-session A/B), so the extra two runs buy headline
    # stability for ~3s of wall. The full run list stays in `runs`.
    for i in range(N_RUNS + 2):
        t0 = time.perf_counter()
        df = baker_chain(spark, sf_dir)
        line = serialize_line(df.columns, ",")
        (
            df.select(line.alias("value"))
            .write.mode("overwrite")
            .option("compression", "gzip")
            # the reference writes gzip BestSpeed (filewriter.go:392-394);
            # Hadoop 3.3+'s BuiltInGzipCompressor honors this per-job
            # option, so the chain pays the same deflate CPU it would
            .option("zlib.compress.level", "BEST_SPEED")
            .text(os.path.join(out_dir, f"csv_gz_{i}"))
        )
        runs.append(round(time.perf_counter() - t0, 3))
    shutil.rmtree(out_dir, ignore_errors=True)
    return runs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    canary = cpu_canary()
    spark = get_spark("baker_spark_bench")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # warmup: JVM, codegen, parquet footer caches
    load_table(spark, sf_dir, "lineitem").limit(1000).count()

    queries = all_queries()
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}

    n_lineitem = load_table(spark, sf_dir, "lineitem").count()
    runs = _chain_runs(spark, sf_dir)
    chain_retried = False
    if canary["canary_32p_s"] > CANARY_GATE_32P_S:
        # hot capture: give the host one chance to quiet down, keep the
        # honest union of both passes (min() picks the best either way)
        chain_retried = True
        canary = cpu_canary()
        runs = runs + _chain_runs(spark, sf_dir)
    all_runs["baker_filter_chain"] = runs
    timings["baker_filter_chain"] = min(runs)
    records_per_sec = int(n_lineitem / min(runs))

    for name in BENCH_QUERIES:
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            force(queries[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        all_runs[name] = runs
        timings[name] = min(runs)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": all_runs,
                "sf": sf,
                "records_per_sec": records_per_sec,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)),
                "chain_retried": chain_retried,
                **canary,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
