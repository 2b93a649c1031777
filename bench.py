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

MEASUREMENT INTEGRITY (round 12): the headline artifact must defend
itself against host contention — round 11's official capture read 2.11x
vs baseline while a same-commit idle re-run measured 1.29x, and the old
single-pass harness had no way to notice beyond one pre-run canary. The
default entry point is now an ORCHESTRATOR: it runs the whole suite in
K fresh JVMs (exactly the fresh-JVM shape the per-round driver measures
and tools/bench_variance.py already used), stamps the CPU canary BEFORE
AND AFTER every suite pass (a spike that starts mid-suite can no longer
hide behind a clean pre-canary), classifies each pass clean/contended on
the absolute 32-wide canary wall, retries the WHOLE SUITE while clean
passes are short of quota, and reports the MEDIAN clean pass — with
every pass's canaries and totals kept in the artifact so a reader can
re-derive the verdict. `python bench.py --single` runs one in-process
pass (local iteration; also the worker the orchestrator spawns).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

#: orchestrator shape: K fresh-JVM suite passes, require MIN_CLEAN of
#: them uncontended (before+after canary under gate), retry whole passes
#: up to MAX_JVMS total. 3/2/6 keeps the per-round wall under ~3 min
#: while making a single contended capture non-fatal AND non-headline.
N_JVMS = int(os.environ.get("SPARK_GRAFT_BENCH_JVMS", "3"))
MIN_CLEAN = int(os.environ.get("SPARK_GRAFT_BENCH_MIN_CLEAN", "2"))
MAX_JVMS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_JVMS", "6"))


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
    from pyspark.sql import functions as F

    from baker_spark import operators as ops
    from baker_spark.session import fan_out
    from baker_spark.sources.tables import load_table

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
    versa). ~0.7s total."""
    import hashlib

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


#: contention gate on the ABSOLUTE 32-wide canary wall. Calibration
#: (round 10, this container): a fully idle host measures canary_32p_s
#: ~0.31-0.34 with the 32p/1p ratio ~2.3 — the ratio carries a constant
#: (process spawn + SMT/frequency effects), and worse, frequency
#: throttling stretches BOTH canaries so a hot capture can show a
#: NORMAL ratio (round 9's contended artifact: 1p 0.263 / 32p 0.553,
#: ratio 2.1 — under the idle-ratio baseline!). The absolute 32p wall
#: separates them cleanly: 0.31 idle vs 0.55 hot.
#: Round 12: the gate now classifies WHOLE SUITE PASSES (max of the
#: before/after stamps), not just the in-pass chain retry, and it is
#: TIGHTENED from 0.45 to 0.40 (~1.2x idle): round 11's contended
#: artifact stamped canary_32p 0.418 — under the old gate, so nothing
#: fired while the suite read 40% slow. At 0.40 that capture is
#: CONTENDED and the orchestrator runs another pass; a moderately busy
#: host that never clears the gate now yields an artifact carrying
#: `"contended": true` instead of a silently slow headline.
CANARY_GATE_32P_S = 0.40


def pass_is_clean(doc: dict, gate: float = CANARY_GATE_32P_S) -> bool:
    """A suite pass is uncontended iff BOTH canary stamps (before and
    after the Spark work) are under the absolute 32p gate — a co-tenant
    burst starting mid-suite trips the after-stamp."""
    before = doc.get("canary_before", {}).get("canary_32p_s")
    after = doc.get("canary_after", {}).get("canary_32p_s")
    if before is None or after is None:
        return False
    return max(before, after) <= gate


def orchestrate(run_pass, n_jvms: int = N_JVMS, min_clean: int = MIN_CLEAN,
                max_jvms: int = MAX_JVMS, gate: float = CANARY_GATE_32P_S) -> dict:
    """Contention-proof envelope over ``run_pass() -> suite doc``.

    Runs ``n_jvms`` passes, classifies each clean/contended on its
    before+after canaries, and RETRIES WHOLE PASSES while clean count
    < ``min_clean`` and total passes < ``max_jvms``. Headline = the
    MEDIAN clean pass by suite total (its queries/records_per_sec are
    reported verbatim so `value` == sum(queries) within rounding). If
    the budget exhausts with no clean pass, the least-contended pass
    headlines and the artifact carries ``"contended": true`` — the
    artifact can be captured hot, but never silently.

    Pure orchestration (no Spark, no clock beyond what run_pass does) so
    tests can drive it with synthetic passes — including the pinned
    busy-loop contention-spike test."""
    passes: list[dict] = []
    while len(passes) < max_jvms:
        passes.append(run_pass())
        clean = [d for d in passes if pass_is_clean(d, gate)]
        if len(passes) >= n_jvms and len(clean) >= min_clean:
            break
        # chronic-load short-circuit: when the quota pass count is done
        # and NOT ONE pass was clean, the contention is steady, not
        # bursty — one extra probe pass is allowed, then retrying is
        # wasted wall (measured: a steadily-loaded host reads canary
        # 0.41-0.66 on all six passes; the extra three bought nothing
        # but ~4.5 min). Bursty contention (some passes clean) still
        # retries to max_jvms chasing the min_clean quota.
        if len(passes) >= n_jvms + 1 and not clean:
            break
    clean = [d for d in passes if pass_is_clean(d, gate)]
    contended = not clean
    if clean:
        ranked = sorted(clean, key=lambda d: d["value"])
        headline = ranked[(len(ranked) - 1) // 2]  # lower median
    else:
        # least-contended pass: smallest worst-case canary stamp,
        # fastest suite as the tie-break
        headline = min(
            passes,
            key=lambda d: (
                max(
                    d.get("canary_before", {}).get("canary_32p_s", float("inf")),
                    d.get("canary_after", {}).get("canary_32p_s", float("inf")),
                ),
                d["value"],
            ),
        )
    totals = sorted(d["value"] for d in (clean or passes))
    out = dict(headline)
    out.update(
        {
            "suite_passes": [
                {
                    "value": d["value"],
                    "records_per_sec": d.get("records_per_sec"),
                    "canary_before": d.get("canary_before"),
                    "canary_after": d.get("canary_after"),
                    "clean": pass_is_clean(d, gate),
                }
                for d in passes
            ],
            "envelope": {
                "min": totals[0],
                "median": totals[(len(totals) - 1) // 2],
                "max": totals[-1],
                "n": len(totals),
            },
            "n_passes": len(passes),
            "n_clean": len(clean),
            "suite_retried": len(passes) > n_jvms,
            "contended": contended,
            "canary_gate_32p_s": gate,
        }
    )
    return out


def _chain_runs(spark, sf_dir) -> list[float]:
    """N_RUNS of the full reference-topology analog: read -> filter
    chain -> serialize (ToText, logline.go:152-220) -> gzip files. Same
    write path as sinks/filewriter.py: one concat_ws line per record
    through the text writer — byte-identical to the quote-disabled CSV
    writer and ~9% faster (the CSV escape machinery does nothing useful
    with quoting off)."""
    from baker_spark.sinks.filewriter import serialize_line

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


def run_suite() -> dict:
    """ONE full suite pass in THIS process: canary -> Spark suite ->
    canary. The orchestrator spawns this via `bench.py --single`; local
    iteration calls it directly."""
    from baker_spark.queries import all_queries
    from baker_spark.session import get_spark
    from baker_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    canary_before = cpu_canary()
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
    if canary_before["canary_32p_s"] > CANARY_GATE_32P_S:
        # hot capture: give the host one chance to quiet down, keep the
        # honest union of both passes (min() picks the best either way).
        # First-line defense only — the orchestrator's whole-pass retry
        # is the real gate; this just salvages a transiently-hot pass.
        chain_retried = True
        canary_before = cpu_canary()
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

    spark.stop()
    canary_after = cpu_canary()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": all_runs,
        "sf": sf,
        "records_per_sec": records_per_sec,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)),
        "chain_retried": chain_retried,
        "canary_before": canary_before,
        "canary_after": canary_after,
        # back-compat stamps (rounds 7-11 artifacts carried exactly one
        # pre-run canary under these keys; keep tooling comparisons alive)
        **canary_before,
    }


def _spawn_pass() -> dict:
    """One fresh-JVM suite pass via subprocess — the same isolation the
    per-round driver and tools/bench_variance.py measure."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=dict(os.environ),
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench suite pass failed (exit {proc.returncode})")
    doc = json.loads(proc.stdout.strip().splitlines()[-1])
    sys.stderr.write(
        f"bench pass: total={doc['value']}s rec/s={doc['records_per_sec']}"
        f" canary32p={doc['canary_before']['canary_32p_s']}"
        f"->{doc['canary_after']['canary_32p_s']}"
        f" clean={pass_is_clean(doc)}\n"
    )
    return doc


def main() -> None:
    if "--single" in sys.argv[1:]:
        print(json.dumps(run_suite()))
        return
    out = orchestrate(_spawn_pass)
    # per-query run lists of non-headline passes are bulky and fully
    # re-derivable from a --single re-run; keep the headline pass's
    out.pop("runs_all", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
