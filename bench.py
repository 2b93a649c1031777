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
a SELF-CALIBRATING gate (relative to the run's own canary floor, capped
by an absolute chronic ceiling — round 13; see CANARY_RELATIVE_FACTOR),
retries the WHOLE SUITE while clean passes are short of quota, and
reports the MEDIAN clean pass — with
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
    "dp_exact_substring_dedup",
]

#: round-13 catalog-freshness row (VERDICT r12 #8): the heaviest
#: round-12 kernel gets round-over-round tracking, but at 3 runs
#: instead of N_RUNS — measured descent at sf0.1/local[32] is
#: 12.5s (plan compile + codegen of the interval-fold chain), 4.4s,
#: 3.4s, 3.5s: run 3 IS steady state (run 3 vs 4 within 3%), while
#: best-of-2 would over-read by ~28%. Run 4 would buy nothing for
#: +3.5s per pass. Budget: the row adds ~20s per pass / ~1 min across
#: the 3-pass orchestrate, keeping the orchestrated wall under ~4 min.
BENCH_RUN_OVERRIDES = {"dp_exact_substring_dedup": 3}

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
    from baker_spark.session import carry_split_key

    li = src = load_table(spark, sf_dir, "lineitem")
    preds, rest = ops.split_chain(chain)
    for p in preds:
        li = li.filter(p)  # predicates run at the (native) scan
    # filters don't change scan splits — carry the split-count stamp
    # through so fan_out's cache applies (see session.carry_split_key
    # for the narrow-derivations-only contract)
    carry_split_key(src, li)
    li = fan_out(li, by="l_orderkey")  # ≈ [filterchain] procs — shuffles only survivors
    # one selectExpr call for the 16-column string cast: the Column
    # listcomp cost ~80 py4j round trips per build, paid on every one of
    # the 6 timed chain runs (round 13; same projection either way).
    # Names backtick-escaped like transforms._q (ADVICE r13).
    df = li.selectExpr(
        *[
            "cast(`{0}` as string) AS `{0}`".format(c.replace("`", "``"))
            for c in li.columns
        ]
    )
    return ops.chain(df, rest)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def cpu_canary() -> dict[str, float]:
    """Machine-state stamp for cross-run comparability: the same fixed
    md5 loop single-process and 32-processes-wide, plus a MEMORY
    BANDWIDTH sweep. On an idle 32-core box the wide wall ~= the
    single wall; under host-level contention it stretches
    proportionally — so a slow suite with a stretched canary is
    machine drift, not an engine regression (and vice versa).

    The bandwidth stamp (round 13) closes the md5 canaries' observed
    blind spot: a co-tenant saturating the socket's memory bus lifted
    Spark walls 30-40% while the pure-register md5 loop moved ~4%
    (PERFORMANCE.md round-13 closing envelope). Sixteen single-thread
    sums over a 256 MB buffer — far past any LLC, so every pass
    streams from DRAM and the wall is 1/(this process's bandwidth
    share). ~1s total for all three stamps."""
    import hashlib

    import numpy as np

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
    wide = round(time.perf_counter() - t0, 3)
    arr = np.zeros(32 * 1024 * 1024)  # 256 MB of float64
    arr.sum()  # fault the pages in; allocation cost is not bandwidth
    t0 = time.perf_counter()
    for _ in range(16):
        arr.sum()
    bw = round(time.perf_counter() - t0, 3)
    return {"canary_1p_s": single, "canary_32p_s": wide, "canary_bw_s": bw}


#: SELF-CALIBRATING contention gate (round 13). History: round 10
#: calibrated an absolute gate from "idle = 0.31-0.34" and round 12
#: tightened it to 0.40 — then this container's idle floor drifted to
#: ~0.40-0.43 (kernel / co-tenant baseline shift), so BENCH_r12.json
#: carried `n_clean: 0` on passes that two independent idle re-runs
#: confirmed were the best ever measured: an absolute constant goes
#: stale, and a gate that is always red is no gate. The round-13 gate is
#: RELATIVE to the run's own measured floor: the minimum canary_32p
#: stamp across every pass of THIS orchestrate run estimates the host's
#: current idle wall, and a pass is clean iff its worst stamp is within
#: CANARY_RELATIVE_FACTOR of that floor. Two properties survive from
#: the absolute design:
#: - a hard CHRONIC ceiling (round 9's measured hot capture stamped
#:   0.553; anything at/above 0.55 can NEVER read clean even if the
#:   whole run is equally hot) keeps a steadily-loaded host from
#:   self-calibrating its load away entirely;
#: - every absolute stamp is still recorded per pass, so cross-round
#:   artifact comparisons (and a future recalibration) stay possible.
#: Residual blind window, stated honestly: steady load that lifts the
#: floor above true-idle but below the chronic ceiling reads clean —
#: indistinguishable from a host whose idle baseline drifted, which is
#: exactly the r12 failure this fixes. Bursty contention (the case that
#: actually corrupted r9/r11 artifacts) is caught relative to the
#: quiet passes around it.
CANARY_RELATIVE_FACTOR = 1.25
CANARY_CHRONIC_32P_S = 0.55
#: bandwidth stamps gate the same way — relative to the run's own
#: floor — but looser: single-thread DRAM-sweep walls are noisier than
#: the md5 loop (page placement, prefetcher state), and there is no
#: absolute-history calibration yet (first round carrying the stamp).
#: No chronic ceiling either, for the same no-history reason; the
#: stamps accumulate in artifacts so a future round can add one.
CANARY_BW_RELATIVE_FACTOR = 1.35


def _run_floor(passes: list[dict], key: str) -> float | None:
    stamps = [
        d.get(side, {}).get(key)
        for d in passes
        for side in ("canary_before", "canary_after")
    ]
    stamps = [s for s in stamps if s is not None]
    return min(stamps) if stamps else None


def run_floor_32p(passes: list[dict]) -> float | None:
    """The run's own idle estimate: min canary_32p across every before/
    after stamp of every pass so far (None until a stamped pass lands)."""
    return _run_floor(passes, "canary_32p_s")


def run_floor_bw(passes: list[dict]) -> float | None:
    return _run_floor(passes, "canary_bw_s")


def effective_bw_gate(passes: list[dict],
                      relative_factor: float = CANARY_BW_RELATIVE_FACTOR) -> float | None:
    """Bandwidth gate for THIS run: floor * factor; None when no pass
    carries bandwidth stamps (legacy artifacts, synthetic test docs)."""
    floor = run_floor_bw(passes)
    return None if floor is None else round(floor * relative_factor, 4)


def effective_gate(passes: list[dict],
                   relative_factor: float = CANARY_RELATIVE_FACTOR,
                   chronic: float = CANARY_CHRONIC_32P_S) -> float:
    """Gate for THIS run: floor * factor, capped at the chronic ceiling."""
    floor = run_floor_32p(passes)
    if floor is None:
        return chronic
    return min(round(floor * relative_factor, 4), chronic)


def pass_is_clean(doc: dict, gate: float, bw_gate: float | None = None) -> bool:
    """A suite pass is uncontended iff BOTH canary stamps (before and
    after the Spark work) are under the gate — a co-tenant burst
    starting mid-suite trips the after-stamp. When a bandwidth gate is
    in force and the pass carries bandwidth stamps, BOTH of those must
    clear it too (the memory-bus contention the md5 loop under-detects
    by ~10x — measured, PERFORMANCE.md round 13). Passes without
    bandwidth stamps (legacy artifacts) are judged on the CPU stamps
    alone rather than failed outright — the cross-round forensic
    re-reads must keep working."""
    before = doc.get("canary_before", {}).get("canary_32p_s")
    after = doc.get("canary_after", {}).get("canary_32p_s")
    if before is None or after is None:
        return False
    if max(before, after) > gate:
        return False
    if bw_gate is not None:
        bw_b = doc.get("canary_before", {}).get("canary_bw_s")
        bw_a = doc.get("canary_after", {}).get("canary_bw_s")
        if bw_b is not None and bw_a is not None and max(bw_b, bw_a) > bw_gate:
            return False
    return True


def orchestrate(run_pass, n_jvms: int = N_JVMS, min_clean: int = MIN_CLEAN,
                max_jvms: int = MAX_JVMS, gate: float | None = None) -> dict:
    """Contention-proof envelope over ``run_pass() -> suite doc``.

    Runs ``n_jvms`` passes, classifies each clean/contended on its
    before+after canaries, and RETRIES WHOLE PASSES while clean count
    < ``min_clean`` and total passes < ``max_jvms``. Headline = the
    MEDIAN clean pass by suite total (its queries/records_per_sec are
    reported verbatim so `value` == sum(queries) within rounding). If
    the budget exhausts with no clean pass, the least-contended pass
    headlines and the artifact carries ``"contended": true`` — the
    artifact can be captured hot, but never silently.

    ``gate=None`` (the default) self-calibrates: after every pass the
    gate is re-derived from the run's own canary floor (see
    ``effective_gate``), and EVERY pass is re-classified under the
    final gate — an early pass stamped before a quieter floor was
    observed gets honestly re-flagged. Pass a number to pin an absolute
    gate (tests; forensic re-reads of old artifacts).

    Pure orchestration (no Spark, no clock beyond what run_pass does) so
    tests can drive it with synthetic passes — including the pinned
    busy-loop contention-spike test."""
    fixed_gate = gate
    passes: list[dict] = []
    while len(passes) < max_jvms:
        passes.append(run_pass())
        gate = fixed_gate if fixed_gate is not None else effective_gate(passes)
        bw_gate = effective_bw_gate(passes)
        clean = [d for d in passes if pass_is_clean(d, gate, bw_gate)]
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
    gate = fixed_gate if fixed_gate is not None else effective_gate(passes)
    bw_gate = effective_bw_gate(passes)
    clean = [d for d in passes if pass_is_clean(d, gate, bw_gate)]
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
                    "clean": pass_is_clean(d, gate, bw_gate),
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
            "canary_gate_mode": "fixed" if fixed_gate is not None else "self-calibrated",
            "canary_floor_32p_s": run_floor_32p(passes),
            "canary_relative_factor": CANARY_RELATIVE_FACTOR,
            "canary_chronic_32p_s": CANARY_CHRONIC_32P_S,
            "canary_bw_gate_s": bw_gate,
            "canary_bw_floor_s": run_floor_bw(passes),
            "canary_bw_relative_factor": CANARY_BW_RELATIVE_FACTOR,
        }
    )
    if len(clean) < min_clean:
        # VERDICT r13 #2 fallback, recorded IN the artifact: when this
        # host's burst throttling denies the clean-pass quota (the
        # r12/r13/r14 driver captures all hit this), cross-round
        # per-query comparisons should prefer interleaved same-JVM A/B
        # measurements (old and new shapes alternating in one session —
        # robust to weather; methodology + numbers in
        # OPTIMIZATION_r{13,14}.md). All absolute per-pass stamps above
        # are retained so an artifact-tail comparison stays possible.
        out["clean_quota_note"] = (
            "clean-pass quota unmet (burst-throttled host); prefer "
            "interleaved same-JVM A/B for cross-round per-query claims "
            "- see OPTIMIZATION_r14.md methodology; per-pass canary "
            "stamps retained"
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
    if canary_before["canary_32p_s"] > CANARY_CHRONIC_32P_S:
        # clearly-hot capture: give the host one chance to quiet down,
        # keep the honest union of both passes (min() picks the best
        # either way). First-line defense only — the orchestrator's
        # whole-pass relative gate is the real one; this triggers on the
        # absolute chronic ceiling (a per-pass trigger can't know the
        # run floor yet) and just salvages a transiently-hot pass.
        chain_retried = True
        canary_before = cpu_canary()
        runs = runs + _chain_runs(spark, sf_dir)
    all_runs["baker_filter_chain"] = runs
    timings["baker_filter_chain"] = min(runs)
    records_per_sec = int(n_lineitem / min(runs))

    for name in BENCH_QUERIES:
        runs = []
        for _ in range(BENCH_RUN_OVERRIDES.get(name, N_RUNS)):
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
        f"->{doc['canary_after']['canary_32p_s']}\n"
    )
    return doc


def main() -> None:
    if "--single" in sys.argv[1:]:
        print(json.dumps(run_suite()))
        return
    print(json.dumps(orchestrate(_spawn_pass)))


if __name__ == "__main__":
    main()
