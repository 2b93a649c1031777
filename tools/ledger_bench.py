"""Measures the incremental-dedup ledger fix (dedup.write_seen_ledger):
per-BATCH anti-join wall time as the seen-key ledger grows, for

- plain:    ledger read from plain parquet -> both sides shuffle on fp
- bucketed: ledger stored bucketed by fp   -> only the batch shuffles

The batch is HELD CONSTANT while the ledger grows 10x per step, so the
fitted exponent is exactly "how much of the ledger's growth leaks into
every future batch". The ledger build itself is untimed — it is the
amortized index cost, paid once per ingest, not per batch.

Usage: python tools/ledger_bench.py [--sizes 1000000,10000000] [--batch 100000]
Prints one JSON line; the SCALING.md ledger section quotes it.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from baker_spark import get_spark  # noqa: E402
from baker_spark.datapipe import dedup  # noqa: E402

N_RUNS = 3


def synth_keys(spark, n: int, offset: int = 0):
    """n distinct md5 keys — the fp column shape of a real ledger."""
    return spark.range(offset, offset + n).select(
        F.md5(F.col("id").cast("string")).alias("fp"), F.col("id").alias("doc_id")
    )


def time_best(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sizes = [1_000_000, 10_000_000]
    batch_n = 100_000
    for arg in sys.argv[1:]:
        if arg.startswith("--sizes="):
            sizes = [int(x) for x in arg.split("=", 1)[1].split(",")]
        elif arg.startswith("--batch="):
            batch_n = int(arg.split("=", 1)[1])

    spark = get_spark("ledger-bench")
    # the per-batch join must actually join, not broadcast the ledger
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    work = tempfile.mkdtemp(prefix="ledger_bench_")
    key = F.col("fp")  # batch rows already carry their fingerprint

    results: dict[str, dict[str, float]] = {"plain": {}, "bucketed": {}}
    try:
        # fixed batch: half redelivered (keys also in every ledger),
        # half genuinely new — the at-least-once mix
        batch = synth_keys(spark, batch_n // 2, offset=0).unionAll(
            synth_keys(spark, batch_n // 2, offset=1 << 40)
        )
        batch.write.mode("overwrite").parquet(f"{work}/batch")
        batch = spark.read.parquet(f"{work}/batch")

        for n in sizes:
            tag = f"{n:,}"
            # untimed builds (amortized index cost)
            synth_keys(spark, n).select("fp").write.mode("overwrite").parquet(
                f"{work}/plain_{n}"
            )
            dedup.write_seen_ledger(
                synth_keys(spark, n).select("fp"),
                f"ledger_bench_{n}",
                path=f"{work}/bucketed_{n}",
            )

            plain = spark.read.parquet(f"{work}/plain_{n}")
            results["plain"][tag] = time_best(
                lambda: dedup.incremental_dedup_against_keys(batch, plain, key)
                .write.format("noop").mode("overwrite").save()
            )
            results["bucketed"][tag] = time_best(
                lambda: dedup.incremental_dedup_against_ledger(
                    batch, spark, f"ledger_bench_{n}", key
                )
                .write.format("noop").mode("overwrite").save()
            )
            print(
                f"ledger {tag}: plain {results['plain'][tag]:.3f}s  "
                f"bucketed {results['bucketed'][tag]:.3f}s",
                flush=True,
            )

        out = {"batch": batch_n, "sizes": sizes, "runs": N_RUNS, **results}
        if len(sizes) >= 2:
            r = math.log(sizes[-1] / sizes[-2])
            for mode in ("plain", "bucketed"):
                a, b = (results[mode][f"{n:,}"] for n in sizes[-2:])
                out[f"exp_{mode}"] = round(math.log(b / a) / r, 3)
        print(json.dumps(out))
    finally:
        for n in sizes:
            spark.sql(f"DROP TABLE IF EXISTS ledger_bench_{n}")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
