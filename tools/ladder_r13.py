"""Round-13 sf-ladder extension (VERDICT r12 #3): measure the two
round-12 tiers one decade past their existing SCALING.md cells —
dp_gopher_repetition at sf10 (500k docs; addendum 3 stops at sf1) and
dp_exact_substring_dedup at sf100 (5M docs; addendum 4 stops at sf10).

Same discipline as the addenda this extends: best-of-2, warm page
cache, local[16] (the cell shape every existing row in those tables
used, so exponents fit cell-to-cell without a core-count confound).

    python tools/ladder_r13.py [--cpus 16]

Prints one JSON line per (query, sf) cell as it lands, so a partial run
still yields usable rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = [
    ("dp_gopher_repetition", "testdata/sf10"),
    ("dp_exact_substring_dedup", "testdata/sf100"),
]


def main() -> int:
    cpus = 16
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from baker_spark.queries import all_queries
    from baker_spark.session import get_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("ladder_r13", cpus=cpus)
    queries = all_queries()
    for name, sf_rel in CELLS:
        sf_dir = os.path.join(root, sf_rel)
        if not os.path.isdir(sf_dir):
            print(json.dumps({"query": name, "sf_dir": sf_rel, "skipped": "missing"}))
            continue
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 1))
        print(
            json.dumps(
                {"query": name, "sf_dir": sf_rel, "cpus": cpus,
                 "runs": runs, "best": min(runs)}
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
