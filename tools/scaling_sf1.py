"""Round-14 sf1 scaling cells (VERDICT r13 #5): the four bench rows
whose 8->32-core ratio read <= 1 at sf0.1 (dp_simhash_pairs,
dp_corpus_pipeline, dp_exact_substring_dedup, dp_minhash_lsh_pairs) are
bound there by the ~0.4-0.5 s per-exchange AQE scheduling floor and the
driver-side build, not by operator serialism. At sf1 (50k docs, 10x the
tokens) executor work dominates and the core-count ratio becomes
meaningful.

    python tools/scaling_sf1.py [--cpus N] [--sf-dir testdata/sf1]

Prints one JSON line per query cell (best-of-3, noop sink, same timing
discipline as bench.py) plus a closing summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = [
    "dp_simhash_pairs",
    "dp_corpus_pipeline",
    "dp_exact_substring_dedup",
    "dp_minhash_lsh_pairs",
]


def main() -> None:
    args = sys.argv[1:]
    cpus = int(args[args.index("--cpus") + 1]) if "--cpus" in args else 32
    # default resolves against the REPO ROOT, not the CWD (the big-SF
    # ladders live in <repo>/testdata, gitignored; /root/testdata holds
    # only the driver's small SFs), and $SPARK_GRAFT_SF_DIR wins like
    # everywhere else
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(repo, "testdata", "sf1")
    )
    sf_dir = args[args.index("--sf-dir") + 1] if "--sf-dir" in args else default_dir
    from baker_spark.session import get_spark
    from baker_spark.queries import all_queries

    spark = get_spark("scaling_sf1", cpus=cpus)
    queries = all_queries()
    out = {}
    for name in ROWS:
        spark.sparkContext.setJobDescription(f"scaling_sf1:{name}")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(times), "runs": times}
        print(json.dumps({"query": name, "cpus": cpus, "sf_dir": sf_dir, **out[name]}), flush=True)
    print(json.dumps({"summary": out, "cpus": cpus, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
