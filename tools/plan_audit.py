"""Catalog-wide physical-plan audit: explain every queries() entry and
flag scale anti-patterns before they cost anything at 100 TB.

Usage: python tools/plan_audit.py [sf_dir]

Flags:
- CARTESIAN: CartesianProduct anywhere (never acceptable)
- SMJ: SortMergeJoin (fine for fact-fact; suspicious when a side is tiny)
- EXCH>N: more than N shuffle exchanges (broadcast exchanges excluded)
- PYUDF: row-wise Python UDF in the plan (BatchEvalPython); Arrow-batched
  pandas UDFs (ArrowEvalPython) are reported separately and are fine
  where semantics require Python
- WINDOW1P: an UNPARTITIONED Window whose input is NOT bounded by a
  limit below it — the "No Partition Defined for Window" runtime
  warning made structural. A global window over a corpus moves
  everything to one partition (scale killer); a global window over an
  already top-k-limited frame (<= k rows) is the minimal rank-assign
  operator and is certified fine here (VERDICT r12 #6)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from baker_spark import get_spark  # noqa: E402

MAX_EXCHANGES = 12


def _n_nodes(plan: str, op: str) -> int:
    """Count DISTINCT physical operators named ``op``: the formatted
    tree re-prints a .persist()'d branch under every consumer, but each
    operator gets one numbered '(NN) Op' header — counting unique ids
    matches what actually executes."""
    return len(set(re.findall(rf"^\((\d+)\) {op}\b", plan, re.M)))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_unbounded_global_windows(df) -> int:
    """Count WindowExec nodes with an EMPTY partition spec whose
    subtree contains no limit operator — the structural version of
    Spark's "No Partition Defined for Window" log warning, minus the
    false positives: a global window directly over a
    TakeOrderedAndProject/Limit input ranks <= k rows (the ann_search
    facade's rank-assign), which is bounded by construction and the
    correct minimal plan. Walks the executed SparkPlan via py4j."""
    node = df._jdf.queryExecution().executedPlan()

    def has_limit_below(n) -> bool:
        name = n.getClass().getSimpleName()
        if name in (
            "TakeOrderedAndProjectExec",
            "GlobalLimitExec",
            "LocalLimitExec",
            "CollectLimitExec",
        ):
            return True
        ch = n.children()
        return any(has_limit_below(ch.apply(i)) for i in range(ch.size()))

    def walk(n) -> int:
        bad = 0
        name = n.getClass().getSimpleName()
        if name == "WindowExec" and n.partitionSpec().isEmpty():
            if not has_limit_below(n):
                bad += 1
        ch = n.children()
        for i in range(ch.size()):
            bad += walk(ch.apply(i))
        # AQE wraps stages; descend into materialized subtrees
        if name == "AdaptiveSparkPlanExec":
            bad += walk(n.initialPlan())
        return bad

    return walk(node)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # hard-fail on a bad data dir: the audit silently "mostly working"
    # through per-query AnalysisExceptions made results depend on the
    # caller's cwd — a reproducibility trap, not a graceful fallback
    sf = os.path.abspath(sf)
    expected = ("lineitem", "documents", "embeddings")
    missing = [
        t for t in expected
        if not os.path.exists(os.path.join(sf, f"{t}.parquet"))
    ]
    if not os.path.isdir(sf) or missing:
        raise SystemExit(
            f"plan_audit: sf_dir {sf!r} is not a testdata directory "
            f"(missing: {missing if missing else 'the directory itself'}); "
            "pass an absolute path like /root/testdata/sf0.01"
        )
    spark = get_spark("plan-audit", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = E.queries()
    bad = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf)
            p = plan_of(df)
        except Exception as e:  # noqa: BLE001 — iterative queries run jobs at build time
            print(f"{name:28s} (not statically plannable: {type(e).__name__})")
            continue
        flags = []
        if "CartesianProduct" in p:
            flags.append("CARTESIAN")
        if "SortMergeJoin" in p:
            flags.append("SMJ")
        n_exch = _n_nodes(p, "Exchange")
        n_bhj = _n_nodes(p, "BroadcastHashJoin")
        if n_exch > MAX_EXCHANGES:
            flags.append(f"EXCH>{MAX_EXCHANGES}({n_exch})")
        if "BatchEvalPython" in p:
            flags.append("PYUDF")
        n_gw = n_unbounded_global_windows(df)
        if n_gw:
            flags.append(f"WINDOW1P({n_gw})")
        arrow = " arrow-udf" if "ArrowEvalPython" in p or "MapInPandas" in p else ""
        status = "FLAG " + ",".join(flags) if flags else "ok"
        if flags:
            bad += 1
        print(f"{name:28s} {status}  exchanges={n_exch} bhj={n_bhj}{arrow}")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
