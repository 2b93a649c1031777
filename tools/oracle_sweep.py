"""Dry-run of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on DuckDB at a given sf dir, compare
sorted column names + row counts + sorted values.

Thin CLI over tests/oracle_harness.py — the ONE comparator (type-tagged
normalization, NULL-safe repr sort, Decimal/tz handling) both the pytest
sweep and this tool share, so the tool can't drift into false FAILs the
real gate would pass.

Usage: python tools/oracle_sweep.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import __spark_entry__ as E  # noqa: E402
from baker_spark import get_spark  # noqa: E402
from oracle_harness import compare, duck_connect  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("oracle-sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duck_connect(sf)

    qs, oracles = E.queries(), E.oracle_sql()
    names = [n for n in sorted(qs) if not only or any(f in n for f in only)]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            if name not in oracles:
                print(f"ok?  {name}: rows={sdf.count()} (no oracle)")
                continue
            ok, msg = compare(sdf, con, oracles[name])
        except Exception as e:  # noqa: BLE001
            if "brute-force baseline" in str(e):
                # row_guard trip: the query is a guarded O(n^2) baseline
                # run past its design envelope — failing fast toward the
                # bucketed twin IS the designed at-scale behavior, so a
                # large-SF sweep records it as such, not as a failure
                print(f"SKIP {name}: scale guard tripped (by design at this SF)")
                continue
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if ok:
            print(f"PASS {name}: {msg} ({dt:.1f}s)")
        else:
            print(f"FAIL {name}: {msg}")
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
