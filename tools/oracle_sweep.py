"""Dry-run of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on DuckDB at a given sf dir, compare
sorted column names + row counts + sorted values.

Usage: python tools/oracle_sweep.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from baker_spark import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    # match the driver's tolerant compare: floats via repr of rounded value
    if isinstance(v, float):
        return round(v, 6)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("oracle-sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    names = [n for n in sorted(qs) if not only or any(f in n for f in only)]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in cols) for r in sdf.collect()
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            ores = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        ocols = sorted(ores.column_names)
        orows = sorted(
            tuple(norm(r[c]) for c in ocols) for r in ores.to_pylist()
        )
        dt = time.time() - t0
        if cols != ocols:
            print(f"FAIL {name}: cols spark={cols} oracle={ocols}")
            failed.append(name)
        elif srows != orows:
            ndiff = sum(1 for a, b in zip(srows, orows) if a != b) + abs(
                len(srows) - len(orows)
            )
            print(
                f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)} diffs={ndiff}"
            )
            for a, b in list(zip(srows, orows))[:3]:
                if a != b:
                    print(f"   spark={a}\n  oracle={b}")
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)} ({dt:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
