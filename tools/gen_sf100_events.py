"""sf100 events (100M rows, ~3 GB parquet) for the analytics-family
scaling decade: q_session_windows / q_asof_join / q_range_join /
q_grouping_sets / q_window_funcs all read ONLY events.

Chunked like gen_sf100_headliners.py (sf10-sized pieces into an
``events.parquet`` DIRECTORY — spark.read.parquet reads it like the
driver's single-file layout) so peak memory stays ~1/10th of a
monolithic build. Same value domains as tools/gen_testdata.py; the one
structural difference is timestamp assignment: the single-shot
generator normalizes ONE exponential-gap cumsum over the 30-day window,
which needs the global gap sum — here each chunk owns a contiguous
1/n_chunks slice of the window and normalizes its own gaps inside it.
Density and ordering match; per-chunk seeds are deterministic.

    python tools/gen_sf100_events.py [out_dir] [n_chunks]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 128 * 1024
SF = 100.0
N_EV_TOTAL = int(1_000_000 * SF)
N_USER = int(15_000 * SF)
WINDOW_DAYS = 29.9986
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _us(days: np.ndarray, epoch: str) -> pa.Array:
    base = np.datetime64(epoch).astype("datetime64[us]").astype(np.int64)
    return pa.array(
        base + (days * 86_400_000_000).astype(np.int64), type=pa.timestamp("us")
    )


def gen_chunk(out_dir: str, chunk: int, n_chunks: int) -> int:
    rng = np.random.default_rng(int(4242 + SF * 1000) + chunk)
    lo = chunk * (N_EV_TOTAL // n_chunks)
    hi = (chunk + 1) * (N_EV_TOTAL // n_chunks) if chunk < n_chunks - 1 else N_EV_TOTAL
    n_ev = hi - lo
    gaps = rng.exponential(1.0, n_ev)
    day0 = WINDOW_DAYS * chunk / n_chunks
    ts_days = day0 + np.cumsum(gaps) / np.sum(gaps) * (WINDOW_DAYS / n_chunks)
    table = pa.table(
        {
            "event_id": np.arange(lo, hi, dtype=np.int64),
            "ts": _us(ts_days, "2024-01-01"),
            "user_id": rng.integers(0, N_USER, n_ev),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
        }
    )
    pq.write_table(
        table,
        os.path.join(out_dir, "events.parquet", f"part-{chunk:03d}.parquet"),
        row_group_size=ROW_GROUP,
    )
    return n_ev


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf100"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(os.path.join(out_dir, "events.parquet"), exist_ok=True)
    total = 0
    for c in range(n_chunks):
        total += gen_chunk(out_dir, c, n_chunks)
        print(f"chunk {c + 1}/{n_chunks} done ({total} rows)", file=sys.stderr)
    print(f"wrote {total} events to {out_dir}/events.parquet/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
