"""Pin the driver's 50-query correctness window (the driver gates the
first 50 catalog entries): every benched query and flagship scale path
must hold a hard driver row — a slot in THIS round's window, or green
rows in prior rounds' committed CORRECTNESS artifacts — and every
gated name must carry an oracle."""

import glob
import json
import os

import bench
from baker_spark.queries import GATE_ORDER, all_oracles, all_queries

# the CURRENT round's flagship scale paths. Rotation is deliberate:
# once a query holds green rows in a driver artifact it may yield its
# slot to newer operators. Round 11 rotates the STREAMING surface into
# the gate (never driver-gated before — real Structured Streaming
# replays hash-compared to batch oracles); dp_kmeans_train /
# dp_pq_codes / dp_pq_adc_topk / dp_ivfpq_topk stepped out with green
# r10 rows, their trainers still gated through dp_ann_search and swept
# four-SF by test_oracle_parity.
FLAGSHIP_SCALE_PATHS = [
    "dp_ann_search",        # the facade over brute/lsh/pq/ivfpq
    "dp_bigram_surprisal",
    "dp_dedup_clusters",    # iterative min-label propagation
    "dp_streaming_dedup",           # NEW: watermarked dedup replay
    "dp_streaming_running_counter", # NEW: applyInPandasWithState
    "dp_streaming_sessions",        # NEW: stateful session closure
    "dp_streaming_ingest_ledger",   # NEW: foreachBatch ingest loop
]


def _ever_gated() -> set:
    """Names with a hard row in any committed driver artifact."""
    root = os.path.join(os.path.dirname(__file__), "..")
    out = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            data = json.load(open(f))
        except Exception:
            continue
        out.update(data.get("queries", data).keys() if isinstance(data, dict) else [])
    return out


def test_gate_is_first_50():
    q = list(all_queries())
    assert len(GATE_ORDER) == 50
    assert q[:50] == GATE_ORDER


def test_benched_queries_hold_driver_rows():
    covered = set(GATE_ORDER) | _ever_gated()
    missing = [n for n in bench.BENCH_QUERIES if n not in covered]
    assert not missing, f"benched queries with no driver row ever: {missing}"


def test_flagship_scale_paths_inside_gate():
    missing = [n for n in FLAGSHIP_SCALE_PATHS if n not in GATE_ORDER]
    assert not missing, f"flagship scale paths outside the driver gate: {missing}"


def test_every_gated_query_has_oracle():
    oracles = all_oracles()
    missing = [n for n in GATE_ORDER if n not in oracles]
    assert not missing, f"gated queries without an oracle: {missing}"
