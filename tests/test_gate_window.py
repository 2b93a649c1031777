"""Pin the driver's 50-query correctness window (the driver gates the
first 50 catalog entries): every benched query and flagship scale path
must sit inside it, and every name must carry an oracle."""

import bench
from baker_spark.queries import GATE_ORDER, all_oracles, all_queries

# the CURRENT round's flagship scale paths. Rotation is deliberate:
# once a query holds green rows in two consecutive driver artifacts it
# may yield its slot to newer operators (round 7 rotated the round-5
# clustering flagships dp_cosine_pairs_bucketed / dp_dedup_clusters /
# dp_lsh_verified_pairs / dp_decontaminate / dp_sequence_packing out in
# favor of PQ/IVF-PQ, the LSH bucket cap, and the real media decode —
# all still swept at four SFs by test_oracle_parity).
FLAGSHIP_SCALE_PATHS = [
    "dp_kmeans_train",
    "dp_semdedup",
    "dp_pq_codes",
    "dp_pq_adc_topk",
    "dp_ivfpq_topk",
    "dp_minhash_capped",
    "dp_multimodal_decode",
]


def test_gate_is_first_50():
    q = list(all_queries())
    assert len(GATE_ORDER) == 50
    assert q[:50] == GATE_ORDER


def test_benched_queries_inside_gate():
    missing = [n for n in bench.BENCH_QUERIES if n not in GATE_ORDER]
    assert not missing, f"benched queries outside the driver gate: {missing}"


def test_flagship_scale_paths_inside_gate():
    missing = [n for n in FLAGSHIP_SCALE_PATHS if n not in GATE_ORDER]
    assert not missing, f"flagship scale paths outside the driver gate: {missing}"


def test_every_gated_query_has_oracle():
    oracles = all_oracles()
    missing = [n for n in GATE_ORDER if n not in oracles]
    assert not missing, f"gated queries without an oracle: {missing}"
