"""Unit tests for the clustering / data-selection operators: k-means
training, SemDeDup, DSIR importance weights. Oracle parity for all three
runs in test_oracle_parity.py; these pin the semantic invariants the
hash-compare can't express (empty-cluster retention, duplicate-drop
direction, score monotonicity)."""

import pyspark.sql.functions as F
import pytest

from baker_spark.datapipe.text import dsir_weights
from baker_spark.datapipe.vectors import kmeans_train, semdedup

DIM = 4


def vec(*head):
    v = list(head) + [0.0] * (DIM - len(head))
    return [float(x) for x in v]


def embed_df(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )


def test_kmeans_assigns_every_vector_once(spark):
    df = embed_df(
        spark,
        [(0, vec(0.1)), (1, vec(5.0)), (2, vec(0.12)), (3, vec(5.1)), (4, vec(0.09))],
    )
    out = kmeans_train(df, k=2, iters=2).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 1, 2, 3, 4]
    by_id = {r["vec_id"]: r for r in out}
    # two well-separated blobs must split on the two seeds
    assert by_id[0]["centroid_id"] == by_id[2]["centroid_id"] == by_id[4]["centroid_id"]
    assert by_id[1]["centroid_id"] == by_id[3]["centroid_id"]
    assert all(r["d2"] >= 0 for r in out)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # seeds 0 and 1 are IDENTICAL: every point ties and the cid
    # tie-break sends all members to cluster 0. Cluster 1 must keep its
    # (seed) centroid rather than vanish, and the job must not fail.
    # (Both vectors sit exactly on the seed, so the floor-mean update
    # reproduces the seed exactly and the tie repeats every iteration.)
    df = embed_df(spark, [(0, vec(1.0)), (1, vec(1.0))])
    out = kmeans_train(df, k=2, iters=2).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 1]
    assert {r["centroid_id"] for r in out} == {0}


def test_kmeans_improves_or_holds_total_distortion(spark):
    rows = [(i, vec((i % 3) * 2.0, (i * 7 % 5) * 1.0)) for i in range(30)]
    df = embed_df(spark, rows)
    d0 = kmeans_train(df, k=3, iters=0).agg(F.sum("d2")).collect()[0][0]
    d2 = kmeans_train(df, k=3, iters=2).agg(F.sum("d2")).collect()[0][0]
    assert d2 <= d0  # Lloyd's is monotone in total distortion


def test_semdedup_drops_higher_id_duplicates(spark):
    df = embed_df(
        spark,
        [
            (0, vec(1.0, 0.0)),
            (1, vec(1.0, 0.0)),  # exact dup of 0 -> dropped
            (2, vec(0.0, 1.0)),
            (3, vec(0.0, 1.001)),  # near-dup of 2 -> dropped
            (4, vec(-1.0, 0.4)),
        ],
    )
    kept = semdedup(df, threshold_c4=9900, k=2, iters=1)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 2, 4]


def test_semdedup_keeps_everything_below_threshold(spark):
    df = embed_df(
        spark, [(0, vec(1.0, 0.0)), (1, vec(0.0, 1.0)), (2, vec(-1.0, 0.0))]
    )
    kept = semdedup(df, threshold_c4=9000, k=2, iters=1)
    assert kept.count() == 3


def test_semdedup_cell_cap_bounds_hot_cell(spark, tmp_path):
    """Pathologically clustered embeddings — every vector lands in ONE
    k-means cell — must be hash-split so no kernel group exceeds ~cap,
    and the DuckDB oracle (which applies the identical md5(id)%nsub
    rule) must still hash-match the Spark result."""
    import duckdb

    from baker_spark.datapipe.vectors import duck_semdedup
    from baker_spark.functions.hashing import md5_long
    from tests.oracle_harness import compare

    n, cap = 400, 50
    # two tight blobs along one axis; blob A is 396 vectors (a hot cell)
    rows = [(i, vec(1.0, (i % 7) * 1e-4)) for i in range(n - 4)]
    rows += [(n - 4 + j, vec(-1.0, j * 1e-4)) for j in range(4)]
    df = embed_df(spark, rows)

    kept = semdedup(df, threshold_c4=9999, k=2, iters=1, cell_cap=cap)

    # (a) the split bounds the kernel's group size: reconstruct the
    # grouping key the kernel ran under and assert no group blew past
    # the cap (2x slack for hash-mod binomial spread)
    assign = kmeans_train(df, k=2, iters=1, with_vectors=True)
    counts = assign.groupBy("centroid_id").agg(F.count("*").alias("_n"))
    nsub = F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(cap)).cast("long"))
    grouped = (
        assign.join(F.broadcast(counts), "centroid_id")
        .withColumn("_sub", F.pmod(md5_long(F.col("vec_id").cast("string")), nsub))
        .groupBy("centroid_id", "_sub")
        .count()
    )
    sizes = [r["count"] for r in grouped.collect()]
    assert len(sizes) > 2  # the hot cell actually split
    assert max(sizes) <= 2 * cap

    # (b) oracle parity in the capped regime
    p = str(tmp_path / "emb.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}/*.parquet')")
    ok, msg = compare(
        kept, con, duck_semdedup(threshold_c4=9999, k=2, iters=1, cell_cap=cap)
    )
    con.close()
    assert ok, msg

    # (c) the cap only ever splits a dedup scope, so it can only KEEP
    # more than the uncapped run — and a near-dup pair that the split
    # separates is the documented recall trade
    uncapped = semdedup(df, threshold_c4=9999, k=2, iters=1, cell_cap=None)
    assert kept.count() >= uncapped.count()


def test_kmeans_empty_seed_set_returns_typed_empty(spark):
    """No vector with id < k (snowflake/hash ids): the oracle's seed CTE
    is empty, so the Spark side must return a typed empty assignment
    instead of crashing the numpy kernel on a (0,)-shaped centroid
    matrix."""
    df = spark.createDataFrame(
        [(100 + i, vec(float(i))) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_train(df, k=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "centroid_id", "d2"]
    out_v = kmeans_train(df, k=8, with_vectors=True)
    assert out_v.columns == ["vec_id", "centroid_id", "d2", "q"]


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_target_lookalike_scores_higher(spark):
    # target docs use token 'aa'; one raw doc mimics them, one doesn't
    rows = [(i, "aa aa aa aa", "en") for i in range(8)]
    rows += [(100, "aa aa aa aa", "xx"), (101, "zz zz zz zz", "xx")]
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_weights(
            docs_df(spark, rows), target=F.col("lang") == "en"
        ).collect()
    }
    assert out[100] > out[101]  # target-lookalike outranks non-target text
    assert out[100] == out[0]  # same text, same score — weight ignores the label


def test_dsir_emits_token_counts(spark):
    rows = [(0, "a b c", "en"), (1, "d e", "xx")]
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in dsir_weights(docs_df(spark, rows), target=F.col("lang") == "en").collect()
    }
    assert out == {0: 3, 1: 2}


def test_bigram_surprisal_sees_word_order(spark):
    """Same unigram BAG, different order: the bigram score separates
    what unigram_logprob cannot. A doc following the corpus-dominant
    'a b a b' transition pattern scores near zero; the same tokens
    grouped 'a a a b b b' have rare transitions and score higher."""
    from baker_spark.datapipe.text import bigram_surprisal

    rows = [(i, "a b a b a b", "en") for i in range(8)]
    rows += [(100, "a a a b b b", "en")]
    out = {r["doc_id"]: r for r in bigram_surprisal(docs_df(spark, rows)).collect()}
    assert out[0]["n_bigrams"] == 5
    assert out[100]["n_bigrams"] == 5
    assert out[100]["mean_surprisal_c2"] > out[0]["mean_surprisal_c2"]
    # identical docs score identically, and the mean is the fixed-point
    # floor of sum*100/n
    assert out[0]["mean_surprisal_c2"] == out[7]["mean_surprisal_c2"]
    assert out[0]["mean_surprisal_c2"] == out[0]["sum_surprisal"] * 100 // 5


def test_kn_perplexity_smoothing_branches(spark):
    """Pin every Kneser-Ney branch with hand-computed values. Target
    slice (lang='en'): "a b a b a b" + "a c" -> c12 {(a,b):3, (b,a):2,
    (a,c):1}, T=3 types, c1 {a:4, b:2}, T1 {a:2, b:1}, T2 {b:1, a:1,
    c:1}. The synthetic driver corpus (30-word shared vocab, 41% en)
    almost never produces unseen-w1 bigrams, so the backoff branches
    MUST be pinned here — and pinned cross-engine, since branch parity
    is exactly what the four-SF sweep cannot reach."""
    from baker_spark.datapipe.text import duck_kn_bigram_surprisal, kn_bigram_surprisal

    rows = [(0, "a b a b a b", "en"), (1, "a c", "en")]
    rows += [
        (100, "a b", "xx"),   # seen bigram: M = 4*3-3+((3*2*1) div 3) = 11, surp = lg(16)-lg(11) = 1
        (101, "b c", "xx"),   # seen w1, unseen bigram: M = max((3*1*1) div 3, 1) = 1, surp = lg(8)-lg(1) = 3
        (102, "z a", "xx"),   # unseen w1, seen continuation: surp = lg(2*(3+1)) - lg(1+1) = 3-1 = 2
        (103, "z q", "xx"),   # unseen w1, unseen continuation: surp = lg(8) - lg(0+1) = 3
    ]
    out = {
        r["doc_id"]: r
        for r in kn_bigram_surprisal(
            docs_df(spark, rows), target=F.col("lang") == "en"
        ).collect()
    }
    assert (out[100]["sum_kn_surprisal"], out[100]["n_bigrams"]) == (1, 1)
    assert (out[101]["sum_kn_surprisal"], out[101]["n_bigrams"]) == (3, 1)
    assert (out[102]["sum_kn_surprisal"], out[102]["n_bigrams"]) == (2, 1)
    assert (out[103]["sum_kn_surprisal"], out[103]["n_bigrams"]) == (3, 1)
    # target docs are scored too: doc 0's five transitions all surp 1
    assert (out[0]["sum_kn_surprisal"], out[0]["n_bigrams"]) == (5, 5)
    assert out[0]["mean_kn_surprisal_c2"] == 100
    assert (out[1]["sum_kn_surprisal"], out[1]["n_bigrams"]) == (3, 1)
    # target-like text scores LOW, far-from-target scores HIGH — the
    # CCNet bucketing direction
    assert out[0]["mean_kn_surprisal_c2"] < out[103]["mean_kn_surprisal_c2"]

    # cross-engine branch parity on the SAME fixture: the DuckDB twin
    # must hash-match the Spark result including the backoff rows
    import duckdb
    import pandas as pd

    from tests.oracle_harness import compare

    con = duckdb.connect()
    fixture = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    con.register("_fixture", fixture)
    con.execute("CREATE VIEW documents AS SELECT * FROM _fixture")
    ok, msg = compare(
        kn_bigram_surprisal(docs_df(spark, rows), target=F.col("lang") == "en"),
        con,
        duck_kn_bigram_surprisal("lang = 'en'"),
    )
    assert ok, msg

    # model_cap = 2 prunes (a,c) out of the 3-type model (top-2 by
    # count): "a b" now scores against c1(a)=3 -> M=10 vs 4*c1=12 ->
    # surp 0 (vs 1 unpruned), and "a c" takes the unseen-bigram branch
    # with T2(c)=0. The pruned model must also hash-match ITS twin.
    capped = {
        r["doc_id"]: r
        for r in kn_bigram_surprisal(
            docs_df(spark, rows), target=F.col("lang") == "en", model_cap=2
        ).collect()
    }
    assert (capped[100]["sum_kn_surprisal"], capped[100]["n_bigrams"]) == (0, 1)
    assert (capped[1]["sum_kn_surprisal"], capped[1]["n_bigrams"]) == (3, 1)
    ok, msg = compare(
        kn_bigram_surprisal(
            docs_df(spark, rows), target=F.col("lang") == "en", model_cap=2
        ),
        con,
        duck_kn_bigram_surprisal("lang = 'en'", model_cap=2),
    )
    assert ok, msg


@pytest.mark.parametrize(
    "name, forbidden",
    [
        ("dp_kmeans_train", ["SortMergeJoin", "CartesianProduct", "Window", "BroadcastHashJoin"]),
        ("dp_semdedup", ["CartesianProduct", "BroadcastNestedLoopJoin", "Window"]),
        ("dp_dsir_weights", ["CartesianProduct", "Window", "SortMergeJoin"]),
        # bigram join may hash- or broadcast-join at tiny SF (AQE's
        # call); it must never cartesian or sort a window
        ("dp_bigram_surprisal", ["CartesianProduct", "Window", "BroadcastNestedLoopJoin"]),
        # the 1-row type-total frame crossJoins as a broadcast NL join
        # (constant-size build side — the sanctioned scalar pattern), so
        # only cartesian and window stages are forbidden
        ("dp_kn_perplexity", ["CartesianProduct", "Window"]),
    ],
)
def test_cluster_query_plan_shapes(spark, name, forbidden):
    """dp_kmeans_train's returned assignment is a narrow map over the
    persisted quantized corpus (literal centroids — no join of any
    kind); semdedup's pair search stays inside applyInPandas cells;
    dsir's score table must broadcast, never sort-merge."""
    import contextlib
    import io

    from baker_spark.queries import all_queries
    from tests.conftest import SF_DIR

    df = all_queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    for op in forbidden:
        assert op not in p, f"{name}: {op} in plan"
    if name == "dp_dsir_weights":
        assert "BroadcastHashJoin" in p


def test_decontaminate_strategies_agree_and_shuffle_never_broadcasts(spark):
    """Both probe strategies must return identical rows; the shuffle
    strategy must keep the benchmark shingles OUT of any broadcast
    (that's its whole point — eval unions too large to replicate per
    executor) and build a shuffled hash join instead."""
    import contextlib
    import io

    import pytest

    from baker_spark.datapipe import dedup
    from baker_spark.queries import all_queries
    from tests.conftest import SF_DIR

    a = all_queries()["dp_decontaminate"](spark, SF_DIR)
    b = all_queries()["dp_decontaminate_shuffle"](spark, SF_DIR)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        b.explain("formatted")
    p = buf.getvalue()
    # the SHINGLE probe (the only Inner join) is shuffled; a broadcast
    # may appear only as the tiny per-doc hits aggregate feeding the
    # final LeftOuter
    assert "ShuffledHashJoin Inner" in p
    assert "BroadcastHashJoin Inner" not in p

    with pytest.raises(ValueError, match="strategy"):
        dedup.decontaminate(a, a, strategy="bloom")


def test_pq_codes_shape_and_range(spark):
    from baker_spark.datapipe.vectors import PQ_KSUB, pq_train_encode

    df = embed_df(spark, [(i, vec(float(i % 5), float(i % 3))) for i in range(40)])
    codes, cents = pq_train_encode(df, m=2, ksub=4, iters=1, dim=DIM)
    rows = codes.collect()
    assert len(rows) == 40 * 2  # one code per (vector, subspace)
    assert {r["sub"] for r in rows} == {0, 1}
    assert all(0 <= r["cid"] < 4 for r in rows)
    # codebook: m*ksub centroids of dim/m ints
    assert set(cents) == {(s, c) for s in (0, 1) for c in range(4)}
    assert all(len(v) == DIM // 2 for v in cents.values())


def test_pq_adc_exact_duplicate_ranks_first(spark):
    from baker_spark.datapipe.vectors import pq_adc_topk

    # vector 7 duplicates vector 0 exactly; ADC distance to the query's
    # own code cells is minimal for both, so they rank 1-2 (id tiebreak)
    rows = [(i, vec(1.0 + i, 2.0)) for i in range(7)] + [(7, vec(1.0, 2.0))]
    rows[0] = (0, vec(1.0, 2.0))
    df = embed_df(spark, rows)
    got = pq_adc_topk(df, query_id=0, k=2, m=2, ksub=4, iters=1, dim=DIM).collect()
    assert [r["vec_id"] for r in got] == [0, 7]
    assert got[0]["d2_adc"] == got[1]["d2_adc"]


def test_pq_empty_seed_set_returns_typed_empty(spark):
    from baker_spark.datapipe.vectors import pq_adc_topk, pq_train_encode

    df = spark.createDataFrame(
        [(100 + i, vec(float(i))) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    codes, cents = pq_train_encode(df, m=2, ksub=4, iters=1, dim=DIM)
    assert codes.count() == 0 and cents == {}
    assert pq_adc_topk(df, query_id=100, m=2, ksub=4, dim=DIM).count() == 0


def test_lsh_bucket_cap_drops_mega_bucket_keeps_rest(spark):
    from baker_spark.datapipe import dedup

    boiler = "the same boilerplate text repeated in every mirror page of the site"
    near_a = "a genuinely unique document about spark query planning and shuffles"
    near_b = "a genuinely unique document about spark query planning and exchanges"
    rows = [(i, boiler) for i in range(10)]          # one mega-bucket
    rows += [(100, near_a), (101, near_b)]           # a real near-dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_pairs(df).collect()}
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_pairs(df, bucket_cap=5).collect()
    }
    assert (100, 101) in uncapped and (100, 101) in capped  # survivor
    assert any(a < 10 and b < 10 for a, b in uncapped)      # mega-pairs existed
    assert not any(a < 10 and b < 10 for a, b in capped)    # and are dropped
    assert capped <= uncapped                               # cap only removes


def test_group_enumerate_matches_self_join_when_cap_binds_nothing(spark):
    """The capped emitters use group-and-enumerate while the exhaustive
    twins keep the band self-join — two independent implementations of
    the same pair semantics. With a cap no bucket reaches, they must
    produce identical pair sets (and identical hammings for simhash):
    a disagreement means one shape's enumeration, dedup, or ordering
    logic drifted."""
    import random

    from baker_spark.datapipe import dedup

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30))))
        for i in range(60)
    ]
    # guarantee pairs in both emitters: exact clones and one-word edits
    # of a subset (random short docs alone rarely share an intact band)
    rows += [(100 + i, rows[i][1]) for i in range(10)]
    rows += [(200 + i, rows[i][1] + " tail") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    lsh_cap = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_pairs(df, bucket_cap=10_000).collect()}
    lsh_unc = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_pairs(df, bucket_cap=None).collect()}
    assert lsh_cap == lsh_unc and lsh_cap  # non-trivial corpus: pairs exist

    sim_cap = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs(df, band_cap=10_000).collect()
    }
    sim_unc = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs(df, band_cap=None).collect()
    }
    assert sim_cap == sim_unc and sim_cap


def test_ivfpq_probes_near_cells_and_ranks_duplicate_first(spark):
    from baker_spark.datapipe.vectors import ivfpq_topk

    # two far blobs; seeds 0 (blob A) and 1 (blob B) become the coarse
    # cells. Query 0's duplicate (id 7) lives in the probed cell A and
    # must rank alongside the query; with nprobe=1 blob B's members are
    # never scored at all.
    rows = [(0, vec(10.0, 0.0)), (1, vec(-10.0, 0.0))]
    rows += [(i, vec(10.0 + 0.1 * i, 0.2)) for i in range(2, 7)]   # cell A
    rows += [(7, vec(10.0, 0.0))]                                  # dup of 0
    rows += [(i, vec(-10.0 - 0.1 * i, 0.2)) for i in range(8, 12)]  # cell B
    df = embed_df(spark, rows)
    got = ivfpq_topk(
        df, query_id=0, k=12, kc=2, nprobe=1, m=2, ksub=2, iters=1, dim=DIM
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert set(ids) <= {0, 2, 3, 4, 5, 6, 7}  # only probed-cell members
    assert ids[0] in (0, 7) and got[0]["d2_adc"] == got[1]["d2_adc"]
    assert 1 not in ids and 8 not in ids  # unprobed cell never scored


def test_ivfpq_search_filters_by_centroid_id_without_assignment_join(spark):
    """Scale-safety contract of the IVF-PQ index: ivfpq_encode carries
    centroid_id INTO the codes table (one id-co-partitioned join at
    index-build time), so query-time probing is a literal isin() filter
    — the plan must contain no semi-join against a candidate-id set
    (the old shape broadcast ~nprobe/kc of the corpus per query: an
    executor OOM at 10^9 vectors)."""
    import contextlib
    import io

    from baker_spark.datapipe.vectors import ivfpq_encode, ivfpq_topk

    rows = [(i, vec(10.0 + i, 0.5 * i)) for i in range(12)]
    df = embed_df(spark, rows)
    codes, coarse, cb = ivfpq_encode(df, kc=2, m=2, ksub=2, iters=1, dim=DIM)
    assert set(codes.columns) == {"vec_id", "centroid_id", "sub", "cid"}
    # every vector appears with its cell in the index, m rows each
    assert codes.count() == 12 * 2
    assert codes.select("centroid_id").distinct().count() == 2

    res = ivfpq_topk(df, query_id=0, k=5, kc=2, nprobe=1, m=2, ksub=2, iters=1, dim=DIM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    # no semi-join anywhere: probing is a pushed-down centroid_id filter
    assert "LeftSemi" not in plan and "left_semi" not in plan
    # Catalyst pushes the probe predicate through the encode join into
    # the assignment branch (nprobe=1 -> an equality on the cell id), so
    # only the probed cell's rows ever reach the join — over a persisted
    # index partitioned by centroid_id this same predicate becomes
    # partition pruning
    import re

    assert re.search(r"Condition : .*cid#\d+L = 0\)", plan)


def test_simhash_band_cap_drops_mega_band_keeps_rest(spark):
    """simhash's band_cap mirrors lsh_pairs' bucket_cap: identical docs
    form a mega-(band,key) group whose |group|^2/2 pairs are dropped,
    while a genuine near-dup pair in small bands survives — and the
    capped path's distinct-dedup keeps a pair even when one of its
    matching bands was hot."""
    from baker_spark.datapipe import dedup

    boiler = "the same boilerplate text repeated in every mirror page of the site"
    # 40 shared words + 1 swap -> hamming(simhash) == 3 (measured): a
    # genuine near-dup pair inside the banding guarantee
    base = " ".join(f"word{i}" for i in range(40))
    near_a = base + " shuffles"
    near_b = base + " exchanges"
    rows = [(i, boiler) for i in range(10)]          # one mega-band per band
    rows += [(100, near_a), (101, near_b)]           # a real near-dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r["doc_a"], r["doc_b"]) for r in dedup.simhash_pairs(df).collect()}
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_pairs(df, band_cap=5).collect()
    }
    assert (100, 101) in uncapped and (100, 101) in capped  # survivor
    assert any(a < 10 and b < 10 for a, b in uncapped)      # mega-pairs existed
    assert not any(a < 10 and b < 10 for a, b in capped)    # and are dropped
    assert capped <= uncapped                               # cap only removes
    # each surviving pair appears exactly once despite multi-band matches
    rows_capped = dedup.simhash_pairs(df, band_cap=5).collect()
    assert len(rows_capped) == len({(r["doc_a"], r["doc_b"]) for r in rows_capped})


def test_ann_topk_zero_norm_scores_zero_in_both_engines(spark, tmp_path):
    """A zero-norm vector (all-zero embedding, or one that quantizes to
    zero) has undefined cosine, and the raw expression diverges: Spark
    ansi=off division by zero -> NULL (sorts last), DuckDB 0/0 -> NaN
    (sorts first, then crashes the BIGINT cast). Both engines must pin
    the score to 0 — the same rule the int64 pair kernels apply."""
    import duckdb

    from baker_spark.datapipe.vectors import ann_topk, duck_ann_topk

    rows = [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0] * 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cosine_c4"]
        for r in ann_topk(df, query_id=0, k=3, max_rows=None).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}  # zero-norm query: every score pinned

    pq = str(tmp_path / "emb")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    oracle = {k: v for k, v in con.execute(duck_ann_topk(k=3)).fetchall()}
    assert oracle == got


def test_ann_search_facade_uniform_schema_and_dispatch(spark):
    """ann_search normalizes every method into (id, rank, score, method)
    with rank the cross-method contract; 'auto' picks brute under the
    threshold and MULTI-PROBE lsh over it (the measured-better-recall
    train-free default), and never trains pq/ivfpq implicitly."""
    import pytest

    from baker_spark.datapipe import vectors

    rng_rows = [
        (i, [float(((i * 37 + j * 11) % 19) - 9) for j in range(vectors.EMBED_DIM)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")

    cols = ["vec_id", "rank", "score", "method"]
    for method in vectors.ANN_METHODS:
        out = vectors.ann_search(df, query_id=0, k=3, method=method)
        assert out.columns == cols, method
        rows = out.collect()
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1)), method
        assert all(r["method"] == method for r in rows)
        # rank 1 is the query itself for the exact-cosine methods
        # (self-similarity; ivf always probes the query's own cell)
        if method in ("brute", "lsh", "lsh_mp", "ivf"):
            assert rows[0]["vec_id"] == 0

    # auto: count(40) <= threshold -> brute; over threshold -> lsh_mp
    # (multi-probe, never the measured-low-recall single-probe default)
    assert vectors.ann_search(df, k=2, method="auto").collect()[0]["method"] == "brute"
    got = vectors.ann_search(df, k=2, method="auto", auto_brute_max=10)
    assert got.collect()[0]["method"] == "lsh_mp"
    # corpus_rows hint skips the count job and drives the same policy
    got = vectors.ann_search(df, k=2, method="auto", corpus_rows=10**9)
    assert got.collect()[0]["method"] == "lsh_mp"

    with pytest.raises(ValueError, match="unknown ann method"):
        vectors.ann_search(df, method="hnsw")


def test_ann_multiprobe_candidates_superset_of_single_probe(spark):
    """lsh_mp's probe set includes mask 0 (the query's own bucket), so
    its candidate set — and therefore recall at any k — dominates
    single-probe lsh structurally, not just on one measurement. hamming
    beyond 1 is not implemented and must say so."""
    import pytest

    from baker_spark.datapipe import vectors

    rows = [
        (i, [float(((i * 53 + j * 29) % 23) - 11) for j in range(vectors.EMBED_DIM)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for qid in (0, 7):
        sp = {r["vec_id"] for r in vectors.ann_topk_bucketed(df, qid, k=1000).collect()}
        mp = {
            r["vec_id"]
            for r in vectors.ann_topk_bucketed(df, qid, k=1000, hamming=1).collect()
        }
        assert sp <= mp
        assert len(mp) > len(sp)  # neighbor buckets contributed candidates
    with pytest.raises(ValueError, match="hamming"):
        vectors.ann_topk_bucketed(df, 0, hamming=2)


def test_ngram_jaccard_candidate_guard_trips_loud_and_default_passes(spark):
    """The exact prefix-filter operator must refuse a quadratic-output
    corpus BEFORE launching the self-join (SCALING.md round 11: the
    30-word-vocab corpus at 500k docs estimates 2.18B candidates and a
    run did not finish in 50 minutes), and the error must name the
    banded prune->verify twin. A budget no real corpus trips leaves the
    result identical to the unguarded shape."""
    import pytest as _pytest

    from baker_spark.datapipe import dedup

    # every doc shares the same 6 words -> every prefix shingle is hot
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(12)]
    rows += [(100, "one unique doc about spark exchanges and shuffles here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with _pytest.raises(RuntimeError, match="lsh_verified_pairs"):
        dedup.ngram_jaccard_pairs(df, max_candidates=10).count()

    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(df, max_candidates=10**6).collect()
    }
    unguarded = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(df, max_candidates=None).collect()
    }
    assert guarded == unguarded and len(guarded) == 66  # C(12,2) exact dups


def test_incremental_neardup_semantics(spark):
    """Cross-corpus drop (exact redelivery AND band-colliding variants),
    in-batch greedy-by-id keep-first, fresh docs kept, sub-shingle docs
    excluded from the decision (documented convention)."""
    from baker_spark.datapipe import dedup

    page = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from a warm stone wall near the old garden gate"
    )
    other = (
        "completely different content about spark exchanges adaptive "
        "execution and the economics of shuffle partitions at scale"
    )
    fresh = (
        "a third unrelated document discussing parquet row groups "
        "predicate pushdown and column pruning for large table scans"
    )
    pair = (
        "yet another topic entirely namely bucketed ledgers writer "
        "fences crash safe compaction plus idempotent replay contracts"
    )
    seen = spark.createDataFrame([(1, page), (2, other)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (10, page),     # exact redelivery of doc 1 -> drop
            (11, other),    # redelivery of doc 2 -> drop
            (12, fresh),    # fresh -> keep
            (13, pair),     # near-dup group with 14 (disjoint from 12)
            (14, pair),     # identical to 13 -> greedy keeps 13
            (15, "too short"),       # < 3 words of shingles -> excluded
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.incremental_neardup(batch, seen).collect())
    assert kept == [12, 13]  # redeliveries, 14 (greedy), and 15 all absent


def test_chunks_null_text_and_no_contained_final_window(spark):
    """Two review catches in one: NULL text must chunk to NULL (not the
    TWO phantom empty chunks size(NULL)=-1 + descending sequence(0,-1)
    produced), and the final window must never be fully contained in
    the previous one (floor((n-1)/step)+1 emitted a strict-suffix
    duplicate sample whenever the tail was shorter than the overlap)."""
    from baker_spark.datapipe import text as T

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(56))), (2, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["c"] for r in df.select("doc_id", T.chunks("text").alias("c")).collect()}
    assert rows[2] is None
    got = rows[1]
    # 56 words at 32/24: exactly 2 chunks ([1..32], [25..56]); the old
    # formula emitted a third = words[49..56], a suffix of chunk 2
    assert len(got) == 2
    assert got[0].split() == [f"w{i}" for i in range(32)]
    assert got[1].split() == [f"w{i}" for i in range(24, 56)]
    # DuckDB twin agrees cell-for-cell
    import duckdb

    con = duckdb.connect()
    duck = con.sql(
        f"SELECT {T.duck_chunks('t')} AS c FROM (VALUES ('{ ' '.join(f'w{i}' for i in range(56)) }')) v(t)"
    ).fetchone()[0]
    assert duck == got


def test_scrub_arrow_survives_all_null_batch(spark):
    """An Arrow batch whose every text is NULL must behave like the JVM
    engine (NULL counts/clean_text), not kill the job: unpinned,
    pa.Array.from_pandas infers a NullArray and count_substring_regex
    has no kernel for it (ArrowNotImplementedError)."""
    from baker_spark.datapipe import text as T

    df = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    out = df.select(T.scrub_arrow("text").alias("s")).select("s.clean_text").collect()
    assert [r["clean_text"] for r in out] == [None, None]


def test_lsh_bands_rejects_indivisible_k(spark):
    from baker_spark.datapipe import dedup

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        dedup.lsh_bands(df, k=16, bands=5)


def test_pq_rejects_indivisible_dim(spark):
    from baker_spark.datapipe import vectors as V

    df = spark.createDataFrame(
        [(1, [0.1] * 60)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="divisible"):
        V.pq_train_encode(df, m=8, dim=60)


def test_band_cap_saturation_dense_vs_sparse(spark):
    """VERDICT r11 watch-point #1 pinned: at saturation density every
    pair-capable (band,key) group exceeds the cap, banded_hamming_pairs
    correctly emits ZERO pairs, and the saturation report must read
    ~1.0 (capped_frac_c6 == 1000000) so the zero-pair result is
    distinguishable from "no near-dups". At normal density it reads 0."""
    from baker_spark.datapipe import dedup

    # dense regime: one signature shared by many docs -> every band
    # group holds all of them, far over cap
    dense = spark.createDataFrame(
        [(i, 0x0123456789ABCD) for i in range(12)], "doc_id long, sig long"
    )
    pairs, sat_df = dedup.banded_hamming_pairs_with_metrics(
        dense, "sig", band_cap=5
    )
    assert pairs.count() == 0  # the documented sf100-dense outcome
    sat = sat_df.collect()[0]
    assert sat["n_groups"] == 4 and sat["n_pair_groups"] == 4
    assert sat["n_capped_groups"] == 4 and sat["capped_frac_c6"] == 1_000_000

    # sparse regime: distinct signatures (keys spread across ALL four
    # bands — a low-entropy fixture quietly saturates the high bands)
    # + one genuine near-dup pair -> nothing capped, pairs flow,
    # saturation reads 0
    mask = (1 << 60) - 1
    rows = [(i, (i * 0x9E3779B97F4A7C15) & mask) for i in range(1, 11)]
    rows += [(100, 7), (101, 5)]
    sparse = spark.createDataFrame(rows, "doc_id long, sig long")
    pairs2, sat2_df = dedup.banded_hamming_pairs_with_metrics(
        sparse, "sig", band_cap=5
    )
    assert {(r["doc_a"], r["doc_b"]) for r in pairs2.collect()} >= {(100, 101)}
    sat2 = sat2_df.collect()[0]
    assert sat2["n_capped_groups"] == 0 and sat2["capped_frac_c6"] == 0
    assert sat2["n_pair_groups"] >= 1  # the near-dup group is visible
