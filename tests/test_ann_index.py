"""Persistent ANN index lifecycle (datapipe/ann_index.py): build once,
search many — the searched result must be bit-identical to the inline
train+search call, the probe must be partition pruning over the stored
codes, and rebuild=False must reuse a matching index without touching
the corpus."""

import contextlib
import io
import os

import pytest

from baker_spark.datapipe import ann_index, vectors
from baker_spark.sources.tables import load_table
from tests.conftest import SF_DIR, rows_to_tuples

KC, NPROBE, K = 8, 2, 10


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def ivfpq_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "ivfpq")
    ann_index.ann_index_build(emb, path, method="ivfpq", kc=KC, iters=1, key="t1")
    return path


def _qvec(emb, query_id=0):
    return emb.filter(emb.vec_id == query_id).select(
        vectors.as_double("embedding").alias("qv")
    ).first()["qv"]


def _explain(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ivfpq_index_search_matches_inline(spark, emb, ivfpq_path):
    inline = vectors.ivfpq_topk(emb, query_id=0, k=K, kc=KC, nprobe=NPROBE, iters=1)
    out, score_col, asc = ann_index.ann_index_search(
        spark, ivfpq_path, _qvec(emb), k=K, nprobe=NPROBE
    )
    assert (score_col, asc) == ("d2_adc", True)
    assert rows_to_tuples(out) == rows_to_tuples(inline)


def test_ivf_index_search_matches_inline(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    ann_index.ann_index_build(emb, path, method="ivf", kc=KC, iters=1)
    inline = vectors.ivf_topk(emb, query_id=3, k=K, kc=KC, nprobe=NPROBE, iters=1)
    out, score_col, asc = ann_index.ann_index_search(
        spark, path, _qvec(emb, 3), k=K, nprobe=NPROBE
    )
    assert (score_col, asc) == ("cosine_c4", False)
    assert rows_to_tuples(out) == rows_to_tuples(inline)


def test_pq_index_search_matches_inline(spark, emb, tmp_path):
    path = str(tmp_path / "pq")
    ann_index.ann_index_build(emb, path, method="pq", iters=1)
    inline = vectors.pq_adc_topk(emb, query_id=7, k=K, iters=1)
    out, _, _ = ann_index.ann_index_search(spark, path, _qvec(emb, 7), k=K)
    assert rows_to_tuples(out) == rows_to_tuples(inline)


def test_search_scan_partition_prunes(spark, emb, ivfpq_path):
    """The 100 TB contract: the probe filter is a PARTITION filter on the
    codes scan (only nprobe/kc of the files are planned), and the search
    plan never references the source corpus — no training job rides
    along."""
    out, _, _ = ann_index.ann_index_search(spark, ivfpq_path, _qvec(emb), k=K, nprobe=NPROBE)
    p = _explain(out)
    assert "PartitionFilters: [centroid_id" in p
    assert "embeddings.parquet" not in p  # corpus untouched at search time
    # disk layout really is one directory per cell
    cells = [d for d in os.listdir(f"{ivfpq_path}/codes") if d.startswith("centroid_id=")]
    assert len(cells) > 1


def test_rebuild_false_reuses_matching_index(emb, ivfpq_path):
    codes_dir = f"{ivfpq_path}/codes"
    before = {f: os.path.getmtime(os.path.join(codes_dir, f)) for f in os.listdir(codes_dir)}
    meta = ann_index.ann_index_build(
        emb, ivfpq_path, method="ivfpq", kc=KC, iters=1, key="t1", rebuild=False
    )
    assert meta.get("reused") is True
    after = {f: os.path.getmtime(os.path.join(codes_dir, f)) for f in os.listdir(codes_dir)}
    assert before == after  # nothing rewritten
    # a different build key must NOT be reused
    meta2 = ann_index.ann_index_build(
        emb, ivfpq_path, method="ivfpq", kc=KC, iters=1, key="t2", rebuild=False
    )
    assert "reused" not in meta2


def test_facade_uniform_shape_and_no_training(spark, emb, ivfpq_path):
    out = vectors.ann_search(emb, query_id=0, k=K, index=ivfpq_path, nprobe=NPROBE)
    assert out.columns == ["vec_id", "rank", "score", "method"]
    rows = out.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert {r["method"] for r in rows} == {"ivfpq"}
    # equals the inline-trained facade-shaped result
    inline = vectors.ivfpq_topk(emb, query_id=0, k=K, kc=KC, nprobe=NPROBE, iters=1)
    assert [(r["vec_id"], r["score"]) for r in rows] == [
        (r["vec_id"], r["d2_adc"]) for r in inline.collect()
    ]


def test_facade_missing_query_id_returns_typed_empty(emb, ivfpq_path):
    out = vectors.ann_search(emb, query_id=-999, index=ivfpq_path)
    assert out.columns == ["vec_id", "rank", "score", "method"]
    assert out.collect() == []


def test_facade_rejects_conflicting_args(emb, ivfpq_path):
    with pytest.raises(ValueError, match="index's own method"):
        vectors.ann_search(emb, index=ivfpq_path, method="lsh")
    with pytest.raises(TypeError, match="unexpected kwargs"):
        vectors.ann_search(emb, index=ivfpq_path, kc=4)


def test_dim_mismatch_raises(spark, ivfpq_path):
    with pytest.raises(ValueError, match="dim"):
        ann_index.ann_index_search(spark, ivfpq_path, [0.1, 0.2, 0.3])


def test_unknown_method_raises(emb, tmp_path):
    with pytest.raises(ValueError, match="unknown index method"):
        ann_index.ann_index_build(emb, str(tmp_path / "x"), method="hnsw")


def test_lsh_index_search_matches_inline_multiprobe(spark, emb, tmp_path):
    """The train-free lsh index: bucket-partitioned corpus, search =
    partition pruning over [qbucket + Hamming-1 neighbors], bit-identical
    to ann_topk_bucketed(hamming=1) which re-hashes the corpus per query."""
    path = str(tmp_path / "lsh")
    ann_index.ann_index_build(emb, path, method="lsh")
    inline = vectors.ann_topk_bucketed(emb, query_id=0, k=K, hamming=1)
    out, score_col, asc = ann_index.ann_index_search(
        spark, path, _qvec(emb), k=K, hamming=1
    )
    assert (score_col, asc) == ("cosine_c4", False)
    assert rows_to_tuples(out) == rows_to_tuples(inline)
    # single-probe variant matches too
    sp = ann_index.ann_index_search(spark, path, _qvec(emb), k=K, hamming=0)[0]
    assert rows_to_tuples(sp) == rows_to_tuples(
        vectors.ann_topk_bucketed(emb, query_id=0, k=K)
    )
    # probe is partition pruning on the bucket dirs, corpus untouched
    p = _explain(out)
    assert "PartitionFilters: [bucket" in p
    assert "embeddings.parquet" not in p


def test_open_index_handle_reuses_side_tables(spark, emb, ivfpq_path):
    """AnnIndex is the search-many handle: side tables load at open,
    search() results equal the one-shot wrapper's."""
    idx = ann_index.AnnIndex(spark, ivfpq_path)
    assert idx.method == "ivfpq" and len(idx.coarse) > 1 and len(idx.codebook) > 1
    out1, _, _ = idx.search(_qvec(emb), k=K, nprobe=NPROBE)
    out2, _, _ = ann_index.ann_index_search(spark, ivfpq_path, _qvec(emb), k=K, nprobe=NPROBE)
    assert rows_to_tuples(out1) == rows_to_tuples(out2)


def test_ann_index_add_lsh_equals_full_build(spark, emb, tmp_path):
    """lsh is train-free and deterministic, so build(half) + add(half)
    must yield the identical searchable index as build(full)."""
    half_a = emb.filter(emb.vec_id % 2 == 0)
    half_b = emb.filter(emb.vec_id % 2 == 1)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    ann_index.ann_index_build(half_a, inc, method="lsh")
    ann_index.ann_index_add(half_b, inc)
    ann_index.ann_index_build(emb, full, method="lsh")
    qv = _qvec(emb, 1)  # an ADDED vector as the query
    out_inc = ann_index.ann_index_search(spark, inc, qv, k=K, hamming=1)[0]
    out_full = ann_index.ann_index_search(spark, full, qv, k=K, hamming=1)[0]
    got = rows_to_tuples(out_inc)
    assert got == rows_to_tuples(out_full)
    assert got[0] or True  # non-empty checked below
    rows = out_inc.collect()
    assert rows[0]["vec_id"] == 1  # the added vector finds itself first


def test_ann_index_add_ivfpq_codes_match_stored_quantizers(spark, emb, tmp_path):
    """Added rows must encode EXACTLY as the frozen quantizers dictate:
    expected (centroid_id, per-subspace cid) recomputed driver-side in
    exact int math with the same (d2, cid) tie-break."""
    half_a = emb.filter(emb.vec_id < 250)
    half_b = emb.filter((emb.vec_id >= 250) & (emb.vec_id < 260))
    path = str(tmp_path / "ivfpq_inc")
    ann_index.ann_index_build(half_a, path, method="ivfpq", kc=KC, iters=1)
    idx = ann_index.AnnIndex(spark, path)
    ann_index.ann_index_add(half_b, path)

    dim, m = idx.dim, idx.m
    d = dim // m
    new_q = {
        r["vec_id"]: ann_index._quantize_py(r["qv"])
        for r in half_b.select(
            "vec_id", vectors.as_double("embedding").alias("qv")
        ).collect()
    }
    from pyspark.sql import functions as F

    codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("id").isin([int(x) for x in new_q]))
        .collect()
    )
    assert {r["id"] for r in codes} == set(new_q)
    for r in codes:
        qq = new_q[r["id"]]
        exp_coarse = min(
            (ann_index._d2_int(qq, cv), cid) for cid, cv in idx.coarse.items()
        )[1]
        assert r["centroid_id"] == exp_coarse
        s = r["sub"]
        exp_cid = min(
            (ann_index._d2_int(qq[s * d : s * d + d], cv), cid)
            for (sk, cid), cv in idx.codebook.items()
            if sk == s
        )[1]
        assert r["cid"] == exp_cid
    # and the added vectors are searchable through the same pruning
    out, _, _ = idx.search(
        half_b.filter(emb.vec_id == 255).select(
            vectors.as_double("embedding")
        ).first()[0],
        k=K,
        nprobe=KC,  # probe all cells: the check is reachability, not recall
    )
    assert 255 in {r["vec_id"] for r in out.collect()}



def test_facade_accepts_open_handle(spark, emb, ivfpq_path):
    idx = ann_index.AnnIndex(spark, ivfpq_path)
    via_handle = vectors.ann_search(emb, query_id=0, k=K, index=idx, nprobe=NPROBE)
    via_path = vectors.ann_search(emb, query_id=0, k=K, index=ivfpq_path, nprobe=NPROBE)
    assert rows_to_tuples(via_handle) == rows_to_tuples(via_path)


def test_ann_index_compact_one_file_per_cell(spark, emb, tmp_path):
    """Three appended batches leave multiple files per bucket; compact
    rewrites to one file per cell with identical search results."""
    path = str(tmp_path / "lsh_c")
    ann_index.ann_index_build(emb.filter(emb.vec_id % 4 == 0), path, method="lsh")
    for r in (1, 2, 3):
        ann_index.ann_index_add(emb.filter(emb.vec_id % 4 == r), path)
    qv = _qvec(emb)
    before = rows_to_tuples(ann_index.ann_index_search(spark, path, qv, k=K)[0])

    def files_per_cell():
        root = f"{path}/codes"
        cells = [d for d in os.listdir(root) if d.startswith("bucket=")]
        return {
            d: len([f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")])
            for d in cells
        }

    assert max(files_per_cell().values()) > 1  # appends fragmented it
    ann_index.ann_index_compact(spark, path)
    per = files_per_cell()
    assert per and max(per.values()) == 1
    assert rows_to_tuples(ann_index.ann_index_search(spark, path, qv, k=K)[0]) == before


def test_ann_index_ingest_ledger_absorbs_redelivery(spark, emb, tmp_path):
    path = str(tmp_path / "ing")
    ann_index.ann_index_build(emb.filter(emb.vec_id < 100), path, method="ivfpq", kc=KC, iters=1)
    ing = ann_index.AnnIndexIngest(path)
    b1 = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 120))
    assert ing.write(b1) == 20
    assert ing.write(b1) == 0  # full redelivery: ledger absorbs it
    b2 = emb.filter((emb.vec_id >= 110) & (emb.vec_id < 130))
    assert ing.write(b2) == 10  # overlap dedups, new half admits
    assert (ing.ingested, ing.dropped, ing.batches) == (30, 30, 3)
    # no duplicate codes: ledger-first redelivery never re-encoded
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.groupBy("id", "sub").count().filter("count > 1").count() == 0


def test_compact_dedup_repairs_crash_window_duplicates(spark, emb, tmp_path):
    """Simulated crash-replay: the same batch encoded twice doubles the
    ADC distances of its ids (duplicate (id, sub) rows summed); compact
    with dedup=True restores the index to the cleanly-built state."""
    dup_path, clean_path = str(tmp_path / "dup"), str(tmp_path / "clean")
    base = emb.filter(emb.vec_id < 100)
    batch = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 120))
    for p in (dup_path, clean_path):
        ann_index.ann_index_build(base, p, method="ivfpq", kc=KC, iters=1)
    ann_index.ann_index_add(batch, clean_path)
    ann_index.ann_index_add(batch, dup_path)
    ann_index.ann_index_add(batch, dup_path)  # the replayed append
    qv = _qvec(emb, 100)
    clean = rows_to_tuples(
        ann_index.ann_index_search(spark, clean_path, qv, k=K, nprobe=KC)[0]
    )
    corrupted = rows_to_tuples(
        ann_index.ann_index_search(spark, dup_path, qv, k=K, nprobe=KC)[0]
    )
    assert corrupted != clean  # the hazard is real
    ann_index.ann_index_compact(spark, dup_path, dedup=True)
    repaired = rows_to_tuples(
        ann_index.ann_index_search(spark, dup_path, qv, k=K, nprobe=KC)[0]
    )
    assert repaired == clean


def test_ann_index_ingest_as_streaming_sink(spark, emb, tmp_path):
    """The foreachBatch wiring: a parquet file stream of new embeddings
    drives AnnIndexIngest.write per micro-batch; ingested vectors are
    searchable through the live index."""
    path = str(tmp_path / "stream_idx")
    ann_index.ann_index_build(emb.filter(emb.vec_id < 100), path, method="lsh")
    ing = ann_index.AnnIndexIngest(path)

    src_dir = str(tmp_path / "arrivals")
    emb.filter((emb.vec_id >= 100) & (emb.vec_id < 150)).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, eid: ing.write(df, eid))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert ing.ingested == 50
    qv = _qvec(emb, 120)  # an ingested vector
    out, _, _ = ann_index.ann_index_search(spark, path, qv, k=K)
    assert out.collect()[0]["vec_id"] == 120


@pytest.mark.parametrize("method,kwargs", [
    ("lsh", {}),
    ("ivf", {"kc": KC, "iters": 1}),
    ("pq", {"iters": 1}),
    ("ivfpq", {"kc": KC, "iters": 1}),
])
def test_search_batch_equals_per_query(spark, emb, tmp_path, method, kwargs):
    """One distributed batch job returns, per query, exactly the rows
    the per-query search path returns — every method, same exact-int64
    math and (score, id) tie-breaks end to end."""
    path = str(tmp_path / f"b_{method}")
    ann_index.ann_index_build(emb, path, method=method, **kwargs)
    idx = ann_index.AnnIndex(spark, path)
    qids = [0, 3, 7]
    queries = spark.createDataFrame(
        [(i, _qvec(emb, i)) for i in qids], "qid long, qv array<double>"
    )
    batch, score_col, asc = idx.search_batch(queries, k=K, nprobe=NPROBE, hamming=1)
    got = {
        qid: sorted((r["vec_id"], r[score_col]) for r in rows)
        for qid, rows in __import__("itertools").groupby(
            sorted(batch.collect(), key=lambda r: r["qid"]), key=lambda r: r["qid"]
        )
    }
    for qid in qids:
        single, sc, sasc = idx.search(_qvec(emb, qid), k=K, nprobe=NPROBE, hamming=1)
        assert (sc, sasc) == (score_col, asc)
        want = sorted((r["vec_id"], r[sc]) for r in single.collect())
        assert got.get(qid, []) == want, f"{method} qid={qid}"


def test_facade_works_without_corpus_frame(spark, emb, ivfpq_path):
    """A query service holds only the index handle: df=None + query_vec
    is a complete call; df=None without query_vec fails loudly."""
    idx = ann_index.AnnIndex(spark, ivfpq_path)
    out = vectors.ann_search(None, k=K, index=idx, query_vec=_qvec(emb), nprobe=NPROBE)
    want = vectors.ann_search(emb, query_id=0, k=K, index=idx, nprobe=NPROBE)
    assert rows_to_tuples(out) == rows_to_tuples(want)
    # path form resolves the session from the active session
    out2 = vectors.ann_search(None, k=K, index=ivfpq_path, query_vec=_qvec(emb), nprobe=NPROBE)
    assert rows_to_tuples(out2) == rows_to_tuples(want)
    with pytest.raises(ValueError, match="query_vec"):
        vectors.ann_search(None, index=ivfpq_path)


# ---------------------------------------------------------------- r11:
# single-writer fencing, crash-safe rebuild/compact, drift signal


def test_writer_fence_blocks_concurrent_mutation(spark, emb, tmp_path):
    """Two interleaved writers against one index: the loser errors
    cleanly (naming the holder) instead of interleaving appends, and
    the surviving single-writer sequence leaves the index identical to
    a never-contended build+add."""
    from baker_spark.datapipe import artifacts

    fenced, clean = str(tmp_path / "fenced"), str(tmp_path / "clean")
    base = emb.filter(emb.vec_id < 100)
    batch = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 120))
    for p in (fenced, clean):
        ann_index.ann_index_build(base, p, method="ivfpq", kc=KC, iters=1)

    # writer A holds the fence; writer B (add/compact/build/ingest) loses
    with artifacts.writer_fence(spark, fenced, "writer-a"):
        with pytest.raises(artifacts.ConcurrentWriterError, match="writer-a"):
            ann_index.ann_index_add(batch, fenced)
        with pytest.raises(artifacts.ConcurrentWriterError):
            ann_index.ann_index_compact(spark, fenced)
        with pytest.raises(artifacts.ConcurrentWriterError):
            ann_index.ann_index_build(base, fenced, method="ivfpq", kc=KC, iters=1)
        with pytest.raises(artifacts.ConcurrentWriterError):
            ann_index.AnnIndexIngest(fenced).write(batch)

    # fence released: the surviving writer proceeds and self-releases
    ann_index.ann_index_add(batch, fenced)
    assert artifacts.fence_holder(spark, fenced) is None

    ann_index.ann_index_add(batch, clean)
    qv = _qvec(emb, 100)
    ann_index.ann_index_compact(spark, fenced, dedup=True)
    assert rows_to_tuples(
        ann_index.ann_index_search(spark, fenced, qv, k=K, nprobe=KC)[0]
    ) == rows_to_tuples(
        ann_index.ann_index_search(spark, clean, qv, k=K, nprobe=KC)[0]
    )


def test_stale_fence_after_crash_breaks_explicitly(spark, emb, tmp_path):
    """A writer that died holding the fence leaves the marker behind by
    design: the next writer fails naming the dead holder, break_fence
    returns the holder's identity, then writes resume."""
    from baker_spark.datapipe import artifacts

    path = str(tmp_path / "stale")
    ann_index.ann_index_build(
        emb.filter(emb.vec_id < 100), path, method="ivfpq", kc=KC, iters=1
    )
    # simulate a hard crash: enter the fence, never exit
    ghost = artifacts.writer_fence(spark, path, "dead-writer")
    ghost.__enter__()
    batch = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 110))
    with pytest.raises(artifacts.ConcurrentWriterError, match="dead-writer"):
        ann_index.ann_index_add(batch, path)
    dead = artifacts.break_fence(spark, path)
    assert dead["op"] == "dead-writer" and dead["pid"] > 0
    ann_index.ann_index_add(batch, path)
    assert artifacts.fence_holder(spark, path) is None


def test_crashed_rebuild_reads_as_incomplete(spark, emb, tmp_path, monkeypatch):
    """meta is deleted FIRST on rebuild: a crash mid-rebuild must not
    leave the stale (valid-looking) meta pointing at a mix of new codes
    and old quantizer tables — the index reads as incomplete and
    rebuild=False rebuilds instead of reusing."""
    path = str(tmp_path / "rb")
    ann_index.ann_index_build(emb, path, method="ivfpq", kc=KC, iters=1, key="k1")

    with monkeypatch.context() as m:
        def boom(*a, **k):
            raise RuntimeError("simulated mid-rebuild crash")

        m.setattr(ann_index, "ivfpq_encode", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            ann_index.ann_index_build(emb, path, method="ivfpq", kc=KC, iters=1, key="k2")

    with pytest.raises(Exception):
        ann_index.ann_index_meta(spark, path)  # no stale meta survives
    meta = ann_index.ann_index_build(
        emb, path, method="ivfpq", kc=KC, iters=1, key="k2", rebuild=False
    )
    assert "reused" not in meta  # recovered by rebuilding, not reusing
    out, _, _ = ann_index.ann_index_search(spark, path, _qvec(emb), k=K, nprobe=NPROBE)
    inline = vectors.ivfpq_topk(emb, query_id=0, k=K, kc=KC, nprobe=NPROBE, iters=1)
    assert rows_to_tuples(out) == rows_to_tuples(inline)


def test_rebuild_false_reuse_survives_build_id(spark, emb, tmp_path):
    """build_id is an epoch marker, not identity: two rebuild=False
    calls with identical params reuse the SAME index (same build_id)."""
    path = str(tmp_path / "epoch")
    m1 = ann_index.ann_index_build(
        emb, path, method="ivfpq", kc=KC, iters=1, key="e1", rebuild=False
    )
    m2 = ann_index.ann_index_build(
        emb, path, method="ivfpq", kc=KC, iters=1, key="e1", rebuild=False
    )
    assert m2.get("reused") and m2["build_id"] == m1["build_id"]


def test_compact_recovers_from_crashed_swap(spark, emb, tmp_path):
    """A compact that died between its two renames (live moved aside,
    replacement not yet in place) leaves the index recoverable: the
    next compact restores the backup at entry and completes."""
    path = str(tmp_path / "recov")
    ann_index.ann_index_build(emb, path, method="ivfpq", kc=KC, iters=1)
    qv = _qvec(emb)
    before = rows_to_tuples(
        ann_index.ann_index_search(spark, path, qv, k=K, nprobe=NPROBE)[0]
    )
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    assert fs.rename(
        jvm.org.apache.hadoop.fs.Path(f"{path}/codes"),
        jvm.org.apache.hadoop.fs.Path(f"{path}/codes_precompact"),
    )  # the crash window: live codes gone, backup holds the only copy
    stats = ann_index.ann_index_compact(spark, path)
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/codes_precompact"))
    after = rows_to_tuples(
        ann_index.ann_index_search(spark, path, qv, k=K, nprobe=NPROBE)[0]
    )
    assert after == before
    assert stats["rows"] > 0 and stats["method"] == "ivfpq"


def test_drifted_ingest_flags_needs_retrain(spark, emb, tmp_path):
    """The retrain signal: frozen quantizers funnel a drifted arrival
    distribution into few cells; ann_index_stats (and compact's return)
    must flag the aged index while the fresh build stays unflagged."""
    path = str(tmp_path / "drift")
    base = emb.filter(emb.vec_id < 200)
    ann_index.ann_index_build(base, path, method="ivfpq", kc=KC, iters=1)
    fresh = ann_index.ann_index_stats(spark, path)
    assert fresh["needs_retrain"] is False, fresh

    from pyspark.sql import functions as F

    drifted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.0) + F.lit(10.0)).alias(
            "embedding"
        ),
    )
    ann_index.ann_index_add(drifted, path)
    aged = ann_index.ann_index_compact(spark, path)
    assert aged["needs_retrain"] is True, aged
    assert aged["skew"] > fresh["skew"]
    assert aged["rows"] == 2 * fresh["rows"]


def test_ingest_corrupted_ledger_fails_loud(spark, emb, tmp_path):
    """A ledger that EXISTS but can't serve the anti-join (wrong schema,
    corrupt files) must raise — silently skipping dedup would re-ingest
    duplicates (doubled ADC distances) with no error anywhere."""
    path = str(tmp_path / "corrupt")
    ann_index.ann_index_build(
        emb.filter(emb.vec_id < 100), path, method="ivfpq", kc=KC, iters=1
    )
    ing = ann_index.AnnIndexIngest(path)
    spark.createDataFrame([(1,)], "wrong_col long").write.parquet(ing.ledger_dir)
    with pytest.raises(Exception, match="vec_id|wrong_col|UNRESOLVED"):
        ing.write(emb.filter((emb.vec_id >= 100) & (emb.vec_id < 110)))


def test_scale_drift_flags_via_qerr_ratio(spark, emb, tmp_path):
    """The quantization-error track of the retrain signal: arrivals
    from a swapped embedding model (norms doubled) inflate mean
    d2-to-frozen-centroid well past the 1.5x build baseline — even
    though cell-size skew barely moves (vectors scale radially, cell
    assignment by direction is mostly preserved)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "qdrift")
    base = emb.filter(emb.vec_id < 200)
    ann_index.ann_index_build(base, path, method="ivf", kc=KC, iters=2)
    meta = ann_index.ann_index_meta(spark, path)
    assert meta["build_qerr"] > 0  # ivf builds record the baseline

    scaled = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        "label",
    )
    ann_index.ann_index_add(scaled, path)
    stats = ann_index.ann_index_stats(spark, path)
    assert stats["qerr_ratio"] > 1.5, stats
    assert stats["needs_retrain"] is True, stats
    # and the no-drift control stays quiet on BOTH tracks
    clean = str(tmp_path / "qclean")
    ann_index.ann_index_build(base, clean, method="ivf", kc=KC, iters=2)
    ann_index.ann_index_add(
        base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"),
        clean,
    )
    s2 = ann_index.ann_index_stats(spark, clean)
    assert s2["needs_retrain"] is False and s2["qerr_ratio"] < 1.1, s2


def test_ingest_replays_past_fileless_ledger_dir(spark, emb, tmp_path):
    """The documented crash window, first-batch edition: codes landed,
    then the FIRST ledger append died after creating the output
    directory but before any part file committed. The replay must run
    (a file-less dir is zero seen ids), not brick every retry on
    UNABLE_TO_INFER_SCHEMA — 'replay duplicates, never loses' is the
    class's recovery contract."""
    path = str(tmp_path / "fileless")
    ann_index.ann_index_build(
        emb.filter(emb.vec_id < 100), path, method="ivfpq", kc=KC, iters=1
    )
    ing = ann_index.AnnIndexIngest(path)
    os.makedirs(ing.ledger_dir)  # the crashed append's empty dir
    batch = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 110))
    assert ing.write(batch) == 10
    # the now-real ledger absorbs a redelivery of the same batch
    assert ing.write(batch) == 0


def test_append_refuses_over_crashed_compact_swap(spark, emb, tmp_path):
    """A compact that died between its two renames leaves codes missing
    and codes_precompact holding the ONLY full copy. An append arriving
    before the recovery compact must refuse — recreating codes with
    just its batch would make the next compact skip the entry restore
    and delete the backup, destroying the corpus."""
    path = str(tmp_path / "crashswap")
    base = emb.filter(emb.vec_id < 100)
    ann_index.ann_index_build(base, path, method="ivf", kc=KC, iters=1)
    os.rename(f"{path}/codes", f"{path}/codes_precompact")
    late = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 105)).select(
        "vec_id", "embedding", "label"
    )
    with pytest.raises(RuntimeError, match="codes_precompact"):
        ann_index.ann_index_add(late, path)
    # compact's entry restore repairs the swap; then the append lands
    ann_index.ann_index_compact(spark, path)
    ann_index.ann_index_add(late, path)
    assert ann_index.ann_index_stats(spark, path)["vectors"] == 105


def test_stats_report_vectors_alongside_code_rows(spark, emb, tmp_path):
    """pq/ivfpq store m sub-code rows per vector: 'rows' is the probe-
    cost unit, 'vectors' the ingest-reconciliation unit — conflating
    them reads as m-times row duplication to an operator."""
    path = str(tmp_path / "vecunit")
    base = emb.filter(emb.vec_id < 100)
    n = base.count()
    ann_index.ann_index_build(base, path, method="ivfpq", kc=KC, iters=1)
    st = ann_index.ann_index_stats(spark, path)
    m = ann_index.ann_index_meta(spark, path)["m"]
    assert m > 1
    assert st["rows"] == n * m
    assert st["vectors"] == n


def test_ingest_replays_past_temporary_only_ledger_dir(spark, emb, tmp_path):
    """Harsher edition of the file-less-dir window: the crashed append
    left task files STAGED under _temporary/ but none committed. The
    reader filters hidden-ancestor paths, so 'has data' must too —
    counting staged part files as data re-bricks the replay on
    UNABLE_TO_INFER_SCHEMA."""
    path = str(tmp_path / "tmponly")
    ann_index.ann_index_build(
        emb.filter(emb.vec_id < 100), path, method="ivfpq", kc=KC, iters=1
    )
    ing = ann_index.AnnIndexIngest(path)
    # FileOutputCommitter v1 layout for a task attempt that NEVER
    # committed — _temporary/<appAttempt>/_temporary/attempt_*/ — the
    # one state a later job's commitJob does NOT adopt into the output
    # (committed-task dirs _temporary/0/task_* WOULD be promoted, which
    # is at-least-once duplicate adoption, not data loss)
    staged = os.path.join(ing.ledger_dir, "_temporary", "0", "_temporary", "attempt_001")
    os.makedirs(staged)
    with open(os.path.join(staged, "part-00000.parquet"), "wb") as f:
        f.write(b"not really parquet")
    batch = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 110))
    assert ing.write(batch) == 10
    assert ing.write(batch) == 0


def test_rebuild_clears_default_ingest_ledger(spark, emb, tmp_path):
    """A rebuilt index starts with a fresh default ledger: the old one
    said 'already in the PREVIOUS codes', and keeping it would anti-join
    previously streamed ids away from the NEW index forever — permanent
    silent loss when the rebuild corpus lacks them."""
    path = str(tmp_path / "rebuilt")
    base = emb.filter(emb.vec_id < 100)
    ann_index.ann_index_build(base, path, method="ivfpq", kc=KC, iters=1)
    ing = ann_index.AnnIndexIngest(path)
    streamed = emb.filter((emb.vec_id >= 100) & (emb.vec_id < 120))
    assert ing.write(streamed) == 20
    # retrain cadence: rebuild from the ORIGINAL snapshot (streamed ids
    # lived only in codes); the stale ledger must not survive it
    ann_index.ann_index_build(base, path, method="ivfpq", kc=KC, iters=1)
    ing2 = ann_index.AnnIndexIngest(path)
    assert ing2.write(streamed) == 20  # admitted again, not silently lost
    assert ann_index.ann_index_stats(spark, path)["vectors"] == 120


def _clustered_corpus(spark, seed=7, centers=8, per=40, dim=64):
    """Deterministic clustered unit-norm corpus — the realistic regime
    for embedding tables (real encoders cluster; the synthetic
    isotropic testdata is the pathological recall floor where even a
    FRESH ivf reads ~0.5 at nprobe=2, see SCALING.md r11 addendum)."""
    import math as _math
    import random as _random

    rng = _random.Random(seed)

    def unit(v):
        n = _math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    cs = [unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(centers)]
    rows, vid = [], 0
    for c in cs:
        for _ in range(per):
            rows.append((vid, unit([c[j] + 0.15 * rng.gauss(0, 1) for j in range(dim)])))
            vid += 1
    # rotational drift: arrivals around a NEW direction the frozen
    # centroids never saw, with enough residual spread that their true
    # neighbor structure disagrees with the frozen cell assignment
    topic = unit([rng.gauss(0, 1) for _ in range(dim)])
    drift = []
    for _ in range(3 * per):
        drift.append(
            (vid, unit([0.9 * topic[j] + 1.4 * rng.gauss(0, 1) for j in range(dim)]))
        )
        vid += 1
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(rows, schema),
        spark.createDataFrame(drift, schema),
    )


def test_recall_probe_flags_rotational_drift_inband_signals_miss(spark, tmp_path):
    """VERDICT r11 next-round #3 pinned: rotational drift (arrivals
    around a new topic direction) is the measured BLIND SPOT of both
    in-band signals — skew and qerr stay under their thresholds — yet
    aged-index recall on drifted queries collapses. The out-of-band
    sampled probe must catch it, and feeding its reading into
    ann_index_stats must flip needs_retrain; healthy-region queries on
    the same aged index stay above the floor (measured on this fixture:
    drifted 0.475, healthy 0.992, skew 2.3, qerr_ratio 1.25)."""
    a, drifted_b = _clustered_corpus(spark)
    aged = str(tmp_path / "aged")
    ann_index.ann_index_build(a, aged, method="ivf", kc=KC, iters=4)
    ann_index.ann_index_add(drifted_b, aged)

    probe = ann_index.ann_index_recall_probe(
        spark, aged, queries=drifted_b.limit(12), n_q=12, k=K, nprobe=1
    )
    healthy = ann_index.ann_index_recall_probe(
        spark, aged, queries=a.limit(12), n_q=12, k=K, nprobe=1
    )
    assert probe["recall"] < ann_index.RECALL_RETRAIN_FLOOR, probe
    assert healthy["recall"] >= ann_index.RECALL_RETRAIN_FLOOR, healthy

    # the blind spot, reproduced: in-band signals alone do NOT flag the
    # drifted index...
    stats_inband = ann_index.ann_index_stats(spark, aged)
    assert not stats_inband["needs_retrain"], stats_inband
    # ...the probe reading folded in DOES
    stats = ann_index.ann_index_stats(spark, aged, recall=probe["recall"])
    assert stats["needs_retrain"] and stats["recall"] == probe["recall"]
    ok = ann_index.ann_index_stats(spark, aged, recall=healthy["recall"])
    assert not ok["needs_retrain"], ok


def test_recall_probe_sampled_corpus_estimator(spark, tmp_path):
    """sample_frac < 1 bounds the brute job: truth within the sample,
    index asked for ceil(k/f) and scored on in-sample hits. On a fresh
    clustered index the estimate must stay near the full-corpus reading
    (both above the floor), and the probe must be deterministic for a
    fixed seed."""
    a, _ = _clustered_corpus(spark)
    path = str(tmp_path / "fresh")
    ann_index.ann_index_build(a, path, method="ivf", kc=KC, iters=4)
    full = ann_index.ann_index_recall_probe(spark, path, n_q=10, k=K, nprobe=NPROBE)
    est = ann_index.ann_index_recall_probe(
        spark, path, n_q=10, k=K, nprobe=NPROBE, sample_frac=0.5
    )
    est2 = ann_index.ann_index_recall_probe(
        spark, path, n_q=10, k=K, nprobe=NPROBE, sample_frac=0.5
    )
    assert full["recall"] >= ann_index.RECALL_RETRAIN_FLOOR
    assert est["recall"] >= ann_index.RECALL_RETRAIN_FLOOR
    assert est == est2  # seeded: identical reading run-to-run
    assert est["corpus_rows"] < full["corpus_rows"]  # the brute job truly shrank


def test_recall_probe_pq_requires_corpus(spark, emb, tmp_path):
    path = str(tmp_path / "pq")
    ann_index.ann_index_build(emb, path, method="pq", iters=1)
    with pytest.raises(ValueError, match="retain raw vectors"):
        ann_index.ann_index_recall_probe(spark, path)
    probe = ann_index.ann_index_recall_probe(spark, path, corpus=emb, n_q=8, k=5)
    assert 0.0 <= probe["recall"] <= 1.0 and probe["method"] == "pq"


# ---- probe cadence: the ingest loop schedules its own recall probe ----
# (VERDICT r12 next-round #7: drifted appends must flip needs_retrain
# THROUGH the loop, with no manual ann_index_recall_probe call)


def test_probe_cadence_flags_drift_through_ingest_loop(spark, tmp_path):
    """Pinned: an AnnIndexIngest with probe_every_n_batches=2 ingests a
    healthy batch (cadence not due — no probe jobs spent), then the
    drifted arrivals; the SECOND write probes with its own batch as
    queries and the rotational-drift reading flips needs_retrain in the
    loop's report. The healthy split is by id modulo so the held-out
    rows cover every build-time cluster (holding out a whole cluster
    would itself be drift)."""
    a, drifted_b = _clustered_corpus(spark)
    path = str(tmp_path / "cadence")
    ann_index.ann_index_build(
        a.filter("vec_id % 8 != 0"), path, method="ivf", kc=KC, iters=4
    )
    ing = ann_index.AnnIndexIngest(
        path, probe_every_n_batches=2, probe_n_q=12, probe_k=K, probe_nprobe=1
    )
    assert ing.write(a.filter("vec_id % 8 = 0")) == 40
    assert ing.probes == 0 and not ing.needs_retrain

    ing.write(drifted_b)
    assert ing.probes == 1
    assert ing.last_probe["recall"] < ann_index.RECALL_RETRAIN_FLOOR
    assert ing.needs_retrain
    rep = ing.report()
    assert rep["needs_retrain"] and rep["recall"] == ing.last_probe["recall"]
    assert rep["stats"]["vectors"] == 440 and rep["probes"] == 1


def test_probe_cadence_healthy_batch_stays_quiet(spark, tmp_path):
    """Control for the pinned drift test: a cadence probe on a healthy
    in-distribution batch reads above the floor and leaves
    needs_retrain False — the scheduled probe must not alarm on a
    well-fit index."""
    a, _ = _clustered_corpus(spark)
    path = str(tmp_path / "cadence_ok")
    ann_index.ann_index_build(
        a.filter("vec_id % 8 != 0"), path, method="ivf", kc=KC, iters=4
    )
    ing = ann_index.AnnIndexIngest(
        path, probe_every_n_batches=1, probe_n_q=12, probe_k=K, probe_nprobe=1
    )
    assert ing.write(a.filter("vec_id % 8 = 0")) == 40
    assert ing.probes == 1
    assert ing.last_probe["recall"] >= ann_index.RECALL_RETRAIN_FLOOR
    assert not ing.needs_retrain and not ing.report()["needs_retrain"]


def test_probe_cadence_pq_requires_corpus_fails_fast(spark, emb, tmp_path):
    """pq/ivfpq codes don't retain vectors, so cadence without a
    probe_corpus must fail at the FIRST write — not silently at the Nth
    batch days into the daemon's life."""
    path = str(tmp_path / "pqcad")
    ann_index.ann_index_build(emb.filter(emb.vec_id < 100), path, method="pq", iters=1)
    ing = ann_index.AnnIndexIngest(path, probe_every_n_batches=5)
    with pytest.raises(ValueError, match="probe_corpus"):
        ing.write(emb.filter((emb.vec_id >= 100) & (emb.vec_id < 110)))


def test_probe_cadence_pq_with_corpus_callable(spark, emb, tmp_path):
    """The corpus provider unblocks cadence on code-only methods: a
    spark -> DataFrame callable is resolved at probe time (so it can
    read the LIVE corpus table, not a snapshot taken at construction)."""
    path = str(tmp_path / "pqcad2")
    ann_index.ann_index_build(emb.filter(emb.vec_id < 100), path, method="pq", iters=1)
    ing = ann_index.AnnIndexIngest(
        path,
        probe_every_n_batches=1,
        probe_corpus=lambda s: emb.filter(emb.vec_id < 110),
        probe_n_q=8,
        probe_k=5,
    )
    assert ing.write(emb.filter((emb.vec_id >= 100) & (emb.vec_id < 110))) == 10
    assert ing.probes == 1
    assert 0.0 <= ing.last_probe["recall"] <= 1.0
    assert ing.report()["stats"]["method"] == "pq"
