

def test_exact_substring_dedup_surgical_removal(spark):
    """ExactSubstr (Lee et al. 2022) pinned semantics: a k-token span
    repeated ANYWHERE (cross-doc or self-repeat) is cut from every
    occurrence while the surrounding text survives; sub-k docs and
    repeat-free docs pass through byte-identical; NULL/empty text is
    preserved. Both engines hash-matched on the same fixtures."""
    import duckdb

    from baker_spark.datapipe import dedup as D

    span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, f"intro one two {span} tail one"),
        (2, f"other prefix {span} closing words here"),
        (3, "clean document with no repeats at all whatsoever"),
        (4, f"{span} middle {span}"),   # self-repeat inside one doc
        (5, "tiny doc"),                 # < k tokens: untouchable
        (6, None),
        (7, ""),
        (8, span),                       # fully covered -> empty rewrite
        (9, span),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.exact_substring_dedup(df, k=5).collect()}

    # the shared 8-token span is cut from both docs, surroundings kept
    assert out[1]["clean_text"] == "intro one two tail one"
    assert out[2]["clean_text"] == "other prefix closing words here"
    assert out[1]["n_removed_tokens"] == 8 and out[1]["n_tokens"] == 13
    assert out[1]["removed_frac_c6"] == 615384
    # self-repeat: both occurrences cut, connective survives
    assert out[4]["clean_text"] == "middle"
    assert out[4]["n_removed_tokens"] == 16
    # untouched classes
    assert out[3]["clean_text"] == docs[2][1] and out[3]["n_removed_tokens"] == 0
    assert out[5]["clean_text"] == "tiny doc"
    assert out[6]["clean_text"] is None and out[6]["n_tokens"] is None
    assert out[7]["clean_text"] == ""
    # whole-doc duplicates collapse to the empty rewrite ('' not NULL)
    assert out[8]["clean_text"] == "" and out[8]["removed_frac_c6"] == 1_000_000

    # cross-engine: identical rows from the DuckDB twin
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    dk = sorted(tuple(r) for r in con.execute(D.duck_exact_substring_dedup(k=5)).fetchall())
    sp = sorted(tuple(r) for r in D.exact_substring_dedup(df, k=5).collect())
    assert sp == dk
