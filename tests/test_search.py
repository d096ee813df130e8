"""BM25 keyword search (operators/search.py): hand-computed scores,
tokenizer contract, and the no-full-index plan shape."""

import math
import os

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.search import bm25_topk, term_stats, tokenize


@pytest.fixture()
def tiny_corpus(spark):
    rows = [
        (1, "spark streams data. Spark merges data!"),
        (2, "a tiny document about nothing in particular"),
        (3, "data data data everywhere"),
        (4, "spark SPARK Spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenize_contract(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! 42x  ---  END")], "id long, t string"
    )
    toks = df.select(tokenize("t").alias("x")).collect()[0].x
    assert toks == ["hello", "world", "42x", "end"]


def test_term_stats_df_counts(tiny_corpus):
    stats = {
        r.term: r.df
        for r in term_stats(tiny_corpus, terms=["spark", "data", "ghost"]).collect()
    }
    assert stats == {"spark": 2, "data": 2}  # absent term: no row


def _bm25_ref(corpus_rows, terms, k1=1.2, b=0.75):
    import re

    docs = {
        i: [t for t in re.split("[^a-z0-9]+", txt.lower()) if t]
        for i, txt in corpus_rows
    }
    n = len(docs)
    avgdl = sum(len(d) for d in docs.values()) / n
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for t in set(terms):
            df = sum(1 for d in docs.values() if t in d)
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            out[i] = math.floor(s * 1e6 + 0.5) / 1e6
    return out


def test_bm25_matches_reference_formula(spark, tiny_corpus):
    rows = [(r.doc_id, r.text) for r in tiny_corpus.collect()]
    ref = _bm25_ref(rows, ["spark", "data"])
    got = {
        r.doc_id: r.score
        for r in bm25_topk(tiny_corpus, "Spark data", k=10).collect()
    }
    assert got == ref
    # ranking: ties by ascending id; doc 2 (no match) absent
    ranked = [
        r.doc_id
        for r in bm25_topk(tiny_corpus, "spark data", k=10)
        .orderBy("rank")
        .collect()
    ]
    assert 2 not in ranked and set(ranked) == {1, 3, 4}
    assert ranked == sorted(ref, key=lambda i: (-ref[i], i))


def test_bm25_query_forms_and_validation(spark, tiny_corpus):
    # string and list queries agree; duplicate terms count once
    a = {(r.doc_id, r.score) for r in bm25_topk(tiny_corpus, "data spark").collect()}
    b = {
        (r.doc_id, r.score)
        for r in bm25_topk(tiny_corpus, ["DATA", "spark", "data"]).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(tiny_corpus, "!!!")


def test_bm25_plan_is_map_only(spark, tiny_corpus):
    """Single-query BM25 scores in the scan (per-term tf as array
    expressions): NO explode, NO exchange anywhere — the only
    cross-partition movement is the TakeOrderedAndProject top-k
    merge."""
    plan = (
        bm25_topk(tiny_corpus, "spark data", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_bm25_batch_matches_single_query(spark, tiny_corpus):
    """One corpus pass for many queries must score identically to the
    per-query path."""
    from parq_tools_spark.operators.search import bm25_topk_batch

    qdf = spark.createDataFrame(
        [(100, "spark data"), (200, "nothing particular"), (300, "data")],
        "query_id long, query string",
    )
    batch = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk_batch(tiny_corpus, qdf, k=10).collect()
    }
    for qid, q in [(100, "spark data"), (200, "nothing particular"), (300, "data")]:
        single = {
            (qid, r.doc_id): (r.score, r.rank)
            for r in bm25_topk(tiny_corpus, q, k=10).collect()
        }
        assert {kk: v for kk, v in batch.items() if kk[0] == qid} == single


def test_bm25_batch_validation(spark, tiny_corpus):
    from parq_tools_spark.operators.search import bm25_topk_batch

    with pytest.raises(ValueError, match="no queries"):
        bm25_topk_batch(
            tiny_corpus,
            tiny_corpus.sparkSession.createDataFrame(
                [], "query_id long, query string"
            ),
        )
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk_batch(
            tiny_corpus,
            tiny_corpus.sparkSession.createDataFrame(
                [(1, "...")], "query_id long, query string"
            ),
        )


def test_bm25_null_text_and_term_tokenization(spark):
    """NULL text = zero-length document (counted in N and the avgdl
    denominator, never matching); list-form query terms tokenize like
    the corpus (a hyphenated term splits instead of silently matching
    nothing)."""
    import math as m

    rows = [(1, "data base systems"), (2, None), (3, "data data")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_topk(df, ["data-base"], k=10).collect()}
    assert set(got) == {1, 3}  # 'data-base' -> {data, base}; doc 2 never matches

    # reference with avgdl = sum(len)/N over N=3 docs incl. the NULL-as-0
    docs = {1: ["data", "base", "systems"], 2: [], 3: ["data", "data"]}
    n, avgdl = 3, (3 + 0 + 2) / 3
    def s(i):
        tot = 0.0
        for t in ("data", "base"):
            df_t = sum(1 for d in docs.values() if t in d)
            tf = docs[i].count(t)
            if not tf:
                continue
            idf = m.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
            tot += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(docs[i]) / avgdl))
        return m.floor(tot * 1e6 + 0.5) / 1e6
    assert got == {1: s(1), 3: s(3)}


def test_bm25_batch_duplicate_query_id_raises(spark, tiny_corpus):
    from parq_tools_spark.operators.search import bm25_topk_batch

    qdf = spark.createDataFrame(
        [(1, "spark streams"), (1, "data merge")],
        "query_id long, query string",
    )
    with pytest.raises(ValueError, match="duplicate query_id"):
        bm25_topk_batch(tiny_corpus, qdf)


# ------------------------------------------------ persisted BM25 index
def test_bm25_index_equals_scan_path(spark, tiny_corpus, tmp_path):
    """Query-from-index must reproduce the scan path's scores, ranks
    and filters EXACTLY (same idf/avgdl/tf arithmetic at the index's
    committed statistics), including mode='all'."""
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_topk,
        bm25_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus.filter("doc_id <= 2"), path, n_buckets=8)
    bm25_index_add(tiny_corpus.filter("doc_id > 2"), path)
    for mode in ("any", "all"):
        scan = [
            (r.doc_id, r.score, r.rank)
            for r in bm25_topk(tiny_corpus, "spark data", k=10, mode=mode).collect()
        ]
        idx = [
            (r.doc_id, r.score, r.rank)
            for r in bm25_index_topk(spark, path, "spark data", k=10, mode=mode).collect()
        ]
        assert scan == idx and len(scan) > 0
    # version stamped in every row (build=1, add=2)
    vers = {
        r.index_version
        for r in bm25_index_topk(spark, path, "spark data").collect()
    }
    assert vers == {2}


def test_bm25_index_batch_equals_scan_batch(spark, tiny_corpus, tmp_path):
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk_batch,
        bm25_topk_batch,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus, path, n_buckets=8)
    qdf = spark.createDataFrame(
        [(100, "spark data"), (300, "data")], "query_id long, query string"
    )
    scan = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_topk_batch(tiny_corpus, qdf, k=10).collect()
    )
    idx = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_index_topk_batch(spark, path, qdf, k=10).collect()
    )
    assert scan == idx and len(scan) > 0


def test_bm25_index_stats_and_staleness_contract(spark, tiny_corpus, tmp_path):
    """Stats reflect exactly the committed manifest; a query stamps the
    version it scored against, so a caller can detect staleness by
    comparing with bm25_index_stats."""
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus.filter("doc_id = 1"), path)
    s1 = bm25_index_stats(spark, path)
    assert (s1["version"], s1["n_docs"]) == (1, 1)
    r1 = bm25_index_topk(spark, path, "spark").collect()
    assert all(r.index_version == 1 for r in r1)
    bm25_index_add(tiny_corpus.filter("doc_id > 1"), path)
    s2 = bm25_index_stats(spark, path)
    assert (s2["version"], s2["n_docs"]) == (2, 4)
    assert s2["sum_dl"] > s1["sum_dl"]
    r2 = bm25_index_topk(spark, path, "spark").collect()
    assert all(r.index_version == 2 for r in r2)
    # df changed between versions -> scores for the same query differ
    assert {x.doc_id: x.score for x in r1} != {x.doc_id: x.score for x in r2}


def test_bm25_index_crash_is_invisible_and_compact_preserves(
    spark, tiny_corpus, tmp_path
):
    """An orphan segment (crashed add/compact) is invisible to queries
    — no raise, identical results; compaction rewrites into one
    segment, sweeps orphans, results unchanged."""
    import os

    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_compact,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus.filter("doc_id <= 2"), path, n_buckets=4)
    bm25_index_add(tiny_corpus.filter("doc_id > 2"), path)
    before = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    orphan = os.path.join(path, "seg-000099-deadbeef")
    spark.createDataFrame(
        [(99, 3, "spark", 1)], "doc_id long, dl int, term string, tf int"
    ).write.parquet(os.path.join(orphan, "tbucket=0"))
    mid = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    assert mid == before  # orphan invisible

    compacted = bm25_index_compact(spark, path, min_files_per_bucket=1)
    assert compacted
    assert not os.path.exists(orphan)
    after = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    assert after == before
    segs = [e for e in os.listdir(path) if e.startswith("seg-")]
    # superseded segments keep one cycle of reader grace
    assert len(segs) == 3
    assert bm25_index_compact(spark, path) == {}
    assert len([e for e in os.listdir(path) if e.startswith("seg-")]) == 1


def test_bm25_index_query_plan_never_scans_corpus(spark, tiny_corpus, tmp_path):
    """The index-serving plan must contain NO tokenization (no regexp
    split, no Generate/explode) and must push the term filter into the
    postings scan with tbucket partition pruning — the O(query-terms)
    serving shape, not an O(corpus) rescan."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus, path, n_buckets=8)
    q = bm25_index_topk(spark, path, "spark data", k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode anywhere
    assert "regexp" not in plan.lower() and "StringSplit" not in plan
    assert "PushedFilters" in plan or "DataFilters" in plan
    assert "term" in plan and "tbucket" in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_phrase_filter(spark, tmp_path):
    """phrase= requires the contiguous token sequence; ranking stays
    BM25 over the query terms."""
    from parq_tools_spark.operators.search import bm25_topk

    rows = [
        (1, "stream processing with window join semantics"),
        (2, "join the window later"),          # both terms, NOT contiguous
        (3, "window join window join"),         # phrase twice
        (4, "nothing relevant"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id
        for r in bm25_topk(df, "window join", k=10, phrase="window join").collect()
    }
    assert got == {1, 3}
    # phrase-as-filter: same scores as the unfiltered query for kept docs
    base = {
        r.doc_id: r.score for r in bm25_topk(df, "window join", k=10).collect()
    }
    ph = {
        r.doc_id: r.score
        for r in bm25_topk(df, "window join", k=10, phrase="window join").collect()
    }
    assert all(ph[d] == base[d] for d in ph)
    with pytest.raises(ValueError, match="empty phrase"):
        bm25_topk(df, "window join", phrase="!!!")


def test_bm25_mode_all_and_validation(spark, tiny_corpus):
    from parq_tools_spark.operators.search import bm25_topk

    any_ids = {r.doc_id for r in bm25_topk(tiny_corpus, "spark data", mode="any").collect()}
    all_ids = {r.doc_id for r in bm25_topk(tiny_corpus, "spark data", mode="all").collect()}
    assert all_ids == {1} and any_ids == {1, 3, 4}
    with pytest.raises(ValueError, match="mode"):
        bm25_topk(tiny_corpus, "spark", mode="phrase")


def test_bm25_index_zero_token_batches(spark, tiny_corpus, tmp_path):
    """A batch (or whole build) of only NULL/zero-token documents
    yields an empty postings segment: build and add must not crash on
    read-back, the docs still count in n_docs/avgdl, and queries keep
    serving (the review-found UNABLE_TO_INFER_SCHEMA path)."""
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
        bm25_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus, path)
    empties = spark.createDataFrame(
        [(10, None), (11, "!!! ...")], "doc_id long, text string"
    )
    bm25_index_add(empties, path)
    st = bm25_index_stats(spark, path)
    assert st["n_docs"] == 6 and st["version"] == 2
    idx = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    scan = [
        (r.doc_id, r.score)
        for r in bm25_topk(
            tiny_corpus.unionByName(empties), "spark data", k=10
        ).collect()
    ]
    assert idx == scan and len(idx) > 0

    # an index built ENTIRELY from zero-token docs: queries return the
    # typed empty relation, never raise
    p2 = str(tmp_path / "bmidx2")
    bm25_index_build(empties, p2)
    out = bm25_index_topk(spark, p2, "anything", k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "rank", "index_version"]


def test_bm25_index_string_ids_schema_stable(spark, tmp_path):
    """id_col with a non-long type: the output column keeps the
    indexed name and type on BOTH the populated and the empty path (a
    caller unioning across index states must never hit a type flip)."""
    from pyspark.sql import types as T

    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    df = spark.createDataFrame(
        [("a", "spark data"), ("b", "data data"), ("c", None)],
        "uid string, text string",
    )
    path = str(tmp_path / "bmidx")
    bm25_index_build(df, path, id_col="uid")
    got = bm25_index_topk(spark, path, "data", k=10)
    assert got.columns == ["uid", "score", "rank", "index_version"]
    assert isinstance(got.schema["uid"].dataType, T.StringType)
    assert {r.uid for r in got.collect()} == {"a", "b"}

    empty_path = str(tmp_path / "bmidx_empty")
    bm25_index_build(df.filter("text IS NULL"), empty_path, id_col="uid")
    empty = bm25_index_topk(spark, empty_path, "data", k=10)
    # same names and types (nullability flags may differ; unions coerce)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in got.schema.fields
    ]
    assert empty.count() == 0


def test_bm25_index_rebuild_nondestructive(spark, tiny_corpus, tmp_path):
    """A rebuild commits a NEW version alongside the live one: a crash
    mid-rebuild (injected at the commit point) leaves the OLD index
    serving identical results; a completed rebuild serves the new
    corpus while the previous generation survives one maintenance
    cycle (reader grace), and the next cycle sweeps it."""
    import os

    from parq_tools_spark.sources import statefs
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_compact,
        bm25_index_stats,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus.filter("doc_id <= 2"), path, n_buckets=4)
    before = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]

    # crash injection: the rebuild dies between building the new
    # generation and committing its manifest
    real_commit = statefs.VersionedState.commit

    def boom(self, n, text):
        raise RuntimeError("injected crash before commit")

    statefs.VersionedState.commit = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            bm25_index_build(tiny_corpus, path, n_buckets=4)
    finally:
        statefs.VersionedState.commit = real_commit
    # the OLD index still serves, bit-identically
    assert [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ] == before
    assert bm25_index_stats(spark, path)["version"] == 1

    # a completed rebuild: new stats, old version survives this cycle
    bm25_index_build(tiny_corpus, path, n_buckets=4)
    st = bm25_index_stats(spark, path)
    assert (st["version"], st["n_docs"]) == (2, 4)
    assert os.path.exists(os.path.join(path, "v=1"))
    after = bm25_index_topk(spark, path, "spark data", k=10).collect()
    assert {r.index_version for r in after} == {2}
    assert len(after) > len(before)

    # next maintenance cycle sweeps the superseded generation
    bm25_index_compact(spark, path)
    assert not os.path.exists(os.path.join(path, "v=1"))
    assert [
        e
        for e in os.listdir(path)
        if e.startswith(("seg-", "terms-")) and "-000001-" in e
    ] == []


def test_bm25_index_batch_empty_index_string_query_ids(spark, tmp_path):
    """The empty-index batch path derives the query-id column's type
    from the queries DataFrame — string query ids must not flip to
    long between index states."""
    from pyspark.sql import types as T

    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk_batch,
    )

    empties = spark.createDataFrame(
        [(10, None)], "doc_id long, text string"
    )
    path = str(tmp_path / "bmidx")
    bm25_index_build(empties, path)
    qdf = spark.createDataFrame(
        [("qa", "anything")], "query_id string, query string"
    )
    out = bm25_index_topk_batch(spark, path, qdf, k=5)
    assert out.count() == 0
    assert isinstance(out.schema["query_id"].dataType, T.StringType)


def test_bm25_index_phrase_serves_from_positions(spark, tiny_corpus, tmp_path):
    """Phrase retrieval on the index path (positional postings) must
    equal the scan path's bm25_topk(phrase=) exactly — across build +
    add batches, with repeated-token phrases, and raise cleanly on an
    index built without positions."""
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_topk,
        bm25_topk,
    )

    path = str(tmp_path / "bmidxp")
    bm25_index_build(
        tiny_corpus.filter("doc_id <= 2"), path, n_buckets=4,
        store_positions=True,
    )
    bm25_index_add(tiny_corpus.filter("doc_id > 2"), path)

    for query, phrase in [
        ("spark data", "merges data"),     # crosses a posting pair
        ("spark data", "spark streams"),   # doc 1 only
        ("data", "data data"),             # repeated token (doc 3)
        ("spark data", ["spark", "spark"]),  # adjacency in doc 4
        ("spark", "no such phrase here"),  # no match -> empty
    ]:
        scan = [
            (r.doc_id, r.score, r.rank)
            for r in bm25_topk(
                tiny_corpus, query, k=10, phrase=phrase
            ).collect()
        ]
        idx = [
            (r.doc_id, r.score, r.rank)
            for r in bm25_index_topk(
                spark, path, query, k=10, phrase=phrase
            ).collect()
        ]
        assert idx == scan, (query, phrase, idx, scan)
    # at least one of the cases above must be non-empty
    assert bm25_index_topk(
        spark, path, "spark data", k=10, phrase="merges data"
    ).count() > 0

    # non-positional index: loud, actionable error
    p2 = str(tmp_path / "bmidx_nopos")
    bm25_index_build(tiny_corpus, p2)
    with pytest.raises(ValueError, match="store_positions"):
        bm25_index_topk(spark, p2, "spark", phrase="spark streams")


def test_bm25_index_delete_equals_fresh_build_on_survivors(
    spark, tiny_corpus, tmp_path
):
    """build -> delete -> query must equal a from-scratch build over
    the surviving docs EXACTLY (n_docs, avgdl and per-term df are
    decremented from the deleted docs' own postings at delete time);
    deletes are idempotent; re-adding a tombstoned id is refused
    until compaction folds the tombstone, after which it works."""
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_stats,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmidx")
    extras = spark.createDataFrame(
        [(10, None), (11, "data sparkles with spark data")],
        "doc_id long, text string",
    )
    bm25_index_build(tiny_corpus, path, n_buckets=4)
    bm25_index_add(extras, path)

    # a never-indexed id is a loud error (the _docs doc table makes
    # membership exact, including zero-token docs)
    with pytest.raises(ValueError, match="not VISIBLE"):
        bm25_index_delete(spark, path, [999_999])
    # id 10 is a NULL-text (zero-token) doc: visible via _docs, so
    # deleting it needs no allow_missing escape
    out = bm25_index_delete(spark, path, [1, 3, 10])
    assert out == {"deleted": 3, "version": 3}
    st = bm25_index_stats(spark, path)
    assert st["n_docs"] == 3 and st["pending_delete_batches"] == 1

    fresh_path = str(tmp_path / "fresh")
    survivors = tiny_corpus.unionByName(extras).filter(
        "doc_id NOT IN (1, 3, 10)"
    )
    bm25_index_build(survivors, fresh_path, n_buckets=4)
    got = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    want = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(
            spark, fresh_path, "spark data", k=10
        ).collect()
    ]
    assert got == want and len(got) > 0
    assert 1 not in {d for d, _, _ in got} and 3 not in {d for d, _, _ in got}

    # re-deleting an already-tombstoned id: no visible postings ->
    # the guard fires (silent double-decrement would corrupt n_docs)
    with pytest.raises(ValueError, match="not VISIBLE"):
        bm25_index_delete(spark, path, [1, 3])

    # version-scoped tombstones: re-adding a tombstoned id is legal
    # and IMMEDIATELY visible (its postings land in a newer segment,
    # beyond the tombstone's upto) — no compaction needed
    readd = spark.createDataFrame(
        [(1, "spark streams data again")], "doc_id long, text string"
    )
    bm25_index_add(readd, path)
    hits = {
        r.doc_id
        for r in bm25_index_topk(spark, path, "spark", k=10).collect()
    }
    assert 1 in hits and 3 not in hits
    # ...and equals a fresh build over (survivors + the re-added row)
    fresh2 = str(tmp_path / "fresh2")
    bm25_index_build(survivors.unionByName(readd), fresh2, n_buckets=4)
    assert [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ] == [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(
            spark, fresh2, "spark data", k=10
        ).collect()
    ]

    # compaction folds tombstones: results unchanged, list cleared,
    # and the re-added row survives the fold
    bm25_index_compact(spark, path, min_files_per_bucket=1)
    assert bm25_index_stats(spark, path)["pending_delete_batches"] == 0
    after = {
        r.doc_id
        for r in bm25_index_topk(spark, path, "spark", k=10).collect()
    }
    assert 1 in after and 3 not in after


def test_bm25_index_add_preserves_pending_tombstones(
    spark, tiny_corpus, tmp_path
):
    """Regression (review r9): an add between a delete and its
    compaction must carry the pending tombstone list through its
    manifest — dropping it would resurrect the deleted docs while the
    statistics still exclude them."""
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_stats,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus, path, n_buckets=4)
    bm25_index_delete(spark, path, [4])  # the "spark SPARK Spark" doc
    fresh = spark.createDataFrame(
        [(20, "spark sparkles brightly")], "doc_id long, text string"
    )
    bm25_index_add(fresh, path)
    st = bm25_index_stats(spark, path)
    assert st["pending_delete_batches"] == 1
    hits = {
        r.doc_id
        for r in bm25_index_topk(spark, path, "spark", k=10).collect()
    }
    assert 4 not in hits and 20 in hits
    # scores equal a fresh build over (corpus - doc4 + doc20)
    want_corpus = tiny_corpus.filter("doc_id <> 4").unionByName(fresh)
    fresh_path = str(tmp_path / "fresh")
    bm25_index_build(want_corpus, fresh_path, n_buckets=4)
    got = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    want = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(
            spark, fresh_path, "spark data", k=10
        ).collect()
    ]
    assert got == want and len(got) > 0
    # and the compaction after the add still folds the tombstone
    bm25_index_compact(spark, path, min_files_per_bucket=1)
    assert bm25_index_stats(spark, path)["pending_delete_batches"] == 0
    assert 4 not in {
        r.doc_id
        for r in bm25_index_topk(spark, path, "spark", k=10).collect()
    }


def test_bm25_index_upsert_and_cdc_apply(spark, tiny_corpus, tmp_path):
    """Upsert = version-scoped tombstone + append, O(batch): mixed
    update/insert batches must leave the index scoring exactly as a
    from-scratch build over the final corpus; bm25_index_apply_cdc
    maps I/U/D (last op per id by seq) onto delete + upsert."""
    from parq_tools_spark.operators.search import (
        bm25_index_apply_cdc,
        bm25_index_build,
        bm25_index_topk,
        bm25_index_upsert,
    )

    path = str(tmp_path / "bmidx")
    bm25_index_build(tiny_corpus, path, n_buckets=4)
    # doc 1 gets new text (update), doc 50 is new (insert)
    batch = spark.createDataFrame(
        [(1, "spark rewrites its own data"), (50, "fresh spark document")],
        "doc_id long, text string",
    )
    out = bm25_index_upsert(batch, path)
    assert (out["updated"], out["inserted"]) == (1, 1)

    final_corpus = tiny_corpus.filter("doc_id <> 1").unionByName(batch)
    fresh = str(tmp_path / "fresh")
    bm25_index_build(final_corpus, fresh, n_buckets=4)
    got = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(spark, path, "spark data", k=10).collect()
    ]
    want = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(spark, fresh, "spark data", k=10).collect()
    ]
    assert got == want and len(got) > 0

    # CDC batch: delete doc 2, update doc 3 twice (seq orders them),
    # insert doc 60
    changes = spark.createDataFrame(
        [
            (2, None, "D", 1),
            (3, "intermediate text", "U", 1),
            (3, "final data text", "U", 2),
            (60, "brand new data entry", "I", 1),
        ],
        "doc_id long, text string, op string, seq long",
    )
    res = bm25_index_apply_cdc(spark, path, changes, seq_col="seq")
    assert (res["deleted"], res["updated"], res["inserted"]) == (1, 1, 1)

    final2 = (
        final_corpus.filter("doc_id NOT IN (2, 3)")
        .unionByName(
            spark.createDataFrame(
                [(3, "final data text"), (60, "brand new data entry")],
                "doc_id long, text string",
            )
        )
    )
    fresh2 = str(tmp_path / "fresh_cdc")
    bm25_index_build(final2, fresh2, n_buckets=4)
    got2 = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(spark, path, "data text", k=10).collect()
    ]
    want2 = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(spark, fresh2, "data text", k=10).collect()
    ]
    assert got2 == want2 and len(got2) > 0

    # unordered duplicate ops without seq_col: loud error
    dup = spark.createDataFrame(
        [(5, "a", "I"), (5, "b", "U")], "doc_id long, text string, op string"
    )
    with pytest.raises(ValueError, match="seq_col"):
        bm25_index_apply_cdc(spark, path, dup)


def test_bm25_index_cdc_noop_tiebreak_and_guards(spark, tiny_corpus, tmp_path):
    """CDC semantics match merge.apply_cdc: a final 'D' for an id not
    in the index is a NO-OP (I-then-D short-lived rows), a
    same-sequence 'U' beats 'D', zero-token docs upsert cleanly (the
    _docs doc table sees them), and duplicate-id upsert batches
    raise."""
    from parq_tools_spark.operators.search import (
        bm25_index_apply_cdc,
        bm25_index_build,
        bm25_index_topk,
        bm25_index_upsert,
        bm25_index_stats,
        bm25_topk,
    )

    path = str(tmp_path / "bmidx")
    corpus = tiny_corpus.unionByName(
        spark.createDataFrame([(9, None)], "doc_id long, text string")
    )
    bm25_index_build(corpus, path, n_buckets=4)

    # short-lived row: I then D for an id the index never saw -> no-op
    ch = spark.createDataFrame(
        [(77, "ephemeral row", "I", 1), (77, None, "D", 2)],
        "doc_id long, text string, op string, seq long",
    )
    res = bm25_index_apply_cdc(spark, path, ch, seq_col="seq")
    assert res["deleted"] == 0 and res["delete_noops"] == 1
    assert res["updated"] == 0 and res["inserted"] == 0
    assert bm25_index_stats(spark, path)["n_docs"] == 5

    # same-seq tie: U beats D (the merge.apply_cdc convention)
    tie = spark.createDataFrame(
        [(3, None, "D", 7), (3, "data survives the tie", "U", 7)],
        "doc_id long, text string, op string, seq long",
    )
    res2 = bm25_index_apply_cdc(spark, path, tie, seq_col="seq")
    assert res2["deleted"] == 0 and res2["updated"] == 1
    hits = {
        r.doc_id
        for r in bm25_index_topk(spark, path, "survives", k=10).collect()
    }
    assert 3 in hits

    # zero-token doc (9) upserts as an UPDATE: _docs membership sees
    # it, n_docs stays constant and the new text is served
    res3 = bm25_index_upsert(
        spark.createDataFrame(
            [(9, "formerly empty now data")], "doc_id long, text string"
        ),
        path,
    )
    assert (res3["updated"], res3["inserted"]) == (1, 0)
    st = bm25_index_stats(spark, path)
    assert st["n_docs"] == 5
    # full-state check against a from-scratch scan
    final = (
        tiny_corpus.filter("doc_id <> 3")
        .unionByName(
            spark.createDataFrame(
                [(3, "data survives the tie"), (9, "formerly empty now data")],
                "doc_id long, text string",
            )
        )
    )
    got = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(spark, path, "data", k=10).collect()
    ]
    want = [
        (r.doc_id, r.score) for r in bm25_topk(final, "data", k=10).collect()
    ]
    assert got == want and len(got) > 0

    # duplicate ids in one upsert batch: loud
    with pytest.raises(ValueError, match="duplicate"):
        bm25_index_upsert(
            spark.createDataFrame(
                [(5, "a"), (5, "b")], "doc_id long, text string"
            ),
            path,
        )


def test_allow_missing_ignored_when_doc_table_exact(spark, tmp_path):
    """allow_missing exists only for legacy sidecar-less segments; on
    an index where every segment carries _docs the membership probe
    is exact, so the escape is IGNORED and a never-indexed id still
    raises (honoring it would decrement n_docs/sum_dl for docs that
    never existed, corrupting every later idf/avgdl)."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_delete,
        bm25_index_stats,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "bmidx")
    bm25_index_build(corpus, path, n_buckets=2)
    with pytest.raises(ValueError, match="not VISIBLE"):
        bm25_index_delete(spark, path, [1, 999], allow_missing=True)
    assert bm25_index_stats(spark, path)["n_docs"] == 2


def test_allow_missing_still_honored_on_legacy_segment(spark, tmp_path):
    """With a genuinely legacy (sidecar-less) segment a zero-token doc
    is invisible to the probe — the documented allow_missing case
    keeps working."""
    import glob
    import shutil

    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_delete,
        bm25_index_stats,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    path = str(tmp_path / "bmidx")
    bm25_index_build(corpus, path, n_buckets=2)
    for d in glob.glob(f"{path}/seg-*/_docs"):
        shutil.rmtree(d)
    with pytest.raises(ValueError, match="not VISIBLE"):
        bm25_index_delete(spark, path, [2])
    out = bm25_index_delete(spark, path, [2], allow_missing=True)
    assert out["deleted"] == 1
    assert bm25_index_stats(spark, path)["n_docs"] == 1


def test_bucket_task_splits_bit_identical_and_multifile(
    spark, sf_dir, tmp_path
):
    """bucket_task_splits salts only the postings-segment WRITE
    shuffle: a hot bucket splits across tasks (multiple files in its
    tbucket= directory) while serving reads whole bucket directories
    — scores bit-identical to the unsalted build; add inherits the
    stored setting."""
    import glob

    import pytest

    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
    )

    import os

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    k = F.col("doc_id")
    plain = str(tmp_path / "plain")
    salted = str(tmp_path / "salted")
    bm25_index_build(docs, plain, n_buckets=2)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        bm25_index_build(docs, salted, n_buckets=2,
                         bucket_task_splits=4)
    finally:
        spark.conf.set(coalesce_key, prev)
    assert bm25_index_stats(spark, salted)["params"][
        "bucket_task_splits"] == 4
    buckets = glob.glob(salted + "/seg-*/tbucket=*")
    assert buckets
    assert any(
        len(glob.glob(b + "/*.parquet")) > 1 for b in buckets
    ), "no bucket directory carries multiple files"

    def top(path):
        return [
            (r.doc_id, r.score)
            for r in bm25_index_topk(
                spark, path, "customer value table", k=10
            ).select("doc_id", "score").collect()
        ]

    assert top(plain) == top(salted)
    extra = docs.select((k + 10_000).alias("doc_id"), "text")
    bm25_index_add(extra, plain)
    bm25_index_add(extra, salted)
    assert top(plain) == top(salted)
    with pytest.raises(ValueError, match="bucket_task_splits"):
        bm25_index_build(docs, str(tmp_path / "bad"),
                         bucket_task_splits=0)


def test_auto_bucket_task_splits_measures_skew(
    spark, sf_dir, tmp_path, monkeypatch
):
    """bucket_task_splits='auto' derives the postings salt factor
    from the batch's hottest term bucket: with a tight per-task row
    budget the build splits the hot tbucket across files, scores stay
    bit-identical to the unsalted build, and the stored 'auto'
    re-measures on add."""
    import glob
    import os

    import pytest

    from parq_tools_spark.operators import _index_common
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
    )

    monkeypatch.setattr(_index_common, "AUTO_ROWS_PER_TASK", 50)
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    plain = str(tmp_path / "plain")
    autop = str(tmp_path / "auto")
    bm25_index_build(docs, plain, n_buckets=2)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        bm25_index_build(
            docs, autop, n_buckets=2, bucket_task_splits="auto"
        )
    finally:
        spark.conf.set(coalesce_key, prev)
    assert bm25_index_stats(spark, autop)["params"][
        "bucket_task_splits"] == "auto"
    buckets = glob.glob(autop + "/seg-*/tbucket=*")
    assert buckets and any(
        len(glob.glob(b + "/*.parquet")) > 1 for b in buckets
    ), "auto did not split the hot bucket"

    def top(path):
        return [
            (r.doc_id, r.score)
            for r in bm25_index_topk(
                spark, path, "customer value table", k=10
            ).select("doc_id", "score").collect()
        ]

    assert top(plain) == top(autop)
    extra = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    bm25_index_add(extra, plain)
    bm25_index_add(extra, autop)
    assert top(plain) == top(autop)

    with pytest.raises(ValueError, match="bucket_task_splits"):
        bm25_index_build(
            docs, str(tmp_path / "bad"), bucket_task_splits=True
        )


# ---------------------------------------------------------------------
# contamination_from_index (r15): decontamination served from the
# positional index — no corpus scan
# ---------------------------------------------------------------------


def _scan_containment(docs, k, threshold):
    """Inline scan-path reference with the INDEX's tokenization and
    the operator's PHRASE semantics: an eval gram (k tokens, or the
    whole sub-k doc) matches any doc containing it contiguously — so
    doc grams are built per distinct eval-gram LENGTH."""
    from functools import reduce

    from parq_tools_spark.operators.search import tokenize

    def grams_of(length_col_k):
        toks = tokenize(F.col("text"))
        n = F.size(toks)
        return (
            F.when(
                n >= length_col_k,
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), n - F.lit(length_col_k - 1)
                        ),
                        lambda i: F.concat_ws(
                            " ", F.slice(toks, i, length_col_k)
                        ),
                    )
                ),
            )
            .otherwise(F.array().cast("array<string>"))
        )

    toks = tokenize(F.col("text"))
    n = F.size(toks)
    egrams = (
        F.when(n >= k, grams_of(k))
        .when(n > 0, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.array().cast("array<string>"))
    )
    esh = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.explode(egrams).alias("g"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        {
            len(r.g.split(" "))
            for r in esh.select("g").distinct().collect()
        }
    )
    esize = esh.groupBy("eval_id").agg(F.count(F.lit(1)).alias("es"))
    csh = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select("doc_id", F.explode(grams_of(m)).alias("g"))
            for m in sizes
        ],
    )
    ov = (
        csh.join(esh, on="g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        ov.join(esize, "eval_id")
        .withColumn("c", F.col("n_overlap") / F.col("es"))
        .filter(F.col("c") >= threshold)
    )


def test_contamination_from_index_equals_scan(spark, sf_dir, tmp_path):
    """Index-served containment equals the scan-path computation over
    the same corpus and tokenization — including short (<k tokens)
    docs, whose whole token sequence is one gram."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        contamination_from_index,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    short = spark.createDataFrame(
        [(10**6, "stream merge"), (10**6 + 1, None)],
        "doc_id long, text string",
    )
    docs = docs.unionByName(short)
    path = str(tmp_path / "cfi")
    bm25_index_build(docs, path, n_buckets=8, store_positions=True)
    ev = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    got = sorted(
        (r.doc_id, r.eval_id, r.n_overlap, round(r.containment, 6))
        for r in contamination_from_index(
            spark, path, ev, k=3, threshold=0.6
        ).collect()
    )
    want = sorted(
        (r.doc_id, r.eval_id, r.n_overlap, round(r.c, 6))
        for r in _scan_containment(docs, 3, 0.6).collect()
    )
    assert got == want and got
    # every eval doc with >= 1 gram contains itself at 1.0
    self_pairs = [t for t in got if t[0] == t[1]]
    assert self_pairs and all(t[3] == 1.0 for t in self_pairs)


def test_contamination_from_index_guards_and_scope(
    spark, sf_dir, tmp_path
):
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        contamination_from_index,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text", "lang")
    ev = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    plain = str(tmp_path / "plain")
    bm25_index_build(docs, plain, n_buckets=8)
    with pytest.raises(ValueError, match="store_positions"):
        contamination_from_index(spark, plain, ev, k=3)

    path = str(tmp_path / "meta")
    bm25_index_build(
        docs, path, n_buckets=8, store_positions=True,
        store_cols=["lang"],
    )
    with pytest.raises(ValueError, match="max_eval_terms"):
        contamination_from_index(
            spark, path, ev, k=3, max_eval_terms=2
        )
    with pytest.raises(ValueError, match="k must be"):
        contamination_from_index(spark, path, ev, k=0)

    full = sorted(
        (r.doc_id, r.eval_id, r.n_overlap)
        for r in contamination_from_index(
            spark, path, ev, k=3, threshold=0.6
        ).collect()
    )
    lang = {
        r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()
    }
    scoped = sorted(
        (r.doc_id, r.eval_id, r.n_overlap)
        for r in contamination_from_index(
            spark, path, ev, k=3, threshold=0.6, where="lang == 'en'"
        ).collect()
    )
    assert scoped == [t for t in full if lang[t[0]] == "en"]
    allowed = docs.filter(F.col("lang") == "en").select("doc_id")
    via_ids = sorted(
        (r.doc_id, r.eval_id, r.n_overlap)
        for r in contamination_from_index(
            spark, path, ev, k=3, threshold=0.6, allowed_ids=allowed
        ).collect()
    )
    assert via_ids == scoped


def test_decontaminate_from_index_drops_flagged(spark, sf_dir, tmp_path):
    """The anti-join wrapper: survivors = corpus minus the ids
    contamination_from_index flags; the corpus side is never
    tokenized (only the final anti-join touches it)."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        contamination_from_index,
        decontaminate_from_index,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    path = str(tmp_path / "dcfi")
    bm25_index_build(docs, path, n_buckets=8, store_positions=True)
    ev = docs.filter(F.col("doc_id") % 25 == 0).selectExpr(
        "doc_id AS eval_id", "text"
    )
    flagged = {
        r.doc_id
        for r in contamination_from_index(
            spark, path, ev, k=3, threshold=0.6
        ).collect()
    }
    assert flagged
    kept = {
        r.doc_id
        for r in decontaminate_from_index(
            spark, path, docs, ev, k=3, threshold=0.6
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept == all_ids - flagged


def test_contamination_from_index_eval_id_col_names(
    spark, sf_dir, tmp_path
):
    """eval_id_col colliding with the pipeline's internal columns
    (term/gram) works via the internal alias; colliding with the
    INDEX id column is a loud up-front error (the output would carry
    both); decontaminate refuses a type-mismatched corpus id."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        contamination_from_index,
        decontaminate_from_index,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    path = str(tmp_path / "cfin")
    bm25_index_build(docs, path, n_buckets=8, store_positions=True)
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    base = sorted(
        (r.doc_id, r.eval_id, r.n_overlap)
        for r in contamination_from_index(
            spark, path,
            ev.selectExpr("doc_id AS eval_id", "text"),
            k=3, threshold=0.6,
        ).collect()
    )
    via_term = sorted(
        (r.doc_id, r.term, r.n_overlap)
        for r in contamination_from_index(
            spark, path,
            ev.selectExpr("doc_id AS term", "text"),
            eval_id_col="term", k=3, threshold=0.6,
        ).collect()
    )
    assert via_term == base and base
    with pytest.raises(ValueError, match="collides"):
        contamination_from_index(
            spark, path, ev, eval_id_col="doc_id", k=3
        )
    with pytest.raises(ValueError, match="join-compatible"):
        decontaminate_from_index(
            spark, path,
            docs.selectExpr("CAST(doc_id AS STRING) AS doc_id", "text"),
            ev.selectExpr("doc_id AS eval_id", "text"),
            k=3,
        )
