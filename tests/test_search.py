"""BM25 keyword search (operators/search.py): hand-computed scores,
tokenizer contract, and the no-full-index plan shape."""

import math

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
