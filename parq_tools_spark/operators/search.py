"""Keyword search over a document corpus: BM25 ranking and corpus
term statistics (beyond-reference; the reference has no text search —
this rounds out the training-data surface where `operators/dedup.py`
finds near-duplicates and `operators/text.py` scores quality:
retrieving the documents that MATCH a query is the remaining
primitive an LLM-data pipeline needs, e.g. for decontamination
spot-checks, corpus exploration, and targeted sampling).

Spark-first shape (Robertson/Sparck-Jones BM25, the Lucene
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant that never goes
negative):

- **tokenization** is one codegen'd expression (lower + regexp split
  + filter) shared verbatim with the DuckDB oracle;
- **corpus statistics** (per-term document frequency, per-document
  length, average length) are plain aggregations — and for a query
  only the HANDFUL of query-term df rows are needed, so scoring never
  materializes a full inverted index;
- **scoring** filters the exploded postings to the query terms FIRST
  (map-side, before any shuffle), aggregates term frequencies per
  (doc, term), broadcast-joins the tiny idf table, and reduces to one
  score row per matching document. The only shuffle carries postings
  that match the query — at 100 TB that is O(matching docs x query
  terms), not O(corpus tokens).

Scores are rounded to the registry's 1e-6 grid and ranked by
``(score desc, doc_id asc)`` — the portable total order every ANN
operator here uses, so results are bit-stable across engines.
"""

from __future__ import annotations

import math
import re
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tokenize", "term_stats", "bm25_topk", "bm25_topk_batch"]

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(text: Union[str, Column]) -> Column:
    """Lowercased alphanumeric terms of a string column, in order,
    empty strings dropped. One codegen'd expression; the DuckDB
    oracle spells the identical ``list_filter(string_split_regex(
    lower(x), '[^a-z0-9]+'), t -> t <> '')``."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != ""
    )


def term_stats(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-term corpus statistics: ``(term, df)`` — the number of
    DISTINCT ``id_col`` documents containing the term at least once
    (a corpus carrying duplicate rows for one document id counts it
    once, so the signature's id parameter is honored, not decorative).
    With ``terms`` given, the explode is filtered to those terms
    map-side first (the scoring path); without it this is the full
    vocabulary scan (one shuffle keyed by term — the classic
    build-an-index pass).
    """
    toks = F.array_distinct(
        tokenize(F.coalesce(F.col(text_col), F.lit("")))
    )
    if terms is not None:
        toks = F.array_intersect(
            toks, F.array(*[F.lit(t) for t in terms])
        )
    return (
        corpus.select(F.col(id_col).alias("_id"), F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("_id").alias("df"))
    )


def _query_terms(query: Union[str, Sequence[str]]) -> list:
    """Sorted distinct terms, TOKENIZED the same way as the corpus in
    both forms: a list element like ``'data-base'`` splits into
    ``data``/``base`` exactly like the string form would — otherwise
    a term carrying any non-alphanumeric character could never match
    a corpus token and would silently contribute nothing."""
    parts = [query] if isinstance(query, str) else [str(t) for t in query]
    terms = sorted(
        {
            t
            for p in parts
            for t in re.split(_TOKEN_SPLIT, p.lower())
            if t != ""
        }
    )
    if not terms:
        raise ValueError("empty query")
    return terms


def _corpus_stats(corpus: DataFrame, text_col: str, terms: list):
    """``(n_docs, avgdl, {term: idf})`` in ONE corpus pass: count,
    average length and every query term's document frequency ride the
    same aggregate, so the stats cost one tokenization scan instead
    of two. NULL text counts as a zero-length document (the oracle's
    ``sum(len)/count(*)`` semantics — the row stays in N and in the
    avgdl denominator, contributes no tokens and no df)."""
    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    aggs = [F.count(F.lit(1)), F.avg(F.size(toks))] + [
        F.sum(F.array_contains(toks, t).cast("int")).alias(f"_df{i}")
        for i, t in enumerate(terms)
    ]
    row = corpus.select(*aggs).first()
    n_docs = row[0]
    if not n_docs:
        raise ValueError("empty corpus")
    avgdl = float(row[1]) or 1.0
    # Lucene-style idf: strictly positive, smooth at df in {0, N}
    idf = {
        t: math.log(
            1.0
            + (n_docs - (row[i + 2] or 0) + 0.5) / ((row[i + 2] or 0) + 0.5)
        )
        for i, t in enumerate(terms)
    }
    return n_docs, avgdl, idf


def bm25_topk(
    corpus: DataFrame,
    query: Union[str, Sequence[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25.

    ``query`` is a string or a term list — both tokenized exactly like
    the corpus; duplicate query terms count once (bag-of-terms query,
    the standard formulation). NULL-text documents count as
    zero-length (in N and avgdl, never matching). Returns
    ``(doc_id, score, rank)``, rank 1 = best, ties broken by
    ascending id.

    Cost shape: ONE tiny driver-side aggregate (N + avgdl + the query
    terms' dfs in a single pass — O(|query|) columns, not
    O(vocabulary)) and ONE map-only scoring pass: each row's per-term
    frequency is an array expression (``size(filter(toks, = term))``),
    so the score is computed IN the scan with no explode and NO
    shuffle at all — the only cross-partition movement is the top-k
    merge (``TakeOrderedAndProject``, k rows per task). The
    explode+aggregate shape lives in :func:`bm25_topk_batch`, where
    many queries amortize it.
    """
    terms = _query_terms(query)
    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    n_docs, avgdl, idf = _corpus_stats(corpus, text_col, terms)
    scale = float(10**round_to)
    dl = F.size(toks)
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    # per-term tf as an array expression: |terms| linear passes over
    # the token array inside the scan — no explode, no shuffle. Terms
    # are sorted, so the left-to-right sum order is deterministic.
    total = F.lit(0.0)
    any_match = F.lit(False)
    for t in terms:
        tf_t = F.size(F.filter(toks, lambda x: x == F.lit(t))).cast(
            "double"
        )
        any_match = any_match | (tf_t > 0)
        total = total + F.when(
            tf_t > 0,
            F.lit(idf[t]) * (tf_t * F.lit(k1 + 1.0)) / (tf_t + norm),
        ).otherwise(F.lit(0.0))
    scored = (
        corpus.select(
            F.col(id_col),
            (
                F.floor(total * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
            ).alias("score"),
            any_match.alias("_m"),
        )
        # matched docs stay even if their tiny score rounds to 0.0
        # (what the explode-form and the SQL oracle both produce)
        .filter(F.col("_m"))
        .drop("_m")
    )
    # orderBy().limit(k) plans as TakeOrderedAndProject — each task
    # keeps its local top-k and only k rows per partition reach the
    # driver-side merge. A global rank window here would instead drag
    # EVERY matching document into one partition; the row_number runs
    # after the limit, over at most k rows.
    topk = scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )


def bm25_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` per query for a whole QUERIES DataFrame — the
    many-queries form: ONE corpus pass serves every query instead of
    a rescan per query. Returns ``(query_id, doc_id, score, rank)``.

    Shape: queries are collected (they are the small side, like every
    ANN query set here), their term UNION drives one map-side postings
    filter + one (doc, term) aggregation, a broadcast (query, term,
    idf) table fans each posting out to the queries containing its
    term, and a per-query window ranks — partitioned by query, so
    top-k never funnels into a single task. At 100 TB the one corpus
    scan amortizes across the full query batch; everything else is
    O(matching postings x queries-per-term).
    """
    q_rows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_col).alias("q")
    ).collect()
    if not q_rows:
        raise ValueError("no queries")
    q_terms = {}
    for r in q_rows:
        if r.qid in q_terms:
            raise ValueError(
                f"duplicate {query_id_col}={r.qid!r} in queries — ids "
                "must be unique (a later row would silently shadow the "
                "earlier query)"
            )
        try:
            q_terms[r.qid] = _query_terms(str(r.q))
        except ValueError:
            raise ValueError(
                f"empty query for {query_id_col}={r.qid!r}"
            ) from None
    all_terms = sorted({t for ts in q_terms.values() for t in ts})

    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    n_docs, avgdl, idf = _corpus_stats(corpus, text_col, all_terms)
    spark = corpus.sparkSession
    qt = spark.createDataFrame(
        [
            (qid, t, idf[t])
            for qid, ts in q_terms.items()
            for t in ts
        ],
        ["qid", "term", "idf"],
    )

    scale = float(10**round_to)
    postings = corpus.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        F.explode(F.filter(toks, lambda t: t.isin(*all_terms))).alias(
            "term"
        ),
    )
    tf = postings.groupBy(id_col, "_dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(avgdl)
    )
    contrib = (
        F.col("idf") * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)
    )
    scored = (
        tf.join(F.broadcast(qt), on="term")
        .select(F.col("qid"), F.col(id_col), contrib.alias("_c"))
        .groupBy("qid", id_col)
        .agg(
            (F.floor(F.sum("_c") * F.lit(scale) + F.lit(0.5)) / F.lit(scale))
            .alias("score")
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(query_id_col), id_col, "score", "rank")
    )
