"""Hybrid retrieval — fuse keyword (BM25) and vector (cosine) rankings.

Beyond-reference surface: the reference (elphick/parq-tools) has no
retrieval layer at all; this module composes the oracled BM25 legs
(``operators/search.py``) with cosine vector legs
(``operators/similarity.py``) into the fusion every RAG / training-data
retrieval stack runs — Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher, SIGIR 2009) and min-max-normalized weighted score fusion
(CombSUM, Fox & Shaw, TREC-2).

Scale shape: both legs are top-``n_candidates`` retrievals — the text
leg is a map-only scored scan + ``TakeOrderedAndProject`` (or an index
read), the vector leg broadcasts the query vector(s) and never
shuffles the corpus VECTORS (only narrow ``(query, id, sim)`` triples
move, two-phase-pruned to ``n_candidates`` per input partition in the
batch path before the per-query rank). Fusion then operates on at
most ``legs x n_candidates`` rows per query: a full-outer join
(single-query) or a tiny keyed aggregate (batch) — the corpus is
never touched again. At 100 TB the fusion stage is O(k), not O(data).

Determinism (what makes these oracle-able in DuckDB):
- leg ranks derive from ROUNDED scores (the legs already floor-round to
  ``10^-round_to``) with ascending-id tie-breaks;
- the RRF score is a function of INTEGER ranks only, summed in fixed
  leg order (``w_t/(K+r_t) + w_v/(K+r_v)``, one expression — no
  aggregate reordering), so it is bit-reproducible anywhere IEEE
  doubles are;
- min-max normalization divides two already-rounded doubles, again in
  fixed expression order.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rrf_fuse",
    "hybrid_topk",
    "hybrid_topk_batch",
    "hybrid_index_topk",
    "hybrid_index_topk_batch",
]


def _round_col(c: Column, round_to: int) -> Column:
    scale = float(10**round_to)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def _fuse_joined(
    both: DataFrame,
    id_col: str,
    k: int,
    method: str,
    rrf_k: int,
    w_text: float,
    round_to: int,
    group_cols: Sequence[str] = (),
    keep_leg_ranks: bool = True,
) -> DataFrame:
    """Shared fusion tail over the full-outer-joined legs — the ONE
    definition of the hybrid score, so the scan paths, the index
    paths and the batch variants can never drift in arithmetic.

    ``both`` carries ``group_cols + (id_col, _tscore, text_rank,
    _vscore, vec_rank)``; scores/ranks are NULL where a leg did not
    retrieve the doc.

    ``method="rrf"``: ``w_text/(rrf_k+text_rank) +
    (1-w_text)/(rrf_k+vec_rank)`` with missing legs coalesced to 0 —
    bit-identical to :func:`rrf_fuse`'s sorted-leg fold (the fold's
    ``(0.0 + c_text) + c_vec`` is the same IEEE expression, and a
    positive contribution plus literal 0.0 is exact).

    ``method="wsum"``: per-group min-max normalization of each leg's
    scores as NULL-ignoring window aggregates over the JOINED
    relation (min/max over the joined column equal min/max over the
    leg because the full-outer join keeps every leg row — and the
    legs' heavy scans stay single-execution; separate ``.agg()``
    branches would re-run them, Spark does not dedupe common
    subplans). The window runs over <= 2*n_candidates fused rows per
    group, never the corpus.
    """
    gcols = list(group_cols)
    w_vec = 1.0 - w_text
    if method == "rrf":
        fused_score = F.coalesce(
            F.lit(w_text)
            / (F.lit(float(rrf_k)) + F.col("text_rank").cast("double")),
            F.lit(0.0),
        ) + F.coalesce(
            F.lit(w_vec)
            / (F.lit(float(rrf_k)) + F.col("vec_rank").cast("double")),
            F.lit(0.0),
        )
    else:
        w_all = Window.partitionBy(*gcols)
        tlo, thi = (
            F.min("_tscore").over(w_all),
            F.max("_tscore").over(w_all),
        )
        vlo, vhi = (
            F.min("_vscore").over(w_all),
            F.max("_vscore").over(w_all),
        )
        fused_score = F.coalesce(
            F.lit(w_text) * _minmax(F.col("_tscore"), tlo, thi),
            F.lit(0.0),
        ) + F.coalesce(
            F.lit(w_vec) * _minmax(F.col("_vscore"), vlo, vhi),
            F.lit(0.0),
        )
    leg_cols = ["text_rank", "vec_rank"] if keep_leg_ranks else []
    scored = both.select(
        *gcols,
        F.col(id_col),
        *leg_cols,
        _round_col(fused_score, round_to).alias("score"),
    )
    if gcols:
        w = Window.partitionBy(*gcols).orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    # single query: orderBy().limit() plans as TakeOrderedAndProject
    topk = scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    rrf_k: int = 60,
    weights: Optional[Sequence[float]] = None,
    group_cols: Sequence[str] = (),
    round_to: int = 9,
) -> DataFrame:
    """Reciprocal Rank Fusion of N ranked lists.

    Each input carries ``group_cols + (id_col, rank)``; a document's
    fused score is ``sum_i weights[i] / (rrf_k + rank_i)`` over the
    lists that retrieved it (missing lists contribute 0 — the standard
    RRF convention). Returns ``group_cols + (id_col, score, rank)``,
    rank 1 = best per group, ties broken by ascending id.

    The per-document sum folds ``(leg, contribution)`` structs in
    sorted-leg order (the ``_det_contrib_sum`` pattern from
    ``operators/search.py``), so the float result never depends on
    aggregation order. Each list is a top-N, so the unioned relation is
    at most ``N x len(rankings)`` rows per group — the groupBy here is
    a small shuffle of id/rank pairs, never of corpus data.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"{len(weights)} weights for {len(rankings)} rankings"
        )
    gcols = list(group_cols)
    tagged = []
    for i, (r, w_i) in enumerate(zip(rankings, weights)):
        tagged.append(
            r.select(
                *gcols,
                F.col(id_col),
                F.lit(i).alias("_leg"),
                (
                    F.lit(float(w_i))
                    / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))
                ).alias("_contrib"),
            )
        )
    from functools import reduce

    unioned = reduce(DataFrame.unionByName, tagged)
    det_sum = F.aggregate(
        F.sort_array(
            F.collect_list(F.struct(F.col("_leg"), F.col("_contrib")))
        ),
        F.lit(0.0),
        lambda acc, s: acc + s["_contrib"],
    )
    fused = unioned.groupBy(*gcols, id_col).agg(
        _round_col(det_sum, round_to).alias("score")
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*gcols, id_col, "score", "rank")
    )


def _vector_leg(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    n: int,
    id_col: str,
    vec_col: str,
    sim_round_to: int,
) -> DataFrame:
    """Top-``n`` by cosine against one literal query vector:
    map-only similarity expression inside the scan, rounded BEFORE
    ranking (rank ties must not hinge on the last ulp), then
    ``orderBy().limit(n)`` — ``TakeOrderedAndProject``, no global
    sort, no shuffle of vectors."""
    from parq_tools_spark.operators.similarity import (
        cosine_similarity_col,
    )

    qv = F.array(*[F.lit(float(x)) for x in query_vec]).cast(
        "array<double>"
    )
    sims = embeddings.select(
        F.col(id_col),
        _round_col(
            cosine_similarity_col(F.col(vec_col), qv), sim_round_to
        ).alias("cosine_sim"),
    )
    topn = sims.orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    ).limit(n)
    w = Window.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return topn.withColumn("rank", F.row_number().over(w))


def _minmax(score: Column, lo: Column, hi: Column) -> Column:
    """Min-max normalize an already-rounded score to [0, 1]; a
    degenerate leg (all scores equal) normalizes to 1.0 — every
    retrieved doc keeps full leg weight rather than all collapsing
    to 0. NULL (doc missing from this leg) stays NULL in every
    branch, so the caller's coalesce-to-0 still applies when the leg
    is degenerate."""
    return (
        F.when(score.isNull(), F.lit(None).cast("double"))
        .when(hi > lo, (score - lo) / (hi - lo))
        .otherwise(F.lit(1.0))
    )


def hybrid_topk(
    docs: DataFrame,
    query: Union[str, Sequence[str]],
    query_vec: Sequence[float],
    embeddings: Optional[DataFrame] = None,
    k: int = 10,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = 60,
    w_text: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
    sim_round_to: int = 6,
    round_to: int = 9,
) -> DataFrame:
    """Hybrid top-``k``: BM25 over ``docs`` fused with cosine over
    ``embeddings`` (ids shared across the two tables; ``embeddings``
    defaults to ``docs`` itself when it carries the vector column).

    ``method="rrf"``: score = ``w_text/(rrf_k + text_rank) +
    (1-w_text)/(rrf_k + vec_rank)`` — rank-only, the robust default
    (no score-scale tuning). ``method="wsum"``: min-max normalizes
    each leg's scores over its candidate list, then
    ``w_text * bm25_norm + (1-w_text) * cos_norm`` (CombSUM); a doc
    missing from a leg contributes 0 for that leg either way.

    Returns ``(id_col, text_rank, vec_rank, score, rank)`` — leg ranks
    are kept (NULL when a leg did not retrieve the doc) because every
    downstream debugging question is "which leg put this here?".

    Both legs retrieve ``n_candidates`` (fusion depth; recall of docs
    ranked just past k in both legs is why depth > k matters), so the
    fusion join touches at most ``2 x n_candidates`` rows.
    """
    if method not in ("rrf", "wsum"):
        raise ValueError("method must be 'rrf' or 'wsum'")
    if not 0.0 <= w_text <= 1.0:
        raise ValueError("w_text must be in [0, 1]")
    from parq_tools_spark.operators.search import bm25_topk

    if embeddings is None:
        embeddings = docs
        vec_id_col = id_col

    text = bm25_topk(
        docs,
        query,
        k=n_candidates,
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
        round_to=sim_round_to,
    ).select(
        F.col(id_col),
        F.col("score").alias("_tscore"),
        F.col("rank").alias("text_rank"),
    )
    vec = _vector_leg(
        embeddings, query_vec, n_candidates, vec_id_col, vec_col,
        sim_round_to,
    ).select(
        F.col(vec_id_col).alias(id_col),
        F.col("cosine_sim").alias("_vscore"),
        F.col("rank").alias("vec_rank"),
    )
    both = text.join(vec, on=id_col, how="full_outer")
    return _fuse_joined(
        both, id_col, k, method, rrf_k, w_text, round_to
    )


def hybrid_index_topk(
    spark,
    bm25_path: str,
    ann_path: str,
    query: Union[str, Sequence[str]],
    query_vec: Sequence[float],
    k: int = 10,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = 60,
    w_text: float = 0.5,
    nprobe: int = 2,
    refine: Optional[int] = None,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 9,
    bm25_version: Optional[int] = None,
    ann_version: Optional[int] = None,
    allowed_ids=None,
    where: Optional[str] = None,
) -> DataFrame:
    """Hybrid retrieval served entirely FROM the persisted
    indexes — the serving shape: the text leg reads the query terms'
    postings from the BM25 index (term-bucket partition pruning, no
    corpus scan), the vector leg reads the probed cells' PQ codes from
    the ANN index (cell partition pruning, no embedding scan), and the
    fusion joins 2 x ``n_candidates`` rows. At 100 TB neither leg
    touches the data — total cost is O(query-term postings +
    probed-cell codes), which is what makes hybrid search a serving
    call instead of two batch jobs.

    ``method`` is the same knob as :func:`hybrid_topk`: ``"rrf"``
    (rank arithmetic) or ``"wsum"`` (per-leg min-max score fusion —
    the index legs both emit scores: BM25's rounded score and the
    ANN index's ``pq_score``, which under the lossless configuration
    IS the rounded cosine the scan path normalizes).

    ``refine=R`` passes through to the vector leg
    (:func:`~parq_tools_spark.operators.ann_index.ann_index_topk`,
    needs ``store_vectors=True``): the leg's top-``n_candidates``
    then come from EXACT rounded cosine over the top-R ADC
    candidates, so a LOSSY (compressed) index serves scan-quality
    hybrid results — with ``R`` large enough that the exact
    re-ranked candidates match brute force, the fused output equals
    the scan-path hybrid under BOTH methods even though the index
    stores only a fraction of the vectors' bytes as codes.

    The two indexes share one id space by contract (the same
    ``docs``/``embeddings`` pairing :func:`hybrid_topk` assumes); the
    output id column is the BM25 index's. The vector leg passes
    ``exclude_self=False`` — hybrid query ids are not corpus ids, so
    the ANN path's self-exclusion predicate is skipped entirely (it
    would otherwise hide a corpus vector that happens to share the
    id, or fail outright on a string-id index). ``bm25_version=`` /
    ``ann_version=`` time-travel each leg independently (see the
    indexes' ``keep_versions``). Returns ``(id_col, text_rank,
    vec_rank, score, rank)`` — the same fused score expression as
    :func:`hybrid_topk` (one shared ``_fuse_joined`` definition), so
    with a losslessly-configured ANN index the result is
    bit-identical to the scan-path hybrid under EITHER method.

    ``allowed_ids`` threads the shared pre-rank candidate filter
    (:func:`~parq_tools_spark.operators._index_common.
    apply_allowed_ids`) into BOTH legs, so each leg's
    ``n_candidates`` and the fused ``k`` are correct under the
    filter — post-filtering the fused result would under-return and
    skew the rank arithmetic. The two indexes share one id space by
    contract, so one allowed set scopes both. ``where`` threads the
    same way (both indexes must be built with ``store_cols`` covering
    the predicate's columns — the docs/embeddings pairing shares its
    metadata by the same contract)."""
    if method not in ("rrf", "wsum"):
        raise ValueError("method must be 'rrf' or 'wsum'")
    if not 0.0 <= w_text <= 1.0:
        raise ValueError("w_text must be in [0, 1]")
    from pyspark.sql import types as T

    from parq_tools_spark.operators._index_common import (
        normalize_allowed_ids,
    )
    from parq_tools_spark.operators.ann_index import ann_index_topk
    from parq_tools_spark.operators.search import bm25_index_topk

    # materialized ONCE: both legs consume the same object, and a
    # one-shot iterable exhausted by the BM25 leg would hand the ANN
    # leg an empty (valid!) filter that drops every vector candidate
    allowed_ids = normalize_allowed_ids(allowed_ids)

    text = bm25_index_topk(
        spark,
        bm25_path,
        query,
        k=n_candidates,
        k1=k1,
        b=b,
        version=bm25_version,
        allowed_ids=allowed_ids,
        where=where,
    )
    id_col = text.columns[0]
    text = text.select(
        F.col(id_col),
        F.col("score").alias("_tscore"),
        F.col("rank").alias("text_rank"),
    )
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField(
                    "embedding", T.ArrayType(T.DoubleType())
                ),
            ]
        ),
    )
    vec_raw = ann_index_topk(
        spark,
        ann_path,
        qdf,
        k=n_candidates,
        nprobe=nprobe,
        query_id_col="query_id",
        query_vec_col="embedding",
        version=ann_version,
        exclude_self=False,
        refine=max(refine, n_candidates) if refine is not None else None,
        allowed_ids=allowed_ids,
        where=where,
    )
    ann_id_col = vec_raw.columns[1]
    # with refine the leg's score column is the exact rounded cosine
    vec_score = "pq_score" if refine is None else "cosine_sim"
    vec = vec_raw.select(
        F.col(ann_id_col).alias(id_col),
        F.col(vec_score).alias("_vscore"),
        F.col("rank").alias("vec_rank"),
    )
    both = text.join(vec, on=id_col, how="full_outer")
    return _fuse_joined(
        both, id_col, k, method, rrf_k, w_text, round_to
    )


def hybrid_topk_batch(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = 60,
    w_text: float = 0.5,
    query_id_col: str = "query_id",
    query_col: str = "query",
    query_vec_col: str = "query_vec",
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
    sim_round_to: int = 6,
    round_to: int = 9,
) -> DataFrame:
    """Hybrid retrieval for a whole queries DataFrame
    (``query_id, query text, query vector``): ONE corpus pass serves
    every text leg (:func:`bm25_topk_batch`), ONE embeddings pass
    serves every vector leg (queries broadcast, per-query rounded-sim
    rank window), then the shared fusion groups by query id
    (``method`` as in :func:`hybrid_topk` — per-query min-max
    normalization for ``"wsum"``). Returns ``(query_id, id_col,
    score, rank)``.
    """
    if method not in ("rrf", "wsum"):
        raise ValueError("method must be 'rrf' or 'wsum'")
    if not 0.0 <= w_text <= 1.0:
        raise ValueError("w_text must be in [0, 1]")
    from parq_tools_spark.operators.search import bm25_topk_batch

    text = bm25_topk_batch(
        docs,
        queries.select(query_id_col, query_col),
        k=n_candidates,
        query_id_col=query_id_col,
        query_col=query_col,
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
        round_to=sim_round_to,
    ).select(
        query_id_col,
        id_col,
        F.col("score").alias("_tscore"),
        F.col("rank").alias("text_rank"),
    )

    from parq_tools_spark.operators.similarity import (
        cosine_similarity_col,
    )

    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("_qvec"),
    )
    sims = embeddings.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(vec_id_col).alias(id_col),
        _round_col(
            cosine_similarity_col(F.col(vec_col), F.col("_qvec")),
            sim_round_to,
        ).alias("cosine_sim"),
    )
    # two-phase top-n: a straight per-query rank window would drag
    # EVERY (doc, query, sim) triple of one query into a single task
    # (n_queries tasks each sorting the whole corpus's rows — the
    # skew/OOM shape at scale). Phase 1 ranks within
    # (query, input-partition) slices — any global top-n row is
    # necessarily in its slice's top-n, so the prefilter is lossless —
    # leaving <= n_candidates * n_partitions rows per query for the
    # tiny phase-2 global rank. Only narrow triples ever shuffle; the
    # corpus vectors never do.
    w_local = Window.partitionBy(
        query_id_col, F.spark_partition_id()
    ).orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    pruned = (
        sims.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= n_candidates)
        .drop("_lr")
    )
    wv = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    vec = (
        pruned.withColumn("rank", F.row_number().over(wv))
        .filter(F.col("rank") <= n_candidates)
        .select(
            query_id_col,
            id_col,
            F.col("cosine_sim").alias("_vscore"),
            F.col("rank").alias("vec_rank"),
        )
    )
    return _fuse_batch_legs(
        text, vec, query_id_col, id_col, k, method, rrf_k, w_text,
        round_to,
    )


def _fuse_batch_legs(
    text: DataFrame,
    vec: DataFrame,
    query_id_col: str,
    id_col: str,
    k: int,
    method: str,
    rrf_k: int,
    w_text: float,
    round_to: int,
) -> DataFrame:
    """Batch fusion tail shared by the scan- and index-served batch
    paths. Legs carry ``(query_id, id, _tscore/_vscore,
    text_rank/vec_rank)``.

    ``method="rrf"`` goes through :func:`rrf_fuse` — a union +
    keyed aggregate of the per-query top-n rows, NO join at all (the
    fused relation is at most ``2 * n_candidates`` rows per query,
    and a full-outer join here would plan as a SortMergeJoin since
    full outer cannot broadcast; the union-aggregate shape is one
    small shuffle instead). ``rrf_fuse``'s sorted-leg fold is
    bit-identical to :func:`_fuse_joined`'s coalesce expression, so
    the two fusion shapes can never disagree on values.

    ``method="wsum"`` needs each leg's scores for the per-query
    min-max, so it full-outer joins on (query, id) — two per-query
    top-n legs, plan-locked tiny — and normalizes over the joined
    relation (:func:`_fuse_joined`)."""
    if method == "rrf":
        return rrf_fuse(
            [
                text.select(
                    query_id_col,
                    id_col,
                    F.col("text_rank").alias("rank"),
                ),
                vec.select(
                    query_id_col,
                    id_col,
                    F.col("vec_rank").alias("rank"),
                ),
            ],
            id_col=id_col,
            k=k,
            rrf_k=rrf_k,
            weights=[w_text, 1.0 - w_text],
            group_cols=[query_id_col],
            round_to=round_to,
        )
    both = text.join(vec, on=[query_id_col, id_col], how="full_outer")
    return _fuse_joined(
        both,
        id_col,
        k,
        method,
        rrf_k,
        w_text,
        round_to,
        group_cols=[query_id_col],
        keep_leg_ranks=False,
    )


def hybrid_index_topk_batch(
    spark,
    bm25_path: str,
    ann_path: str,
    queries: DataFrame,
    k: int = 10,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = 60,
    w_text: float = 0.5,
    nprobe: int = 2,
    refine: Optional[int] = None,
    query_id_col: str = "query_id",
    query_col: str = "query",
    query_vec_col: str = "query_vec",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 9,
    bm25_version: Optional[int] = None,
    ann_version: Optional[int] = None,
    max_queries: int = 10_000,
    allowed_ids=None,
    where: Optional[str] = None,
) -> DataFrame:
    """Batched hybrid retrieval served entirely FROM the persisted
    indexes — the offline-retrieval / RAG-eval shape: thousands of
    queries, zero corpus scans. The text legs are ONE bucket-pruned
    postings read fanned out by a broadcast (query, term, idf) table
    (:func:`~parq_tools_spark.operators.search.bm25_index_topk_batch`);
    the vector legs are ONE cell-pruned codes read over the union of
    all probe lists (:func:`~parq_tools_spark.operators.ann_index.
    ann_index_topk`, ``exclude_self=False`` — query ids are not
    corpus ids). Fusion is the shared :func:`_fuse_joined` grouped by
    query id, so with a losslessly-configured ANN index the result is
    bit-identical to the scan-path :func:`hybrid_topk_batch` under
    either ``method``. At 100 TB total cost is O(sum of query-term
    postings + probed-cell codes) — the whole job never touches
    ``docs`` or ``embeddings``.

    Both legs collect the queries to the driver (the text leg for
    term/idf tables, the vector leg for ADC tables); ``max_queries``
    is the vector leg's documented collect cap, passed through to
    :func:`~parq_tools_spark.operators.ann_index.ann_index_topk` —
    raise it deliberately for a larger eval set, or chunk the queries
    DataFrame across calls. ``refine=R`` (index built with
    ``store_vectors=True``) exact-re-ranks each vector leg's top-R
    ADC candidates, giving scan-quality results from a lossy
    compressed index (see :func:`hybrid_index_topk`).

    ``allowed_ids`` / ``where`` thread the shared pre-rank candidate
    filters into both legs for every query in the batch (see
    :func:`hybrid_index_topk`).

    Returns ``(query_id, <bm25 id col>, score, rank)``."""
    if method not in ("rrf", "wsum"):
        raise ValueError("method must be 'rrf' or 'wsum'")
    if not 0.0 <= w_text <= 1.0:
        raise ValueError("w_text must be in [0, 1]")
    from parq_tools_spark.operators._index_common import (
        normalize_allowed_ids,
    )
    from parq_tools_spark.operators.ann_index import ann_index_topk
    from parq_tools_spark.operators.search import bm25_index_topk_batch

    # one materialization for both legs (see hybrid_index_topk)
    allowed_ids = normalize_allowed_ids(allowed_ids)

    text_raw = bm25_index_topk_batch(
        spark,
        bm25_path,
        queries.select(query_id_col, query_col),
        k=n_candidates,
        query_id_col=query_id_col,
        query_col=query_col,
        k1=k1,
        b=b,
        version=bm25_version,
        allowed_ids=allowed_ids,
        where=where,
    )
    id_col = text_raw.columns[1]
    text = text_raw.select(
        F.col(query_id_col),
        F.col(id_col),
        F.col("score").alias("_tscore"),
        F.col("rank").alias("text_rank"),
    )
    vec_raw = ann_index_topk(
        spark,
        ann_path,
        queries,
        k=n_candidates,
        nprobe=nprobe,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        version=ann_version,
        exclude_self=False,
        max_queries=max_queries,
        refine=max(refine, n_candidates) if refine is not None else None,
        allowed_ids=allowed_ids,
        where=where,
    )
    ann_id_col = vec_raw.columns[1]
    vec_score = "pq_score" if refine is None else "cosine_sim"
    vec = vec_raw.select(
        F.col("query_id").alias(query_id_col),
        F.col(ann_id_col).alias(id_col),
        F.col(vec_score).alias("_vscore"),
        F.col("rank").alias("vec_rank"),
    )
    return _fuse_batch_legs(
        text, vec, query_id_col, id_col, k, method, rrf_k, w_text,
        round_to,
    )
