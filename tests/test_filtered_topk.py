"""Filtered top-k across the retrieval surface: the ``allowed_ids``
pre-rank candidate filter on ``ann_index_topk``,
``bm25_index_topk``/``_batch`` and the hybrid index paths (shared
implementation: ``_index_common.apply_allowed_ids``).

The contract under test everywhere: the filter scopes CANDIDATES
before ranking — the returned k is the top-k AMONG the allowed ids
(post-filtering a k-sized result under-returns) — while index
statistics (BM25 idf/avgdl, the ANN quantization model and probe
lists) stay index-wide."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")


def _rerank(rows, allowed, k, score_key):
    """Reference semantics: take the UNFILTERED scored candidates,
    keep the allowed ones, re-rank per query by (score desc, id asc),
    cut at k."""
    out = {}
    for r in rows:
        if r["vec_id" if "vec_id" in r else "doc_id"] in allowed:
            out.setdefault(r.get("query_id"), []).append(r)
    want = []
    for qid, cand in out.items():
        cand.sort(
            key=lambda r: (
                -r[score_key],
                r["vec_id" if "vec_id" in r else "doc_id"],
            )
        )
        for rank, r in enumerate(cand[:k], start=1):
            want.append(
                (
                    qid,
                    r["vec_id" if "vec_id" in r else "doc_id"],
                    r[score_key],
                    rank,
                )
            )
    return sorted(want)


def test_ann_filtered_equals_rerank_of_unfiltered(spark, emb, tmp_path):
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )

    path = str(tmp_path / "ann")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 3)
    allowed = {
        r.vec_id for r in emb.filter(F.col("vec_id") % 3 == 0).collect()
    }

    # every probed candidate, unfiltered (k larger than any cell)
    full = ann_index_topk(spark, path, qs, k=1_000_000, nprobe=2)
    want = _rerank(
        [r.asDict() for r in full.collect()], allowed, 5, "pq_score"
    )

    got_list = sorted(
        (r.query_id, r.vec_id, r.pq_score, r.rank)
        for r in ann_index_topk(
            spark, path, qs, k=5, nprobe=2, allowed_ids=sorted(allowed)
        ).collect()
    )
    got_df = sorted(
        (r.query_id, r.vec_id, r.pq_score, r.rank)
        for r in ann_index_topk(
            spark, path, qs, k=5, nprobe=2,
            allowed_ids=emb.filter(F.col("vec_id") % 3 == 0).select(
                "vec_id"
            ),
        ).collect()
    )
    assert got_list == want
    assert got_df == want  # list and DataFrame forms agree exactly


def test_ann_filtered_lossless_equals_brute_force_over_subset(
    spark, emb, tmp_path
):
    """The semantic gold gate: identity codebook + full probe means
    pq_score IS the rounded cosine, so filtered index top-k must
    EQUAL brute-force cosine top-k over the pre-filtered corpus —
    the result a user would get by maintaining a separate per-scope
    corpus, without maintaining one."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "annid")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=None)
    qs = emb.filter(F.col("vec_id") < 3)
    sub = emb.filter(F.col("vec_id") % 3 == 0)
    got = sorted(
        (r.query_id, r.vec_id)
        for r in ann_index_topk(
            spark, path, qs, k=5, nprobe=8,
            allowed_ids=sub.select("vec_id"),
        ).collect()
    )
    want = sorted(
        (r.query_id, r.vec_id)
        for r in brute_force_topk(sub, qs, k=5).collect()
    )
    assert got == want and len(got) == 15


def test_ann_filtered_composes_with_refine(spark, emb, tmp_path):
    """refine= re-ranks the FILTERED candidates against exact stored
    vectors: with the identity codebook ADC is already exact, so the
    refined filtered result must equal brute force over the subset —
    and every returned id is allowed."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "annref")
    ann_index_build(
        emb, path, n_cells=8, m=8, n_codes=None, store_vectors=True
    )
    qs = emb.filter(F.col("vec_id") < 3)
    sub = emb.filter(F.col("vec_id") % 3 == 0)
    got = sorted(
        (r.query_id, r.vec_id)
        for r in ann_index_topk(
            spark, path, qs, k=5, nprobe=8, refine=50,
            allowed_ids=sub.select("vec_id"),
        ).collect()
    )
    want = sorted(
        (r.query_id, r.vec_id)
        for r in brute_force_topk(sub, qs, k=5).collect()
    )
    assert got == want


def test_ann_filtered_empty_allowed_is_typed_empty(spark, emb, tmp_path):
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )

    path = str(tmp_path / "ann0")
    ann_index_build(emb, path, n_cells=4, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 2)
    out = ann_index_topk(spark, path, qs, k=5, nprobe=2, allowed_ids=[])
    assert out.columns == [
        "query_id", "vec_id", "pq_score", "rank", "index_version",
    ]
    assert out.count() == 0


def test_allowed_ids_guards(spark, emb, docs, tmp_path):
    """A type-incompatible DataFrame and an unresolvable multi-column
    DataFrame both fail loudly up front — never silently dropping
    every candidate."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )

    path = str(tmp_path / "annt")
    ann_index_build(emb, path, n_cells=4, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 2)
    bad_type = spark.createDataFrame([("a",)], "vec_id string")
    with pytest.raises(ValueError, match="allowed_ids"):
        ann_index_topk(
            spark, path, qs, k=5, allowed_ids=bad_type
        )
    two_cols = spark.createDataFrame(
        [(1, 2)], "some_id long, other long"
    )
    with pytest.raises(ValueError, match="single-column"):
        ann_index_topk(
            spark, path, qs, k=5, allowed_ids=two_cols
        )


def test_bm25_filtered_equals_rerank_of_unfiltered(spark, docs, tmp_path):
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    path = str(tmp_path / "bm")
    bm25_index_build(docs, path, n_buckets=8)
    allowed = {
        r.doc_id for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
    }
    q = "stream merge window"
    full = bm25_index_topk(spark, path, q, k=1_000_000)
    want = _rerank(
        [r.asDict() for r in full.collect()], allowed, 10, "score"
    )
    got_list = sorted(
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(
            spark, path, q, k=10, allowed_ids=sorted(allowed)
        ).collect()
    )
    got_df = sorted(
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(
            spark, path, q, k=10,
            allowed_ids=docs.filter(F.col("doc_id") % 3 == 0).select(
                "doc_id"
            ),
        ).collect()
    )
    # _rerank keys by query_id which bm25 single-query has none of —
    # strip the synthetic qid
    want = sorted((d, s, rk) for (_, d, s, rk) in want)
    assert got_list == want
    assert got_df == want


def test_bm25_filtered_scores_use_index_wide_stats(spark, docs, tmp_path):
    """The filter scopes candidates, NOT statistics: a returned doc's
    score under the filter equals its unfiltered score (idf/avgdl are
    the index's), only ranks compress."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmstats")
    bm25_index_build(docs, path, n_buckets=8)
    q = "customer value table"
    unfiltered = {
        r.doc_id: r.score
        for r in bm25_index_topk(spark, path, q, k=1_000_000).collect()
    }
    allowed = [d for d in sorted(unfiltered) if d % 2 == 0]
    for r in bm25_index_topk(
        spark, path, q, k=10, allowed_ids=allowed
    ).collect():
        assert r.score == unfiltered[r.doc_id]
        assert r.doc_id in set(allowed)


def test_bm25_filtered_batch_per_query(spark, docs, tmp_path):
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
        bm25_index_topk_batch,
    )

    path = str(tmp_path / "bmb")
    bm25_index_build(docs, path, n_buckets=8)
    queries = spark.createDataFrame(
        [(1, "stream merge window"), (2, "customer value table")],
        "query_id long, query string",
    )
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_index_topk_batch(
            spark, path, queries, k=5, allowed_ids=allowed
        ).collect()
    )
    # each query independently equals the filtered single-query path
    want = []
    for qid, q in [(1, "stream merge window"), (2, "customer value table")]:
        for r in bm25_index_topk(
            spark, path, q, k=5, allowed_ids=allowed
        ).collect():
            want.append((qid, r.doc_id, r.score, r.rank))
    assert got == sorted(want)


def test_bm25_filtered_composes_with_mode_all_and_phrase(
    spark, docs, tmp_path
):
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmp")
    bm25_index_build(docs, path, n_buckets=8, store_positions=True)
    allowed = {
        r.doc_id for r in docs.filter(F.col("doc_id") % 2 == 0).collect()
    }
    for kw in (
        {"mode": "all"},
        {"phrase": "customer value"},
    ):
        un = bm25_index_topk(
            spark, path, "customer value", k=1_000_000, **kw
        ).collect()
        want = _rerank(
            [r.asDict() for r in un], allowed, 5, "score"
        )
        want = sorted((d, s, rk) for (_, d, s, rk) in want)
        got = sorted(
            (r.doc_id, r.score, r.rank)
            for r in bm25_index_topk(
                spark, path, "customer value", k=5,
                allowed_ids=sorted(allowed), **kw
            ).collect()
        )
        assert got == want, kw


def test_hybrid_filtered_threads_both_legs(spark, docs, emb, tmp_path):
    """The fused result under allowed_ids must equal fusing the two
    INDIVIDUALLY filtered legs — i.e. the filter reached both legs
    before their n_candidates cuts, not the fused output."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.operators.hybrid import hybrid_index_topk
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    bp, ap = str(tmp_path / "b"), str(tmp_path / "a")
    bm25_index_build(docs, bp, n_buckets=8)
    ann_index_build(emb, ap, n_cells=4, m=8, n_codes=16)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[1]]
    allowed = sorted(
        r.doc_id for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
    )
    fused = hybrid_index_topk(
        spark, bp, ap, "stream merge window", qvec, k=8,
        n_candidates=10, allowed_ids=allowed,
    ).collect()
    assert fused and all(r.doc_id % 3 == 0 for r in fused)

    text_ranks = {
        r.doc_id: r.rank
        for r in bm25_index_topk(
            spark, bp, "stream merge window", k=10, allowed_ids=allowed
        ).collect()
    }
    qdf = spark.createDataFrame(
        [(0, qvec)], "query_id long, embedding array<double>"
    )
    vec_ranks = {
        r.vec_id: r.rank
        for r in ann_index_topk(
            spark, ap, qdf, k=10, nprobe=2, query_id_col="query_id",
            query_vec_col="embedding", exclude_self=False,
            allowed_ids=allowed,
        ).collect()
    }
    for r in fused:
        assert r.text_rank == text_ranks.get(r.doc_id)
        assert r.vec_rank == vec_ranks.get(r.doc_id)


# ---------------------------------------------------------------------------
# where= : DSL predicates over index-STORED metadata columns
# ---------------------------------------------------------------------------


@pytest.fixture()
def emb_full(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )  # vec_id, embedding, label


@pytest.fixture()
def docs_full(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text", "lang")


def test_ann_where_equals_allowed_ids(spark, emb_full, tmp_path):
    """where='label == 0' over a store_cols index must equal the
    allowed_ids path fed the same ids from the external metadata —
    one mechanism, two physical shapes (pushed predicate vs id
    set)."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )

    path = str(tmp_path / "annmeta")
    ann_index_build(
        emb_full, path, n_cells=8, m=8, n_codes=16,
        store_cols=["label"],
    )
    qs = emb_full.filter(F.col("vec_id") < 3)
    want_ids = emb_full.filter(F.col("label") == 0).select("vec_id")
    a = sorted(
        (r.query_id, r.vec_id, r.pq_score, r.rank)
        for r in ann_index_topk(
            spark, path, qs, k=5, nprobe=2, where="label == 0"
        ).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.pq_score, r.rank)
        for r in ann_index_topk(
            spark, path, qs, k=5, nprobe=2, allowed_ids=want_ids
        ).collect()
    )
    assert a == b and a


def test_ann_where_guards(spark, emb_full, tmp_path):
    from parq_tools_spark.operators.ann_index import (
        ann_index_add,
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.plans.query_parser import FilterParseError

    bare = str(tmp_path / "bare")
    ann_index_build(
        emb_full.select("vec_id", "embedding"), bare,
        n_cells=4, m=8, n_codes=16,
    )
    qs = emb_full.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="store_cols"):
        ann_index_topk(spark, bare, qs, k=3, where="label == 0")

    meta = str(tmp_path / "meta")
    ann_index_build(
        emb_full, meta, n_cells=4, m=8, n_codes=16,
        store_cols=["label"],
    )
    # predicate on a column the index never stored: loud, not silent
    with pytest.raises(FilterParseError):
        ann_index_topk(spark, meta, qs, k=3, where="missing == 1")
    # an ingest that dropped the metadata column: loud
    with pytest.raises(ValueError, match="missing"):
        ann_index_add(
            emb_full.select(
                (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
            ),
            meta,
        )
    # reserved-name collision at build: loud
    with pytest.raises(ValueError, match="reserved"):
        ann_index_build(
            emb_full.select(
                "vec_id", "embedding", F.lit(1).alias("cell")
            ),
            str(tmp_path / "bad"),
            store_cols=["cell"],
        )


def test_ann_where_survives_retrain_and_composes(
    spark, emb_full, tmp_path
):
    from parq_tools_spark.operators.ann_index import (
        ann_index_add,
        ann_index_build,
        ann_index_retrain,
        ann_index_stats,
        ann_index_topk,
    )

    k = F.col("vec_id")
    path = str(tmp_path / "annrt")
    ann_index_build(
        emb_full.filter(k % 2 == 0), path, n_cells=8, m=8, n_codes=16,
        store_vectors=True, store_cols=["label"],
    )
    ann_index_add(emb_full.filter(k % 2 == 1), path)
    ann_index_retrain(spark, path)
    assert ann_index_stats(spark, path)["params"]["store_cols"] == [
        "label"
    ]
    qs = emb_full.filter(k < 3)
    got = ann_index_topk(
        spark, path, qs, k=5, nprobe=2, where="label == 0",
        allowed_ids=[r.vec_id for r in emb_full.filter(
            k % 3 == 0).select("vec_id").collect()],
    ).collect()
    assert got
    labels = {
        r.vec_id: r.label
        for r in emb_full.select("vec_id", "label").collect()
    }
    for r in got:
        assert labels[r.vec_id] == 0 and r.vec_id % 3 == 0


def test_bm25_where_equals_allowed_ids_and_tracks_updates(
    spark, docs_full, tmp_path
):
    """where='lang == ...' equals the externally-computed allowed_ids
    path; an upsert that CHANGES a doc's metadata is respected
    immediately (version-scoped tombstones hide the old posting
    rows)."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
        bm25_index_upsert,
    )

    path = str(tmp_path / "bmmeta")
    bm25_index_build(docs_full, path, n_buckets=8, store_cols=["lang"])
    langs = [
        r.lang for r in docs_full.select("lang").distinct().collect()
    ]
    lang = sorted(langs)[0]
    q = "stream merge window"
    a = sorted(
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(
            spark, path, q, k=10, where=f"lang == '{lang}'"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(
            spark, path, q, k=10,
            allowed_ids=docs_full.filter(
                F.col("lang") == lang).select("doc_id"),
        ).collect()
    )
    assert a == b and a

    # flip one served doc's lang via upsert: it must leave this
    # scope's results and appear under the new scope
    victim = a[0][0]
    vrow = docs_full.filter(F.col("doc_id") == victim).select(
        "doc_id", "text", F.lit("zz").alias("lang")
    )
    bm25_index_upsert(vrow, path)
    after = {
        r.doc_id
        for r in bm25_index_topk(
            spark, path, q, k=1_000_000, where=f"lang == '{lang}'"
        ).collect()
    }
    assert victim not in after
    zz = {
        r.doc_id
        for r in bm25_index_topk(
            spark, path, q, k=10, where="lang == 'zz'"
        ).collect()
    }
    assert zz == {victim}


def test_bm25_where_survives_compaction(spark, docs_full, tmp_path):
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_compact,
        bm25_index_topk,
    )

    k = F.col("doc_id")
    path = str(tmp_path / "bmc")
    bm25_index_build(
        docs_full.filter(k % 2 == 0), path, n_buckets=4,
        store_cols=["lang"],
    )
    bm25_index_add(docs_full.filter(k % 2 == 1), path)
    q = "customer value table"

    def served():
        return sorted(
            (r.doc_id, r.score, r.rank)
            for r in bm25_index_topk(
                spark, path, q, k=10, where="lang == 'en'"
            ).collect()
        )

    pre = served()
    assert pre
    out = bm25_index_compact(spark, path, force=True)
    assert served() == pre
    assert isinstance(out, dict)


def test_hybrid_where_threads_both_legs(spark, docs_full, tmp_path):
    """Both hybrid legs must see the where predicate: every fused id
    satisfies it even when the unfiltered legs would rank others
    higher."""
    from parq_tools_spark.operators.ann_index import ann_index_build
    from parq_tools_spark.operators.hybrid import hybrid_index_topk
    from parq_tools_spark.operators.search import bm25_index_build

    emb = spark.createDataFrame(
        [
            (
                int(r.doc_id),
                [float((r.doc_id * 7 + i) % 13) for i in range(8)],
                r.lang,
            )
            for r in docs_full.limit(40).collect()
        ],
        "vec_id long, embedding array<double>, lang string",
    )
    bp, ap = str(tmp_path / "b"), str(tmp_path / "a")
    bm25_index_build(docs_full, bp, n_buckets=4, store_cols=["lang"])
    ann_index_build(
        emb, ap, n_cells=2, m=2, n_codes=4, store_cols=["lang"]
    )
    qvec = [float(x) for x in emb.first()[1]]
    lang = docs_full.first().lang
    fused = hybrid_index_topk(
        spark, bp, ap, "stream merge window", qvec, k=5,
        n_candidates=8, where=f"lang == '{lang}'",
    ).collect()
    langs = {
        r.doc_id: r.lang
        for r in docs_full.select("doc_id", "lang").collect()
    }
    assert fused and all(langs[r.doc_id] == lang for r in fused)


def test_minhash_and_simhash_scoped_queries(spark, docs, tmp_path):
    """allowed_ids on the pair-query families: only allowed INDEXED
    documents may pair — equal to querying an index built on the
    allowed subset only (band rows are per-document, so subsetting
    the index and filtering its band rows are the same relation)."""
    from parq_tools_spark.operators.dedup import (
        incremental_dedupe,
        minhash_index_query,
        minhash_index_write,
    )
    from parq_tools_spark.operators.simhash_index import (
        simhash_index_query,
        simhash_index_write,
    )

    k = F.col("doc_id")
    seed = docs.filter(k % 2 == 0)
    allowed = seed.filter(k % 4 == 0).select("doc_id")
    batch = docs.filter(k % 2 == 1)

    full_mh = str(tmp_path / "mh")
    sub_mh = str(tmp_path / "mhsub")
    minhash_index_write(seed, full_mh, num_hashes=32, bands=8)
    minhash_index_write(
        seed.filter(k % 4 == 0), sub_mh, num_hashes=32, bands=8
    )

    def pairs(fn, path, **kw):
        return sorted(
            (r.id_indexed, r.id_new)
            for r in fn(spark, path, batch, **kw).collect()
        )

    got = pairs(
        minhash_index_query, full_mh, threshold=0.5,
        allowed_ids=allowed,
    )
    want = pairs(minhash_index_query, sub_mh, threshold=0.5)
    assert got == want
    # list form agrees with the DataFrame form
    got_list = pairs(
        minhash_index_query, full_mh, threshold=0.5,
        allowed_ids=[r.doc_id for r in allowed.collect()],
    )
    assert got_list == want

    full_sh = str(tmp_path / "sh")
    sub_sh = str(tmp_path / "shsub")
    simhash_index_write(seed, full_sh)
    simhash_index_write(seed.filter(k % 4 == 0), sub_sh)
    got = pairs(
        simhash_index_query, full_sh, max_hamming=3,
        allowed_ids=allowed,
    )
    want = pairs(simhash_index_query, sub_sh, max_hamming=3)
    assert got == want

    # scoped admission through incremental_dedupe: survivors against
    # the scoped index equal survivors against the subset index
    a = sorted(
        r.doc_id
        for r in incremental_dedupe(
            spark, full_mh, batch, threshold=0.5, allowed_ids=allowed
        ).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in incremental_dedupe(
            spark, sub_mh, batch, threshold=0.5
        ).select("doc_id").collect()
    )
    assert a == b


def test_bm25_where_with_positions_and_phrase(spark, docs_full, tmp_path):
    """store_cols composes with store_positions: the positional
    postings variant groups by the meta columns too, and a phrase
    query under where= returns only allowed docs with scores equal to
    the unfiltered phrase scores."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    path = str(tmp_path / "bmpos")
    bm25_index_build(
        docs_full, path, n_buckets=8, store_positions=True,
        store_cols=["lang"],
    )
    un = {
        r.doc_id: r.score
        for r in bm25_index_topk(
            spark, path, "customer value", k=1_000_000,
            phrase="customer value",
        ).collect()
    }
    lang = {
        r.doc_id: r.lang
        for r in docs_full.select("doc_id", "lang").collect()
    }
    got = bm25_index_topk(
        spark, path, "customer value", k=5, phrase="customer value",
        where="lang == 'en'",
    ).collect()
    want_ids = sorted(
        d for d in un if lang[d] == "en"
    )
    if want_ids:
        assert got
    for r in got:
        assert lang[r.doc_id] == "en"
        assert r.score == un[r.doc_id]


def test_allowed_ids_literal_type_guard(spark, emb, tmp_path):
    """A literal allowed-id list whose element type mismatches the
    index's persisted id type fails loudly up front — the same guard
    the DataFrame form runs. Under non-ANSI semantics the mismatch
    would cast to NULL and silently return an empty (or partial)
    top-k instead of erroring."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
    )

    path = str(tmp_path / "annlit")
    ann_index_build(emb, path, n_cells=4, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="allowed_ids"):
        ann_index_topk(spark, path, qs, k=5, allowed_ids=["a", "b"])
    # matching literal type still serves
    ok = ann_index_topk(
        spark, path, qs, k=5,
        allowed_ids=[r.vec_id for r in emb.limit(8).collect()],
    )
    assert ok.count() >= 0


def test_hybrid_allowed_ids_generator_not_exhausted(
    spark, docs, emb, tmp_path
):
    """hybrid_index_topk materializes a non-DataFrame allowed set
    ONCE before threading it into both legs: a one-shot iterable must
    give the same fused result as the equivalent list, not hand the
    ANN leg an exhausted (empty) filter after the BM25 leg consumed
    it."""
    from parq_tools_spark.operators.ann_index import ann_index_build
    from parq_tools_spark.operators.hybrid import hybrid_index_topk
    from parq_tools_spark.operators.search import bm25_index_build

    bp, ap = str(tmp_path / "b"), str(tmp_path / "a")
    bm25_index_build(docs, bp, n_buckets=8)
    ann_index_build(emb, ap, n_cells=4, m=8, n_codes=16)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[1]]
    allowed = sorted(
        r.doc_id for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
    )

    def run(ids):
        return sorted(
            (r.doc_id, r.score, r.rank)
            for r in hybrid_index_topk(
                spark, bp, ap, "stream merge window", qvec, k=8,
                n_candidates=10, allowed_ids=ids,
            ).collect()
        )

    assert run(iter(allowed)) == run(allowed) != []


# ---------------------------------------------------------------------------
# where= on the MinHash / SimHash index families (r15: completes the
# filtered-retrieval surface across all four families)
# ---------------------------------------------------------------------------


def test_minhash_where_equals_allowed_ids_and_tracks_updates(
    spark, docs_full, tmp_path
):
    """where='lang == ...' over a store_cols MinHash index equals the
    allowed_ids path fed the same ids from external metadata — one
    mechanism, two physical shapes — and an upsert that CHANGES a
    doc's stored metadata is respected immediately (version-scoped
    tombstones hide the old band rows)."""
    from parq_tools_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_upsert,
        minhash_index_write,
    )

    path = str(tmp_path / "mhmeta")
    minhash_index_write(
        docs_full, path, num_hashes=32, bands=8, store_cols=["lang"]
    )
    batch = docs_full.filter(F.col("doc_id") < 40).select(
        "doc_id", "text"
    )

    def pairs(**kw):
        return sorted(
            (r.id_indexed, r.id_new, r.est_jaccard)
            for r in minhash_index_query(
                spark, path, batch, threshold=0.5,
                exclude_same_id=False, **kw,
            ).collect()
        )

    lang = sorted(
        r.lang for r in docs_full.select("lang").distinct().collect()
    )[0]
    a = pairs(where=f"lang == '{lang}'")
    b = pairs(
        allowed_ids=docs_full.filter(
            F.col("lang") == lang
        ).select("doc_id")
    )
    assert a == b and a

    # flip one indexed doc's lang via upsert: it leaves this scope
    # and appears under the new scope
    victim = a[0][0]
    vrow = docs_full.filter(F.col("doc_id") == victim).select(
        "doc_id", "text", F.lit("zz").alias("lang")
    )
    minhash_index_upsert(vrow, path)
    assert victim not in {
        p[0] for p in pairs(where=f"lang == '{lang}'")
    }
    assert {p[0] for p in pairs(where="lang == 'zz'")} == {victim}


def test_minhash_where_guards_and_compaction(
    spark, docs_full, tmp_path
):
    from parq_tools_spark.operators.dedup import (
        minhash_index_add,
        minhash_index_compact,
        minhash_index_delete,
        minhash_index_query,
        minhash_index_write,
    )
    from parq_tools_spark.plans.query_parser import FilterParseError

    k = F.col("doc_id")
    bare = str(tmp_path / "mhbare")
    minhash_index_write(
        docs_full.select("doc_id", "text"), bare,
        num_hashes=32, bands=8,
    )
    batch = docs_full.filter(k < 10).select("doc_id", "text")
    with pytest.raises(ValueError, match="store_cols"):
        minhash_index_query(spark, bare, batch, where="lang == 'en'")

    meta = str(tmp_path / "mhmeta")
    minhash_index_write(
        docs_full.filter(k % 2 == 0), meta,
        num_hashes=32, bands=8, store_cols=["lang"],
    )
    # predicate on a never-stored column: loud, identical on empty
    # and non-empty indexes
    with pytest.raises(FilterParseError):
        minhash_index_query(spark, meta, batch, where="missing == 1")
    # an ingest that dropped the metadata column: loud
    with pytest.raises(ValueError, match="missing"):
        minhash_index_add(
            docs_full.filter(k % 2 == 1).select("doc_id", "text"), meta
        )
    # reserved-name collision at build: loud
    with pytest.raises(ValueError, match="reserved"):
        minhash_index_write(
            docs_full.select(
                "doc_id", "text", F.lit(1).alias("bhash")
            ),
            str(tmp_path / "mhbad"),
            store_cols=["bhash"],
        )

    # metadata survives add + delete + compaction (whole-row rewrite)
    minhash_index_add(docs_full.filter(k % 2 == 1), meta)

    def served():
        return sorted(
            (r.id_indexed, r.id_new, r.est_jaccard)
            for r in minhash_index_query(
                spark, meta, batch, threshold=0.5,
                exclude_same_id=False, where="lang == 'en'",
            ).collect()
        )

    pre = served()
    assert pre
    gone = [p[0] for p in pre[:1]]
    minhash_index_delete(spark, meta, gone)
    minhash_index_compact(spark, meta, force=True)
    assert served() == [p for p in pre if p[0] not in set(gone)]


def test_simhash_where_equals_allowed_ids_and_lifecycle(
    spark, docs_full, tmp_path
):
    """The SimHash mirror: where= equals allowed_ids from the same
    predicate; guards are loud; metadata survives upsert + compaction
    and metadata CHANGES are respected immediately."""
    from parq_tools_spark.operators.simhash_index import (
        simhash_index_compact,
        simhash_index_query,
        simhash_index_upsert,
        simhash_index_write,
    )
    from parq_tools_spark.plans.query_parser import FilterParseError

    path = str(tmp_path / "shmeta")
    simhash_index_write(
        docs_full, path, n_bands=8, store_cols=["lang"]
    )
    batch = docs_full.filter(F.col("doc_id") < 40).select(
        "doc_id", "text"
    )

    def pairs(**kw):
        return sorted(
            (r.id_indexed, r.id_new, r.hamming)
            for r in simhash_index_query(
                spark, path, batch, max_hamming=7,
                exclude_same_id=False, **kw,
            ).collect()
        )

    lang = sorted(
        r.lang for r in docs_full.select("lang").distinct().collect()
    )[0]
    a = pairs(where=f"lang == '{lang}'")
    b = pairs(
        allowed_ids=docs_full.filter(
            F.col("lang") == lang
        ).select("doc_id")
    )
    assert a == b and a

    with pytest.raises(FilterParseError):
        simhash_index_query(spark, path, batch, where="missing == 1")
    bare = str(tmp_path / "shbare")
    simhash_index_write(
        docs_full.select("doc_id", "text"), bare, n_bands=8
    )
    with pytest.raises(ValueError, match="store_cols"):
        simhash_index_query(spark, bare, batch, where="lang == 'en'")
    with pytest.raises(ValueError, match="reserved"):
        simhash_index_write(
            docs_full.select("doc_id", "text", F.lit(1).alias("bval")),
            str(tmp_path / "shbad"),
            store_cols=["bval"],
        )

    # metadata flip via upsert respected immediately
    victim = a[0][0]
    vrow = docs_full.filter(F.col("doc_id") == victim).select(
        "doc_id", "text", F.lit("zz").alias("lang")
    )
    simhash_index_upsert(vrow, path)
    assert victim not in {p[0] for p in pairs(where=f"lang == '{lang}'")}
    assert {p[0] for p in pairs(where="lang == 'zz'")} == {victim}

    # compaction folds tombstones and keeps the metadata rows
    pre = pairs(where=f"lang == '{lang}'")
    simhash_index_compact(spark, path, force=True)
    assert pairs(where=f"lang == '{lang}'") == pre


def test_incremental_dedupe_where_scopes_admission(
    spark, docs_full, tmp_path
):
    """incremental_dedupe(where=...) admits exactly like running
    against an index built on the predicate's subset (band rows are
    per-document, so filtering them IS subsetting the index)."""
    from parq_tools_spark.operators.dedup import (
        incremental_dedupe,
        minhash_index_write,
    )

    k = F.col("doc_id")
    seed = docs_full.filter(k % 2 == 0)
    batch = docs_full.filter(k % 2 == 1).select("doc_id", "text")
    full = str(tmp_path / "mhfull")
    sub = str(tmp_path / "mhsub")
    minhash_index_write(
        seed, full, num_hashes=32, bands=8, store_cols=["lang"]
    )
    minhash_index_write(
        seed.filter(F.col("lang") == "en"), sub,
        num_hashes=32, bands=8,
    )
    a = sorted(
        r.doc_id
        for r in incremental_dedupe(
            spark, full, batch, threshold=0.5, where="lang == 'en'"
        ).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in incremental_dedupe(
            spark, sub, batch, threshold=0.5
        ).select("doc_id").collect()
    )
    assert a == b
