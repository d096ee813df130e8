"""Hybrid retrieval (RRF + weighted score fusion) — operators/hybrid.py.

The reference has no retrieval surface; these tests pin the fusion
math against hand-computed values and against the legs they compose
(bm25_topk / cosine ranking), which carry their own DuckDB oracles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parq_tools_spark.operators.hybrid import (
    hybrid_topk,
    hybrid_topk_batch,
    rrf_fuse,
)

DOCS = [
    (1, "spark streams merge windows in a stream engine"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "stream processing with watermark windows"),
    (4, "merge sort is a classic algorithm"),
    (5, "vector search finds nearest neighbors"),
]
# 2-d embeddings: cosine ordering vs query [1, 0] is deterministic
VECS = [
    (1, [1.0, 0.0]),
    (2, [0.9, 0.1]),
    (3, [0.0, 1.0]),
    (4, [0.7, 0.7]),
    (5, [-1.0, 0.2]),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


class TestRrfFuse:
    def test_hand_computed_two_lists(self, spark):
        a = _ranking(spark, [(10, 1), (11, 2), (12, 3)])
        b = _ranking(spark, [(11, 1), (10, 2), (13, 3)])
        out = {
            r["doc_id"]: (r["score"], r["rank"])
            for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()
        }
        # both lists: 1/(60+r1) + 1/(60+r2)
        assert out[10][0] == pytest.approx(1 / 61 + 1 / 62, abs=1e-9)
        assert out[11][0] == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)
        # single-list docs
        assert out[12][0] == pytest.approx(1 / 63, abs=1e-9)
        assert out[13][0] == pytest.approx(1 / 63, abs=1e-9)
        # 10 and 11 tie exactly (same rank multiset) -> id breaks it
        assert out[10][1] == 1 and out[11][1] == 2
        # 12 and 13 tie -> id order
        assert out[12][1] == 3 and out[13][1] == 4

    def test_weights(self, spark):
        a = _ranking(spark, [(1, 1)])
        b = _ranking(spark, [(2, 1)])
        out = {
            r["doc_id"]: r["score"]
            for r in rrf_fuse(
                [a, b], k=10, rrf_k=60, weights=[0.75, 0.25]
            ).collect()
        }
        assert out[1] == pytest.approx(0.75 / 61, abs=1e-9)
        assert out[2] == pytest.approx(0.25 / 61, abs=1e-9)

    def test_k_truncates(self, spark):
        a = _ranking(spark, [(i, i) for i in range(1, 8)])
        got = rrf_fuse([a], k=3).collect()
        assert [r["doc_id"] for r in got] == [1, 2, 3]
        assert [r["rank"] for r in got] == [1, 2, 3]

    def test_grouped(self, spark):
        a = spark.createDataFrame(
            [("q1", 1, 1), ("q2", 2, 1)],
            "query_id string, doc_id long, rank int",
        )
        b = spark.createDataFrame(
            [("q1", 1, 2), ("q2", 3, 1)],
            "query_id string, doc_id long, rank int",
        )
        got = {
            (r["query_id"], r["doc_id"]): r["rank"]
            for r in rrf_fuse(
                [a, b], k=5, group_cols=["query_id"]
            ).collect()
        }
        assert got[("q1", 1)] == 1
        assert got[("q2", 2)] == 1 and got[("q2", 3)] == 2

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])
        a = _ranking(spark, [(1, 1)])
        with pytest.raises(ValueError, match="weights"):
            rrf_fuse([a, a], weights=[1.0])


class TestHybridTopk:
    def test_rrf_promotes_doc_strong_in_both(self, docs, vecs):
        # doc 1 is top in BOTH legs ("stream merge" text, vec [1,0])
        got = hybrid_topk(
            docs,
            "stream merge",
            [1.0, 0.0],
            embeddings=vecs,
            k=5,
            n_candidates=5,
        ).collect()
        assert got[0]["doc_id"] == 1
        assert got[0]["text_rank"] == 1 and got[0]["vec_rank"] == 1
        ranks = [r["rank"] for r in got]
        assert ranks == sorted(ranks) and ranks[0] == 1

    def test_rrf_score_is_rank_arithmetic(self, docs, vecs):
        got = {
            r["doc_id"]: r
            for r in hybrid_topk(
                docs, "stream merge", [1.0, 0.0],
                embeddings=vecs, k=5, n_candidates=5,
            ).collect()
        }
        for r in got.values():
            expect = 0.0
            if r["text_rank"] is not None:
                expect += 0.5 / (60 + r["text_rank"])
            if r["vec_rank"] is not None:
                expect += 0.5 / (60 + r["vec_rank"])
            assert r["score"] == pytest.approx(expect, abs=1e-9)

    def test_missing_leg_contributes_zero(self, docs, vecs):
        # doc 2 matches no query term -> text_rank NULL, vec leg only
        got = {
            r["doc_id"]: r
            for r in hybrid_topk(
                docs, "stream merge", [1.0, 0.0],
                embeddings=vecs, k=5, n_candidates=5,
            ).collect()
        }
        assert got[2]["text_rank"] is None
        assert got[2]["score"] == pytest.approx(
            0.5 / (60 + got[2]["vec_rank"]), abs=1e-9
        )

    def test_wsum_normalizes_each_leg(self, docs, vecs):
        got = hybrid_topk(
            docs, "stream merge", [1.0, 0.0],
            embeddings=vecs, k=5, n_candidates=5, method="wsum",
        ).collect()
        top = got[0]
        # doc 1 is the max of both legs -> 0.5*1 + 0.5*1 = 1.0
        assert top["doc_id"] == 1
        assert top["score"] == pytest.approx(1.0, abs=1e-9)
        for r in got:
            assert 0.0 <= r["score"] <= 1.0 + 1e-9

    def test_wsum_degenerate_leg_keeps_missing_docs_at_zero(self, spark):
        # text leg degenerate (both matches score identically); doc 3
        # is vec-only and must NOT inherit the degenerate leg's 1.0
        docs = spark.createDataFrame(
            [(1, "alpha x"), (2, "alpha y"), (3, "gamma z")],
            "doc_id long, text string",
        )
        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.8, 0.2]), (3, [0.9, 0.1])],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["doc_id"]: r
            for r in hybrid_topk(
                docs, "alpha", [1.0, 0.0],
                embeddings=vecs, k=3, n_candidates=3, method="wsum",
            ).collect()
        }
        assert got[1]["score"] == pytest.approx(1.0, abs=1e-9)  # max both
        assert got[3]["text_rank"] is None
        # doc 3: text contributes 0; vec norm = (sim3-lo)/(hi-lo)
        assert got[3]["score"] < 0.5 + 1e-9

    def test_w_text_one_is_text_only_order(self, docs, vecs):
        got = hybrid_topk(
            docs, "stream merge", [1.0, 0.0],
            embeddings=vecs, k=3, n_candidates=5, w_text=1.0,
        ).collect()
        with_text = [r for r in got if r["text_rank"] is not None]
        # fused order of text-retrieved docs == text leg order
        assert [r["text_rank"] for r in with_text] == sorted(
            r["text_rank"] for r in with_text
        )

    def test_embeddings_default_to_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta", [1.0, 0.0]), (2, "beta gamma", [0.0, 1.0])],
            "doc_id long, text string, embedding array<double>",
        )
        got = hybrid_topk(df, "alpha", [1.0, 0.0], k=2, n_candidates=2)
        assert got.collect()[0]["doc_id"] == 1

    def test_validation(self, docs, vecs):
        with pytest.raises(ValueError, match="method"):
            hybrid_topk(docs, "x", [1.0, 0.0], embeddings=vecs, method="max")
        with pytest.raises(ValueError, match="w_text"):
            hybrid_topk(docs, "x", [1.0, 0.0], embeddings=vecs, w_text=1.5)


class TestHybridFromIndex:
    @pytest.fixture()
    def paths(self, spark, docs, vecs, tmp_path):
        import os

        from parq_tools_spark.operators.ann_index import ann_index_build
        from parq_tools_spark.operators.search import bm25_index_build

        bp = os.path.join(str(tmp_path), "bm25")
        ap = os.path.join(str(tmp_path), "ann")
        bm25_index_build(docs, bp, keep_versions=2)
        ann_index_build(
            vecs, ap, n_cells=2, m=2, n_codes=None, opq=True, opq_sample=8
        )
        return bp, ap

    def test_lossless_equals_scan_path(self, spark, docs, vecs, paths):
        from parq_tools_spark.operators.hybrid import hybrid_index_topk

        bp, ap = paths
        idx = hybrid_index_topk(
            spark, bp, ap, "stream merge", [1.0, 0.0],
            k=5, n_candidates=5, nprobe=2,
        ).collect()
        scan = hybrid_topk(
            docs, "stream merge", [1.0, 0.0],
            embeddings=vecs, k=5, n_candidates=5,
        ).collect()
        assert [tuple(r) for r in idx] == [tuple(r) for r in scan]

    def test_no_self_exclusion_on_sentinel_qid(
        self, spark, docs, vecs, paths
    ):
        from parq_tools_spark.operators.hybrid import hybrid_index_topk

        bp, ap = paths
        # query vector == vec 1's embedding; vec 1 must still appear
        got = hybrid_index_topk(
            spark, bp, ap, "quick fox", [1.0, 0.0],
            k=5, n_candidates=5, nprobe=2,
        ).collect()
        assert 1 in {r["doc_id"] for r in got}

    def test_text_leg_time_travel(self, spark, docs, vecs, paths):
        from parq_tools_spark.operators.hybrid import hybrid_index_topk
        from parq_tools_spark.operators.search import bm25_index_delete

        bp, ap = paths
        bm25_index_delete(spark, bp, [1])
        cur = hybrid_index_topk(
            spark, bp, ap, "stream merge", [1.0, 0.0],
            k=5, n_candidates=5, nprobe=2,
        ).collect()
        old = hybrid_index_topk(
            spark, bp, ap, "stream merge", [1.0, 0.0],
            k=5, n_candidates=5, nprobe=2, bm25_version=1,
        ).collect()
        # doc 1 keeps its text rank only in the v1 read
        cur_1 = [r for r in cur if r["doc_id"] == 1]
        old_1 = [r for r in old if r["doc_id"] == 1]
        assert old_1 and old_1[0]["text_rank"] is not None
        assert not cur_1 or cur_1[0]["text_rank"] is None


class TestHybridBatch:
    def test_batch_matches_single(self, spark, docs, vecs):
        queries = spark.createDataFrame(
            [
                (1, "stream merge", [1.0, 0.0]),
                (2, "vector search", [0.0, 1.0]),
            ],
            "query_id long, query string, query_vec array<double>",
        )
        batch = hybrid_topk_batch(
            docs, vecs, queries, k=5, n_candidates=5
        ).collect()
        for qid, qtext, qvec in [
            (1, "stream merge", [1.0, 0.0]),
            (2, "vector search", [0.0, 1.0]),
        ]:
            single = hybrid_topk(
                docs, qtext, qvec, embeddings=vecs, k=5, n_candidates=5
            ).collect()
            got = sorted(
                (
                    (r["doc_id"], r["score"], r["rank"])
                    for r in batch
                    if r["query_id"] == qid
                ),
                key=lambda t: t[2],
            )
            want = [(r["doc_id"], r["score"], r["rank"]) for r in single]
            assert got == want

    def test_output_columns(self, spark, docs, vecs):
        queries = spark.createDataFrame(
            [(7, "stream", [1.0, 0.0])],
            "query_id long, query string, query_vec array<double>",
        )
        out = hybrid_topk_batch(docs, vecs, queries, k=3, n_candidates=5)
        assert out.columns == ["query_id", "doc_id", "score", "rank"]
        assert out.filter(F.col("query_id") == 7).count() > 0


class TestStringIdIndexes:
    def test_string_id_hybrid_from_index_equals_scan(self, spark, tmp_path):
        """The r9 ADVICE repro: a string-id ANN index used to hit the
        sentinel-id cast (ANSI CAST_INVALID_INPUT, or a silently
        text-only hybrid under non-ANSI). With exclude_self=False the
        vector leg never compares ids across spaces, so string-id
        corpora serve bit-identically to the scan path."""
        import os

        from parq_tools_spark.operators.ann_index import ann_index_build
        from parq_tools_spark.operators.hybrid import hybrid_index_topk
        from parq_tools_spark.operators.search import bm25_index_build

        sdocs = spark.createDataFrame(
            [(f"d{i}", t) for i, t in DOCS], "doc_id string, text string"
        )
        svecs = spark.createDataFrame(
            [(f"d{i}", v) for i, v in VECS],
            "vec_id string, embedding array<double>",
        )
        bp = os.path.join(str(tmp_path), "bm25")
        ap = os.path.join(str(tmp_path), "ann")
        bm25_index_build(sdocs, bp)
        ann_index_build(
            svecs, ap, n_cells=2, m=2, n_codes=None, opq=True, opq_sample=8
        )
        idx = hybrid_index_topk(
            spark, bp, ap, "stream merge", [1.0, 0.0],
            k=5, n_candidates=5, nprobe=2,
        ).collect()
        scan = hybrid_topk(
            sdocs, "stream merge", [1.0, 0.0],
            embeddings=svecs, k=5, n_candidates=5,
        ).collect()
        assert [tuple(r) for r in idx] == [tuple(r) for r in scan]
        assert len(idx) == 5


class TestHybridIndexWsumAndBatch:
    @pytest.fixture()
    def paths(self, spark, docs, vecs, tmp_path):
        import os

        from parq_tools_spark.operators.ann_index import ann_index_build
        from parq_tools_spark.operators.search import bm25_index_build

        bp = os.path.join(str(tmp_path), "bm25")
        ap = os.path.join(str(tmp_path), "ann")
        bm25_index_build(docs, bp)
        ann_index_build(
            vecs, ap, n_cells=2, m=2, n_codes=None, opq=True, opq_sample=8
        )
        return bp, ap

    def test_index_wsum_equals_scan_wsum(self, spark, docs, vecs, paths):
        from parq_tools_spark.operators.hybrid import hybrid_index_topk

        bp, ap = paths
        idx = hybrid_index_topk(
            spark, bp, ap, "stream merge", [1.0, 0.0],
            k=5, n_candidates=5, nprobe=2, method="wsum",
        ).collect()
        scan = hybrid_topk(
            docs, "stream merge", [1.0, 0.0],
            embeddings=vecs, k=5, n_candidates=5, method="wsum",
        ).collect()
        assert [tuple(r) for r in idx] == [tuple(r) for r in scan]
        assert len(idx) == 5

    @pytest.mark.parametrize("method", ["rrf", "wsum"])
    def test_index_batch_equals_scan_batch(
        self, spark, docs, vecs, paths, method
    ):
        from parq_tools_spark.operators.hybrid import (
            hybrid_index_topk_batch,
        )

        bp, ap = paths
        queries = spark.createDataFrame(
            [
                (1, "stream merge", [1.0, 0.0]),
                (2, "vector search", [0.0, 1.0]),
            ],
            "query_id long, query string, query_vec array<double>",
        )
        idx = sorted(
            tuple(r)
            for r in hybrid_index_topk_batch(
                spark, bp, ap, queries,
                k=5, n_candidates=5, nprobe=2, method=method,
            ).collect()
        )
        scan = sorted(
            tuple(r)
            for r in hybrid_topk_batch(
                docs, vecs, queries, k=5, n_candidates=5, method=method,
            ).collect()
        )
        assert idx == scan and len(idx) == 10

    def test_batch_wsum_matches_singles(self, spark, docs, vecs):
        queries = spark.createDataFrame(
            [
                (1, "stream merge", [1.0, 0.0]),
                (2, "vector search", [0.0, 1.0]),
            ],
            "query_id long, query string, query_vec array<double>",
        )
        batch = hybrid_topk_batch(
            docs, vecs, queries, k=5, n_candidates=5, method="wsum"
        ).collect()
        for qid, qtext, qvec in [
            (1, "stream merge", [1.0, 0.0]),
            (2, "vector search", [0.0, 1.0]),
        ]:
            single = hybrid_topk(
                docs, qtext, qvec, embeddings=vecs,
                k=5, n_candidates=5, method="wsum",
            ).collect()
            got = sorted(
                (
                    (r["doc_id"], r["score"], r["rank"])
                    for r in batch
                    if r["query_id"] == qid
                ),
                key=lambda t: t[2],
            )
            want = [(r["doc_id"], r["score"], r["rank"]) for r in single]
            assert got == want

    def test_validation(self, spark, paths):
        from parq_tools_spark.operators.hybrid import (
            hybrid_index_topk,
            hybrid_index_topk_batch,
        )

        bp, ap = paths
        with pytest.raises(ValueError, match="method"):
            hybrid_index_topk(
                spark, bp, ap, "x", [1.0, 0.0], method="max"
            )
        qdf = spark.createDataFrame(
            [(1, "x", [1.0, 0.0])],
            "query_id long, query string, query_vec array<double>",
        )
        with pytest.raises(ValueError, match="w_text"):
            hybrid_index_topk_batch(
                spark, bp, ap, qdf, w_text=-0.1
            )


class TestHybridRefine:
    def test_lossy_index_plus_refine_equals_scan(self, spark, docs, vecs, tmp_path):
        """The compression win: a LOSSY (PQ-coded) index alone gives
        degraded vector ranks, but refine= re-ranks against the
        stored exact vectors — the fused result then equals the
        scan-path hybrid under BOTH methods, while the serving codes
        stay m bytes per vector."""
        import os

        from parq_tools_spark.operators.ann_index import ann_index_build
        from parq_tools_spark.operators.hybrid import hybrid_index_topk

        bp = os.path.join(str(tmp_path), "bm25")
        ap = os.path.join(str(tmp_path), "ann")
        from parq_tools_spark.operators.search import bm25_index_build

        bm25_index_build(docs, bp)
        # lossy: 2 codewords over 2 subspaces — ADC is provably wrong
        ann_index_build(
            vecs, ap, n_cells=2, m=2, n_codes=2, store_vectors=True
        )
        for method in ("rrf", "wsum"):
            idx = hybrid_index_topk(
                spark, bp, ap, "stream merge", [1.0, 0.0],
                k=5, n_candidates=5, nprobe=2, method=method,
                refine=100,
            ).collect()
            scan = hybrid_topk(
                docs, "stream merge", [1.0, 0.0],
                embeddings=vecs, k=5, n_candidates=5, method=method,
            ).collect()
            assert [tuple(r) for r in idx] == [tuple(r) for r in scan], method

    def test_batch_refine_equals_scan_batch(self, spark, docs, vecs, tmp_path):
        import os

        from parq_tools_spark.operators.ann_index import ann_index_build
        from parq_tools_spark.operators.hybrid import (
            hybrid_index_topk_batch,
        )
        from parq_tools_spark.operators.search import bm25_index_build

        bp = os.path.join(str(tmp_path), "bm25")
        ap = os.path.join(str(tmp_path), "ann")
        bm25_index_build(docs, bp)
        ann_index_build(
            vecs, ap, n_cells=2, m=2, n_codes=2, store_vectors=True
        )
        queries = spark.createDataFrame(
            [
                (1, "stream merge", [1.0, 0.0]),
                (2, "vector search", [0.0, 1.0]),
            ],
            "query_id long, query string, query_vec array<double>",
        )
        idx = sorted(
            tuple(r)
            for r in hybrid_index_topk_batch(
                spark, bp, ap, queries,
                k=5, n_candidates=5, nprobe=2, refine=100,
            ).collect()
        )
        scan = sorted(
            tuple(r)
            for r in hybrid_topk_batch(
                docs, vecs, queries, k=5, n_candidates=5
            ).collect()
        )
        assert idx == scan and len(idx) == 10
