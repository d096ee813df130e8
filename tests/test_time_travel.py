"""Index time-travel (version= reads) + keep_versions retention across
the three persisted index families (BM25 / ANN / MinHash) — the shared
``_index_common.resolve_manifest`` contract: a retained manifest serves
exactly as committed (statistics, segments AND tombstone scope)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"stream merge window doc {i} " + ("alpha " * (i % 4)))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _topk_rows(df):
    return [
        (r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    ]


class TestBm25TimeTravel:
    def test_version_reads_replay_history(self, spark, docs, tmp_path):
        from parq_tools_spark.operators.search import (
            bm25_index_add,
            bm25_index_build,
            bm25_index_delete,
            bm25_index_stats,
            bm25_index_topk,
        )

        path = os.path.join(str(tmp_path), "idx")
        evens = docs.filter(F.col("doc_id") % 2 == 0)
        odds = docs.filter(F.col("doc_id") % 2 == 1)
        bm25_index_build(evens, path, keep_versions=3)
        v1 = _topk_rows(bm25_index_topk(spark, path, "stream merge", k=5))
        bm25_index_add(odds, path)
        v2 = _topk_rows(bm25_index_topk(spark, path, "stream merge", k=5))
        bm25_index_delete(spark, path, [0, 1, 2])
        v3 = _topk_rows(bm25_index_topk(spark, path, "stream merge", k=5))

        # time-travel reproduces each captured state bit-for-bit
        assert _topk_rows(
            bm25_index_topk(spark, path, "stream merge", k=5, version=1)
        ) == v1
        assert _topk_rows(
            bm25_index_topk(spark, path, "stream merge", k=5, version=2)
        ) == v2
        assert _topk_rows(
            bm25_index_topk(spark, path, "stream merge", k=5, version=3)
        ) == v3
        # deleted doc 0 is visible at v1/v2, gone at v3
        ids_v2 = {t[0] for t in v2}
        ids_v3 = {t[0] for t in v3}
        assert 0 in ids_v2 and 0 not in ids_v3

        s1 = bm25_index_stats(spark, path, version=1)
        assert s1["version"] == 1 and s1["n_docs"] == 10
        assert bm25_index_stats(spark, path)["version"] == 3

    def test_batch_reader_takes_version(self, spark, docs, tmp_path):
        from parq_tools_spark.operators.search import (
            bm25_index_add,
            bm25_index_build,
            bm25_index_topk_batch,
        )

        path = os.path.join(str(tmp_path), "idx")
        bm25_index_build(
            docs.filter(F.col("doc_id") < 10), path, keep_versions=2
        )
        bm25_index_add(docs.filter(F.col("doc_id") >= 10), path)
        qdf = spark.createDataFrame(
            [(1, "stream merge")], "query_id long, query string"
        )
        old = bm25_index_topk_batch(spark, path, qdf, k=5, version=1)
        assert {r["index_version"] for r in old.collect()} == {1}
        assert all(r["doc_id"] < 10 for r in old.collect())

    def test_unretained_version_raises(self, spark, docs, tmp_path):
        from parq_tools_spark.operators.search import (
            bm25_index_add,
            bm25_index_build,
            bm25_index_topk,
        )

        path = os.path.join(str(tmp_path), "idx")
        bm25_index_build(docs.filter(F.col("doc_id") < 5), path)
        bm25_index_add(
            docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)),
            path,
        )
        # keep_versions=1: the NEXT maintenance cycle sweeps v1
        bm25_index_add(docs.filter(F.col("doc_id") >= 10), path)
        with pytest.raises(ValueError, match="not committed or no longer"):
            bm25_index_topk(spark, path, "stream", version=1)
        with pytest.raises(ValueError, match="keep_versions"):
            bm25_index_topk(spark, path, "stream", version=99)

    def test_retention_survives_maintenance_cycles(
        self, spark, docs, tmp_path
    ):
        from parq_tools_spark.operators.search import (
            bm25_index_add,
            bm25_index_build,
            bm25_index_topk,
        )

        path = os.path.join(str(tmp_path), "idx")
        bm25_index_build(
            docs.filter(F.col("doc_id") < 5), path, keep_versions=3
        )
        v1 = _topk_rows(bm25_index_topk(spark, path, "stream", k=3))
        for lo, hi in [(5, 8), (8, 11), (11, 14)]:
            bm25_index_add(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                path,
            )
        # 3 adds later (v4 current): v1 is still readable — sweeps run
        # at cycle START, so retention is keep_versions + the one-cycle
        # grace (v1 goes when a cycle starts with cur - 3 >= 1)
        assert _topk_rows(
            bm25_index_topk(spark, path, "stream", k=3, version=1)
        ) == v1
        bm25_index_add(docs.filter(F.col("doc_id") >= 14), path)
        with pytest.raises(ValueError, match="no longer retained"):
            bm25_index_topk(spark, path, "stream", version=1)
        # the oldest RETAINED version still serves
        bm25_index_topk(spark, path, "stream", version=2).collect()

    def test_keep_versions_validation(self, docs, tmp_path):
        from parq_tools_spark.operators.search import bm25_index_build

        with pytest.raises(ValueError, match="keep_versions"):
            bm25_index_build(
                docs, os.path.join(str(tmp_path), "x"), keep_versions=0
            )


class TestAnnTimeTravel:
    def test_version_read_is_pre_add_snapshot(self, spark, tmp_path):
        import numpy as np

        from parq_tools_spark.operators.ann_index import (
            ann_index_add,
            ann_index_build,
            ann_index_stats,
            ann_index_topk,
        )

        rng = np.random.RandomState(7)
        vecs = [
            (i, [float(x) for x in rng.standard_normal(8)])
            for i in range(40)
        ]
        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<double>"
        )
        path = os.path.join(str(tmp_path), "annidx")
        ann_index_build(
            emb.filter(F.col("vec_id") < 30),
            path,
            n_cells=4,
            m=4,
            n_codes=8,
            keep_versions=2,
        )
        queries = emb.filter(F.col("vec_id") < 2)
        before = [
            tuple(r)
            for r in ann_index_topk(spark, path, queries, k=5).collect()
        ]
        ann_index_add(emb.filter(F.col("vec_id") >= 30), path)
        travel = [
            tuple(r)
            for r in ann_index_topk(
                spark, path, queries, k=5, version=1
            ).collect()
        ]
        assert travel == before
        # the ADDED vectors serve at the current version but are
        # invisible at v1: with every cell probed and k = corpus size
        # the result set IS the visible id set (no quantization
        # ranking luck involved). Probing with added ids 30/31: the
        # query's own id is excluded by design (the shared
        # brute_force/ivf_pq self-exclusion), so each sees the OTHER
        # added vector at the current version and neither at v1.
        probe = emb.filter(F.col("vec_id").isin(30, 31)).select(
            "vec_id", "embedding"
        )
        cur = ann_index_topk(spark, path, probe, k=40, nprobe=4).collect()
        old = ann_index_topk(
            spark, path, probe, k=40, nprobe=4, version=1
        ).collect()
        for qid in (30, 31):
            cur_ids = {r[1] for r in cur if r["query_id"] == qid}
            old_ids = {r[1] for r in old if r["query_id"] == qid}
            assert cur_ids == set(range(40)) - {qid}
            assert old_ids == set(range(30))
        assert ann_index_stats(spark, path, version=1)["n_vecs"] == 30
        assert ann_index_stats(spark, path)["n_vecs"] == 40


class TestMinhashTimeTravel:
    def test_version_scopes_index_side(self, spark, tmp_path):
        from parq_tools_spark.operators.dedup import (
            minhash_index_add,
            minhash_index_query,
            minhash_index_write,
        )

        base = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        extra = spark.createDataFrame(
            [(2, "an entirely different document about spark engines")],
            "doc_id long, text string",
        )
        probe = spark.createDataFrame(
            [
                (101, "the quick brown fox jumps over the lazy dog"),
                (102, "an entirely different document about spark engines"),
            ],
            "doc_id long, text string",
        )
        path = os.path.join(str(tmp_path), "mhidx")
        minhash_index_write(base, path, keep_versions=2)
        minhash_index_add(extra, path)

        cur_ids = {
            r["id_indexed"]
            for r in minhash_index_query(
                spark, path, probe, threshold=0.9
            ).collect()
        }
        old_ids = {
            r["id_indexed"]
            for r in minhash_index_query(
                spark, path, probe, threshold=0.9, version=1
            ).collect()
        }
        assert cur_ids == {1, 2}
        assert old_ids == {1}

    def test_unknown_version_raises(self, spark, tmp_path):
        from parq_tools_spark.operators.dedup import (
            minhash_index_query,
            minhash_index_write,
        )

        base = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        path = os.path.join(str(tmp_path), "mhidx")
        minhash_index_write(base, path)
        with pytest.raises(ValueError, match="not committed"):
            minhash_index_query(
                spark, path, base, threshold=0.5, version=5
            )


class TestMinhashCdc:
    """CDC symmetry: the MinHash index absorbs the same change log the
    BM25/ANN indexes do (shared resolve_cdc), and the maintained index
    answers exactly like a from-scratch index on the resolved corpus."""

    BASE = {
        1: "the quick brown fox jumps over the lazy dog " * 3,
        2: "pack my box with five dozen liquor jugs tonight " * 3,
        3: "sphinx of black quartz judge my vow again " * 3,
    }

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_apply_cdc_matches_from_scratch(self, spark, tmp_path):
        from parq_tools_spark.operators.dedup import (
            minhash_index_apply_cdc,
            minhash_index_query,
            minhash_index_write,
        )

        path = str(tmp_path / "idx")
        minhash_index_write(
            self._df(spark, list(self.BASE.items())),
            path,
            num_hashes=64,
            bands=16,
        )
        new_2 = "a completely different text about spark engines " * 3
        changes = spark.createDataFrame(
            [
                (2, new_2, "U", 1),             # replace doc 2
                (3, None, "D", 1),              # remove doc 3
                (9, None, "D", 1),              # never indexed: no-op
                (4, self.BASE[1] + "tail", "I", 1),  # insert near-dup of 1
            ],
            "doc_id long, text string, op string, seq long",
        )
        res = minhash_index_apply_cdc(spark, path, changes, seq_col="seq")
        assert res["deleted"] == 1 and res["delete_noops"] == 1
        assert res["updated"] == 1 and res["inserted"] == 1

        fresh = str(tmp_path / "fresh")
        minhash_index_write(
            self._df(
                spark,
                [(1, self.BASE[1]), (2, new_2), (4, self.BASE[1] + "tail")],
            ),
            fresh,
            num_hashes=64,
            bands=16,
        )
        probe = self._df(
            spark,
            [(101, self.BASE[1]), (102, new_2), (103, self.BASE[3])],
        )

        def pairs(p):
            return sorted(
                (r["id_indexed"], r["id_new"], round(r["est_jaccard"], 6))
                for r in minhash_index_query(
                    spark, p, probe, threshold=0.5
                ).collect()
            )

        got, want = pairs(path), pairs(fresh)
        assert got == want
        ids = {t[0] for t in got}
        assert 3 not in ids          # deleted content gone
        assert {1, 2, 4} <= ids      # survivor, replacement, insert

    def test_upsert_guards_duplicate_ids(self, spark, tmp_path):
        from parq_tools_spark.operators.dedup import (
            minhash_index_upsert,
            minhash_index_write,
        )

        path = str(tmp_path / "idx")
        minhash_index_write(
            self._df(spark, [(1, "alpha beta gamma delta epsilon")]),
            path,
            num_hashes=32,
            bands=8,
        )
        dup = self._df(spark, [(5, "x y z"), (5, "x y z")])
        with pytest.raises(ValueError, match="duplicate"):
            minhash_index_upsert(dup, path)
