"""Semantic (embedding) streaming admission: the SemDeDup-over-a-
persisted-ANN-index pair — ``semantic_dedupe_incremental``
(operators/ann_index.py) and ``start_semantic_dedupe_stream``
(streaming/near_dedup.py).

Beyond-reference surface (the reference has no vector operators at
all); the contracts under test are the ones the docstrings claim:
single-batch equivalence with ``similarity.semantic_dedupe``, the
admitted-survivors-only cross-batch rule, replay convergence (the
crash-recovery guarantee, including the bootstrap's single atomic
commit), the stored-vector requirement, the id-type guard, and the
``max_batch_rows`` broadcast cap.
"""

from __future__ import annotations

import os
import re

import pytest

from pyspark.sql import functions as F


def _vec_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture()
def clustered_batches(spark):
    """Hand-built 4-d corpus with KNOWN duplicate structure: scaled
    copies are exact cosine-1 duplicates (and land in the same IVF
    cell regardless of which rows hash-seed the centroids, because a
    positive scaling preserves every centroid cosine)."""
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    e3 = [0.0, 0.0, 1.0, 0.0]
    e4 = [0.0, 0.0, 0.0, 1.0]
    mix = [1.0, 1.0, 1.0, 1.0]

    def s(v, k):
        return [k * x for x in v]

    b0 = [(0, e1), (1, s(e1, 2.0)), (2, e2), (3, e3)]
    b1 = [(10, s(e1, 3.0)), (11, s(e2, 1.5)), (12, e4)]
    b2 = [(20, s(e4, 2.0)), (21, mix), (22, s(mix, 2.0))]
    # at threshold 0.95: batch0 drops 1 (lower-id dup 0); batch1
    # drops 10 (admitted 0) and 11 (admitted 2); batch2 drops 20
    # (admitted 12) and 22 (in-batch lower-id 21).
    expected_admitted = {0, 2, 3, 12, 21}
    return (
        _vec_df(spark, b0),
        _vec_df(spark, b1),
        _vec_df(spark, b2),
        expected_admitted,
    )


def _run_stream(spark, src_glob, work, tag, max_batch_rows=100_000):
    from parq_tools_spark.streaming.near_dedup import (
        start_semantic_dedupe_stream,
    )

    out = os.path.join(work, f"out_{tag}")
    ck = os.path.join(work, f"ck_{tag}")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    q = start_semantic_dedupe_stream(
        stream,
        os.path.join(work, "idx"),
        out,
        ck,
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.95,
        n_cells=2,
        m=2,
        n_codes=4,
        max_batch_rows=max_batch_rows,
    )
    assert q.awaitTermination(300), "stream did not drain in 300s"
    return out


def _admitted(spark, out):
    return sorted(
        r.vec_id
        for r in spark.read.parquet(out).select("vec_id").collect()
    )


class TestSemanticStream:
    def test_three_batch_admission_and_replay_convergence(
        self, spark, tmp_path, clustered_batches
    ):
        """3-micro-batch run admits exactly the expected survivor set;
        a full replay (fresh checkpoint — the post-crash worst case
        where NO marker survived but the index did) through the
        incremental path reproduces it bit-for-bit. Batch 0 contains
        an in-batch duplicate pair (0, 1), so this also pins the
        bootstrap atomicity fix: the committed index holds only
        survivor 0 — under the old build-then-tombstone bootstrap the
        replay index held both 0 and 1, and 0 was silently dropped
        via its sibling's copy."""
        b0, b1, b2, expected = clustered_batches
        work = str(tmp_path)
        src = os.path.join(work, "src")
        for i, b in enumerate([b0, b1, b2]):
            b.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))

        out1 = _run_stream(spark, os.path.join(src, "*"), work, "run1")
        assert _admitted(spark, out1) == sorted(expected)

        # survivor 0 must be in the committed index exactly once and
        # its dropped sibling 1 must not be (atomic bootstrap)
        from parq_tools_spark.operators.ann_index import (
            ann_index_stats,
        )

        stats = ann_index_stats(spark, os.path.join(work, "idx"))
        assert stats["n_vecs"] == len(expected)

        out2 = _run_stream(spark, os.path.join(src, "*"), work, "run2")
        assert _admitted(spark, out2) == sorted(expected)
        # the replayed upsert converges: same logical index content
        assert (
            ann_index_stats(spark, os.path.join(work, "idx"))["n_vecs"]
            == len(expected)
        )

    def test_bootstrap_single_batch_equals_semantic_dedupe(
        self, spark, sf_dir, tmp_path
    ):
        """Model identity gate: one batch = the whole corpus, so the
        stream's frozen bootstrap model IS semantic_dedupe's
        hash-seeded model and the admitted set must match the batch
        operator exactly."""
        from parq_tools_spark.operators.similarity import (
            semantic_dedupe,
        )
        from parq_tools_spark.streaming.near_dedup import (
            start_semantic_dedupe_stream,
        )

        emb = (
            spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            )
            .filter(F.col("vec_id") < 200)
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias(
                    "embedding"
                ),
            )
        )
        work = str(tmp_path)
        src = os.path.join(work, "src")
        emb.coalesce(1).write.parquet(os.path.join(src, "f0"))
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        out = os.path.join(work, "out")
        q = start_semantic_dedupe_stream(
            stream,
            os.path.join(work, "idx"),
            out,
            os.path.join(work, "ck"),
            id_col="vec_id",
            vec_col="embedding",
            threshold=0.35,
            n_cells=4,
        )
        assert q.awaitTermination(300)
        expected = sorted(
            r.vec_id
            for r in semantic_dedupe(emb, threshold=0.35, n_cells=4)
            .select("vec_id")
            .collect()
        )
        assert _admitted(spark, out) == expected

    def test_stream_batch_cap_fails_loudly(
        self, spark, tmp_path, clustered_batches
    ):
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        b0, _, _, _ = clustered_batches
        work = str(tmp_path)
        src = os.path.join(work, "src")
        b0.coalesce(1).write.parquet(os.path.join(src, "f0"))
        with pytest.raises(StreamingQueryException) as ei:
            _run_stream(
                spark, os.path.join(src, "*"), work, "cap",
                max_batch_rows=2,
            )
        assert "max_batch_rows" in str(ei.value)


class TestSemanticIncremental:
    @pytest.fixture()
    def built_index(self, spark, tmp_path, clustered_batches):
        from parq_tools_spark.operators.ann_index import (
            ann_index_build,
        )

        b0, b1, b2, expected = clustered_batches
        path = str(tmp_path / "idx")
        ann_index_build(
            b0,
            path,
            n_cells=2,
            m=2,
            n_codes=4,
            store_vectors=True,
        )
        return path, b0, b1, b2, expected

    def test_index_dup_in_batch_dup_and_fresh_row(
        self, spark, built_index
    ):
        """One call exercises all three outcomes: dropped vs an
        indexed neighbor, dropped vs a lower-id in-batch sibling,
        admitted fresh row."""
        from parq_tools_spark.operators.ann_index import (
            semantic_dedupe_incremental,
        )

        path, b0, _, _, _ = built_index
        batch = _vec_df(
            spark,
            [
                (30, [4.0, 0.0, 0.0, 0.0]),  # dup of indexed 0
                (31, [0.0, 0.0, 0.0, 1.0]),  # fresh — admitted
                (32, [0.0, 0.0, 0.0, 5.0]),  # in-batch dup of 31
            ],
        )
        got = sorted(
            r.vec_id
            for r in semantic_dedupe_incremental(
                spark, path, batch, threshold=0.95
            )
            .select("vec_id")
            .collect()
        )
        assert got == [31]

    def test_replay_idempotent_with_update_index(
        self, spark, built_index
    ):
        """The streaming sink's crash contract: recomputing a batch
        whose survivors were already upserted returns the identical
        survivor set and leaves the index logically unchanged."""
        from parq_tools_spark.operators.ann_index import (
            ann_index_stats,
            semantic_dedupe_incremental,
        )

        path, *_ = built_index
        batch = _vec_df(
            spark,
            [
                (40, [0.0, 0.0, 0.0, 1.0]),
                (41, [0.0, 0.0, 0.0, 2.0]),  # in-batch dup of 40
                (42, [1.0, 1.0, 0.0, 0.0]),  # fresh
            ],
        )
        first = sorted(
            r.vec_id
            for r in semantic_dedupe_incremental(
                spark, path, batch, threshold=0.95, update_index=True
            )
            .select("vec_id")
            .collect()
        )
        assert first == [40, 42]
        n_after_first = ann_index_stats(spark, path)["n_vecs"]
        replay = sorted(
            r.vec_id
            for r in semantic_dedupe_incremental(
                spark, path, batch, threshold=0.95, update_index=True
            )
            .select("vec_id")
            .collect()
        )
        assert replay == first
        assert ann_index_stats(spark, path)["n_vecs"] == n_after_first

    def test_requires_stored_vectors(self, spark, tmp_path):
        from parq_tools_spark.operators.ann_index import (
            ann_index_build,
            semantic_dedupe_incremental,
        )

        corpus = _vec_df(
            spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        )
        path = str(tmp_path / "novec")
        ann_index_build(
            corpus, path, n_cells=2, m=2, n_codes=2,
            store_vectors=False,
        )
        with pytest.raises(ValueError, match="store_vectors"):
            semantic_dedupe_incremental(
                spark, path, corpus.limit(1)
            )

    def test_id_type_guard_names_the_remedy(self, spark, built_index):
        from parq_tools_spark.operators.ann_index import (
            semantic_dedupe_incremental,
        )

        path, *_ = built_index
        bad = spark.createDataFrame(
            [("x", [1.0, 0.0, 0.0, 0.0])],
            "vec_id string, embedding array<double>",
        )
        with pytest.raises(ValueError, match="re-id the batch"):
            semantic_dedupe_incremental(spark, path, bad)

    def test_batch_cap(self, spark, built_index):
        from parq_tools_spark.operators.ann_index import (
            semantic_dedupe_incremental,
        )

        path, b0, *_ = built_index
        with pytest.raises(ValueError, match="max_batch_rows"):
            semantic_dedupe_incremental(
                spark, path, b0, max_batch_rows=2
            )

    def test_plan_never_rescans_corpus(self, spark, sf_dir, tmp_path):
        """Plan lock: the admission read is the cell-pruned
        stored-vector scan of the INDEX — the source corpus parquet
        never appears in the plan, and the index read carries a
        cell= PartitionFilter (planning-time pruning to the batch's
        touched cells)."""
        from parq_tools_spark.operators.ann_index import (
            ann_index_build,
            semantic_dedupe_incremental,
        )

        emb = (
            spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            )
            .filter(F.col("vec_id") < 200)
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias(
                    "embedding"
                ),
            )
        )
        path = str(tmp_path / "idx")
        ann_index_build(
            emb, path, n_cells=4, m=4, n_codes=8, store_vectors=True
        )
        dim = len(emb.first()["embedding"])
        batch = _vec_df(
            spark,
            [(9001, [1.0] + [0.0] * (dim - 1))],
        )
        df = semantic_dedupe_incremental(
            spark, path, batch, threshold=0.95
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "embeddings.parquet" not in plan
        assert re.search(r"PartitionFilters: \[.*cell.*\]", plan)
        assert "SortMergeJoin" not in plan


class TestScopedAdmission:
    def test_allowed_ids_equals_prefiltered_index(
        self, spark, tmp_path, clustered_batches
    ):
        """The scoped-admission equivalence: admission with
        allowed_ids=S over index I must equal admission over an index
        holding only I ∩ S under the SAME frozen model (train_corpus=
        pins the model, so the only difference is who may block)."""
        from parq_tools_spark.operators.ann_index import (
            ann_index_build,
            semantic_dedupe_incremental,
        )

        b0, b1, _, _ = clustered_batches
        allowed = [0, 3]  # indexed 1 and 2 may no longer block
        full = str(tmp_path / "full")
        scoped = str(tmp_path / "scoped")
        ann_index_build(
            b0, full, n_cells=2, m=2, n_codes=4, store_vectors=True
        )
        ann_index_build(
            b0.filter(F.col("vec_id").isin(allowed)),
            scoped,
            n_cells=2, m=2, n_codes=4, store_vectors=True,
            train_corpus=b0,
        )
        batch = b1  # 10 dups indexed 0 (allowed), 11 dups indexed 2
        # (NOT allowed -> must now be admitted), 12 fresh

        def admitted(path, **kw):
            return sorted(
                r.vec_id
                for r in semantic_dedupe_incremental(
                    spark, path, batch, threshold=0.95, **kw
                ).select("vec_id").collect()
            )

        got_list = admitted(full, allowed_ids=allowed)
        got_df = admitted(
            full,
            allowed_ids=spark.createDataFrame(
                [(i,) for i in allowed], "vec_id long"
            ),
        )
        want = admitted(scoped)
        assert got_list == want == [11, 12]
        assert got_df == want
        # unscoped baseline differs: 11 is blocked by indexed 2
        assert admitted(full) == [12]

    def test_in_batch_rule_is_not_scoped(self, spark, tmp_path):
        """allowed_ids scopes INDEX blockers only: a lower-id sibling
        within the batch still blocks regardless of the filter."""
        from parq_tools_spark.operators.ann_index import (
            ann_index_build,
            semantic_dedupe_incremental,
        )

        seed = _vec_df(spark, [(0, [1.0, 0.0, 0.0, 0.0]),
                               (1, [0.0, 1.0, 0.0, 0.0])])
        path = str(tmp_path / "idx")
        ann_index_build(
            seed, path, n_cells=2, m=2, n_codes=4, store_vectors=True
        )
        batch = _vec_df(
            spark,
            [(40, [0.0, 0.0, 1.0, 0.0]), (41, [0.0, 0.0, 2.0, 0.0])],
        )
        got = sorted(
            r.vec_id
            for r in semantic_dedupe_incremental(
                spark, path, batch, threshold=0.95, allowed_ids=[]
            ).select("vec_id").collect()
        )
        assert got == [40]  # 41 still dropped by in-batch lower-id 40


class TestWhereScope:
    def test_where_equals_allowed_ids_and_prefiltered_index(
        self, spark, tmp_path, clustered_batches
    ):
        """where= over stored metadata scopes admission exactly like
        the equivalent allowed_ids set and like an index built on the
        predicate's subset under the same frozen model."""
        from parq_tools_spark.operators.ann_index import (
            ann_index_build,
            semantic_dedupe_incremental,
        )
        from parq_tools_spark.plans.query_parser import FilterParseError

        b0, b1, _, _ = clustered_batches
        # tenant 0 = vec_ids {0, 3}; tenant 1 = {1, 2}
        b0m = b0.withColumn(
            "tenant", F.when(F.col("vec_id").isin(0, 3), 0).otherwise(1)
        )
        full = str(tmp_path / "full")
        scoped = str(tmp_path / "scoped")
        ann_index_build(
            b0m, full, n_cells=2, m=2, n_codes=4,
            store_vectors=True, store_cols=["tenant"],
        )
        ann_index_build(
            b0m.filter(F.col("tenant") == 0), scoped,
            n_cells=2, m=2, n_codes=4, store_vectors=True,
            train_corpus=b0m.select("vec_id", "embedding"),
            store_cols=["tenant"],
        )

        def admitted(path, **kw):
            return sorted(
                r.vec_id
                for r in semantic_dedupe_incremental(
                    spark, path, b1, threshold=0.95, **kw
                ).select("vec_id").collect()
            )

        got = admitted(full, where="tenant == 0")
        via_ids = admitted(full, allowed_ids=[0, 3])
        want = admitted(scoped)
        assert got == via_ids == want == [11, 12]
        # composes with allowed_ids (both apply): scoping tenant-0
        # AND allowing only id 3 frees 10 (blocked by 0 before)
        assert admitted(
            full, where="tenant == 0", allowed_ids=[3]
        ) == [10, 11, 12]
        # guards: loud on a missing column, loud without store_cols
        with pytest.raises(FilterParseError):
            admitted(full, where="nope == 1")
        bare = str(tmp_path / "bare")
        ann_index_build(
            b0, bare, n_cells=2, m=2, n_codes=4, store_vectors=True
        )
        with pytest.raises(ValueError, match="store_cols"):
            admitted(bare, where="tenant == 0")


class TestStoreColsBootstrap:
    def test_cold_start_scoped_stream_equals_batch_path(
        self, spark, tmp_path, clustered_batches
    ):
        """store_cols= on the semantic admission sink: a COLD-started
        stream bootstraps a store_cols index from its model-freezing
        first batch, so where=-scoped admission serves from batch 1
        with no out-of-band pre-build — and equals the batch
        composition (semantic_dedupe_bootstrap + scoped
        semantic_dedupe_incremental per batch)."""
        from parq_tools_spark.operators.ann_index import (
            ann_index_stats,
            semantic_dedupe_bootstrap,
            semantic_dedupe_incremental,
        )
        from parq_tools_spark.streaming.near_dedup import (
            start_semantic_dedupe_stream,
        )

        b0, b1, b2, _ = clustered_batches
        # tenant 0 = {0, 3}: indexed 2 (tenant 1) may no longer block,
        # so scoped admission frees 11 (its dup) vs the unscoped run
        tenant = F.when(F.col("vec_id").isin(0, 3), 0).otherwise(1)
        b0m, b1m, b2m = (
            b.withColumn("tenant", tenant) for b in (b0, b1, b2)
        )
        work = str(tmp_path)
        src = os.path.join(work, "src")
        for i, b in enumerate([b0m, b1m, b2m]):
            b.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<double>, tenant int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        idx = os.path.join(work, "idx")
        out = os.path.join(work, "out")
        q = start_semantic_dedupe_stream(
            stream, idx, out, os.path.join(work, "ck"),
            threshold=0.95, n_cells=2, m=2, n_codes=4,
            store_cols=["tenant"], where="tenant == 0",
        )
        assert q.awaitTermination(300)
        admitted = _admitted(spark, out)
        assert ann_index_stats(spark, idx)["params"]["store_cols"] == [
            "tenant"
        ]

        # batch composition under the same frozen model
        idx2 = os.path.join(work, "idx2")
        got = sorted(
            r.vec_id
            for r in semantic_dedupe_bootstrap(
                b0m, idx2, threshold=0.95, n_cells=2, m=2, n_codes=4,
                store_cols=["tenant"],
            ).select("vec_id").collect()
        )
        for b in (b1m, b2m):
            got += sorted(
                r.vec_id
                for r in semantic_dedupe_incremental(
                    spark, idx2, b, threshold=0.95,
                    update_index=True, where="tenant == 0",
                ).select("vec_id").collect()
            )
        assert admitted == sorted(got)
        # the scope MATTERED: unscoped run admits a different set
        out_u = os.path.join(work, "out_u")
        stream2 = (
            spark.readStream.schema(
                "vec_id long, embedding array<double>, tenant int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q2 = start_semantic_dedupe_stream(
            stream2, os.path.join(work, "idx_u"), out_u,
            os.path.join(work, "ck_u"),
            threshold=0.95, n_cells=2, m=2, n_codes=4,
            store_cols=["tenant"],
        )
        assert q2.awaitTermination(300)
        assert _admitted(spark, out_u) != admitted

    def test_bootstrap_batch_missing_store_col_fails_loudly(
        self, spark, tmp_path, clustered_batches
    ):
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )
        from parq_tools_spark.streaming.near_dedup import (
            start_semantic_dedupe_stream,
        )

        b0, _, _, _ = clustered_batches
        work = str(tmp_path)
        src = os.path.join(work, "src")
        b0.coalesce(1).write.parquet(os.path.join(src, "f0"))
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(os.path.join(src, "*"))
        q = start_semantic_dedupe_stream(
            stream, os.path.join(work, "idx"), os.path.join(work, "out"),
            os.path.join(work, "ck"),
            threshold=0.95, n_cells=2, m=2, n_codes=4,
            store_cols=["tenant"],
        )
        with pytest.raises(StreamingQueryException) as ei:
            q.awaitTermination(300)
        assert "tenant" in str(ei.value)
