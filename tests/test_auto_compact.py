"""Stats-driven auto-compaction (the shared
``_index_common.maybe_compact`` trigger and the four per-family
``*_maybe_compact`` wrappers): compaction runs exactly when the live
manifest's own fragmentation signals cross their bounds — segment
count, tombstoned-id fraction (families with a row counter), or
pending tombstone-batch count (families without) — and never changes
query results. The streaming sinks consult the wrappers each batch
when armed, so segment count stays BOUNDED over an unbounded stream
(the generalization of the count-based ``compact_every``)."""

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")


def _third(df, col, i):
    return df.filter(F.col(col) % 3 == i)


def test_ann_maybe_compact_segment_and_tombstone_bounds(
    spark, emb, tmp_path
):
    from parq_tools_spark.operators.ann_index import (
        ann_index_add,
        ann_index_build,
        ann_index_delete,
        ann_index_maybe_compact,
        ann_index_stats,
        ann_index_topk,
    )

    path = str(tmp_path / "ann")
    ann_index_build(_third(emb, "vec_id", 0), path, n_cells=4, m=8,
                    n_codes=16)
    for i in (1, 2):
        ann_index_add(_third(emb, "vec_id", i), path)
    qs = emb.filter(F.col("vec_id") < 3)

    def topk():
        return sorted(
            (r.query_id, r.vec_id, r.pq_score, r.rank)
            for r in ann_index_topk(spark, path, qs, k=5, nprobe=4)
            .select("query_id", "vec_id", "pq_score", "rank").collect()
        )

    before = topk()
    # under the bound: O(manifest) no-op
    assert ann_index_maybe_compact(spark, path, max_segments=8) is False
    assert ann_index_stats(spark, path)["n_segments"] == 3
    # breach -> folds to ONE segment, results unchanged
    assert ann_index_maybe_compact(spark, path, max_segments=2) is True
    assert ann_index_stats(spark, path)["n_segments"] == 1
    assert topk() == before
    # tombstone-fraction trigger: >20% of n_vecs deleted
    n = emb.count()
    dead = [r.vec_id for r in emb.limit(int(n * 0.25)).collect()]
    ann_index_delete(spark, path, dead)
    assert ann_index_maybe_compact(
        spark, path, max_segments=0, max_tombstone_frac=0.2
    ) is True
    st = ann_index_stats(spark, path)
    assert st["pending_delete_batches"] == 0
    got_ids = {
        r.vec_id
        for r in ann_index_topk(spark, path, qs, k=n, nprobe=4)
        .select("vec_id").collect()
    }
    assert got_ids.isdisjoint(set(dead))


def test_bm25_maybe_compact_bounds(spark, docs, tmp_path):
    from parq_tools_spark.operators.search import (
        bm25_index_add,
        bm25_index_build,
        bm25_index_delete,
        bm25_index_maybe_compact,
        bm25_index_stats,
        bm25_index_topk,
    )

    path = str(tmp_path / "bm25")
    bm25_index_build(_third(docs, "doc_id", 0), path, n_buckets=8)
    for i in (1, 2):
        bm25_index_add(_third(docs, "doc_id", i), path)

    def top():
        return [
            (r.doc_id, r.score)
            for r in bm25_index_topk(
                spark, path, "customer value table", k=10
            ).select("doc_id", "score").collect()
        ]

    before = top()
    assert bm25_index_maybe_compact(spark, path, max_segments=8) is False
    assert bm25_index_stats(spark, path)["n_segments"] == 3
    assert bm25_index_maybe_compact(spark, path, max_segments=2) is True
    assert bm25_index_stats(spark, path)["n_segments"] == 1
    assert top() == before
    # tombstone fraction over n_docs
    dead = [r.doc_id for r in docs.limit(20).collect()]
    bm25_index_delete(spark, path, dead)
    assert bm25_index_maybe_compact(
        spark, path, max_tombstone_frac=0.2
    ) is True
    assert bm25_index_stats(spark, path)["pending_delete_batches"] == 0


def test_minhash_maybe_compact_bounds(spark, docs, tmp_path):
    from parq_tools_spark.operators.dedup import (
        _index_manifest,
        minhash_index_add,
        minhash_index_delete,
        minhash_index_maybe_compact,
        minhash_index_query,
        minhash_index_write,
    )

    path = str(tmp_path / "mh")
    minhash_index_write(_third(docs, "doc_id", 0), path, num_hashes=32,
                        bands=8)
    for i in (1, 2):
        minhash_index_add(_third(docs, "doc_id", i), path)
    probe = docs.filter(F.col("doc_id") < 10)

    def pairs():
        return sorted(
            (r.id_indexed, r.id_new, r.est_jaccard)
            for r in minhash_index_query(
                spark, path, probe, exclude_same_id=False
            ).collect()
        )

    before = pairs()
    assert minhash_index_maybe_compact(
        spark, path, max_segments=8
    ) is False
    assert len(_index_manifest(spark, path)[2]) == 3
    assert minhash_index_maybe_compact(
        spark, path, max_segments=2, max_delete_batches=0
    ) is True
    assert len(_index_manifest(spark, path)[2]) == 1
    assert pairs() == before
    # no row counter in this family: pending-batch bound instead
    minhash_index_delete(spark, path, [0, 3])
    minhash_index_delete(spark, path, [6])
    assert minhash_index_maybe_compact(
        spark, path, max_segments=0, max_delete_batches=1
    ) is True
    assert minhash_index_maybe_compact(
        spark, path, max_segments=0, max_delete_batches=1
    ) is False  # folded


def test_simhash_maybe_compact_bounds(spark, docs, tmp_path):
    from parq_tools_spark.operators.simhash_index import (
        simhash_index_add,
        simhash_index_delete,
        simhash_index_maybe_compact,
        simhash_index_query,
        simhash_index_stats,
        simhash_index_write,
    )

    path = str(tmp_path / "sh")
    simhash_index_write(_third(docs, "doc_id", 0), path)
    for i in (1, 2):
        simhash_index_add(_third(docs, "doc_id", i), path)
    probe = docs.filter(F.col("doc_id") < 10)

    def pairs():
        return sorted(
            (r.id_indexed, r.id_new, r.hamming)
            for r in simhash_index_query(
                spark, path, probe, max_hamming=3,
                exclude_same_id=False,
            ).collect()
        )

    before = pairs()
    assert simhash_index_maybe_compact(
        spark, path, max_segments=8
    ) is False
    assert simhash_index_stats(spark, path)["n_segments"] == 3
    assert simhash_index_maybe_compact(
        spark, path, max_segments=2, max_delete_batches=0
    ) is True
    assert simhash_index_stats(spark, path)["n_segments"] == 1
    assert pairs() == before
    simhash_index_delete(spark, path, [0, 3])
    simhash_index_delete(spark, path, [6])
    assert simhash_index_maybe_compact(
        spark, path, max_segments=0, max_delete_batches=1
    ) is True
    assert simhash_index_stats(
        spark, path
    )["pending_delete_batches"] == 0


def test_bm25_sink_bounds_segments_with_stats_trigger(
    spark, docs, tmp_path
):
    """The sink-level contract: with ``max_segments`` armed, an
    unbounded insert stream keeps the manifest's segment count
    bounded (each fold compacts to 1, so it never exceeds
    max_segments + 1) and serves exactly like a from-scratch build
    over the same corpus."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
    )
    from parq_tools_spark.streaming.index_sink import (
        start_bm25_index_stream,
    )

    src = str(tmp_path / "src")
    for i in range(4):
        (
            docs.filter(F.col("doc_id") % 4 == i)
            .select(
                "doc_id", "text", F.lit("I").alias("op"),
                F.lit(i).alias("seq"),
            )
            .coalesce(1)
            .write.parquet(f"{src}/f{i}")
        )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, op string, seq long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    index_path = str(tmp_path / "idx")
    q = start_bm25_index_stream(
        stream, index_path, str(tmp_path / "ck"),
        seq_col="seq", max_segments=1,
    )
    assert q.awaitTermination(300), "stream did not drain"
    assert bm25_index_stats(spark, index_path)["n_segments"] <= 2
    fresh = str(tmp_path / "fresh")
    bm25_index_build(docs, fresh, n_buckets=32)
    got = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(
            spark, index_path, "customer value table", k=10
        ).select("doc_id", "score").collect()
    ]
    want = [
        (r.doc_id, r.score)
        for r in bm25_index_topk(
            spark, fresh, "customer value table", k=10
        ).select("doc_id", "score").collect()
    ]
    assert got == want


def test_segment_bound_folds_even_when_file_counts_pass(
    spark, emb, tmp_path
):
    """The review-found trap: a breached SEGMENT bound must fold even
    when no per-cell file count exceeds min_files_per_cell (the
    production shape — few, large, byte-target-sized files per
    segment). Unforced compact declines exactly this layout; the
    wrapper's force=True must commit a fold anyway, or maybe_compact
    would claim True forever while segments creep unbounded."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_add,
        ann_index_build,
        ann_index_compact,
        ann_index_maybe_compact,
        ann_index_stats,
    )

    path = str(tmp_path / "ann")
    ann_index_build(_third(emb, "vec_id", 0), path, n_cells=4, m=8,
                    n_codes=16)
    for i in (1, 2):
        ann_index_add(_third(emb, "vec_id", i), path)
    # per-cell file counts (~3) sit BELOW min_files_per_cell=8: the
    # count-triggered compact declines and commits nothing
    assert ann_index_compact(spark, path) == {}
    assert ann_index_stats(spark, path)["n_segments"] == 3
    # the stats-driven wrapper must fold regardless
    assert ann_index_maybe_compact(spark, path, max_segments=2) is True
    assert ann_index_stats(spark, path)["n_segments"] == 1


def test_tombstone_fraction_counts_distinct_ids_in_one_action(
    spark, emb, tmp_path
):
    """An id tombstoned in MORE THAN ONE pending batch (the upsert
    twice shape: each upsert tombstones the then-visible row) must
    count ONCE toward the tombstone fraction — the probe unions the
    pending batches and takes one distinct count, so the trigger
    never overcounts (and costs one job, not one per batch)."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_maybe_compact,
        ann_index_stats,
        ann_index_upsert,
    )

    sub = emb.filter(F.col("vec_id") < 30).select("vec_id", "embedding")
    path = str(tmp_path / "ann")
    ann_index_build(sub, path, n_cells=4, m=8, n_codes=16)
    one = sub.filter(F.col("vec_id") == 7)
    # two upserts of the same id -> two pending del- batches, both
    # naming id 7; distinct dead ids = 1, naive per-batch sum = 2
    ann_index_upsert(one, path)
    ann_index_upsert(one, path)
    st = ann_index_stats(spark, path)
    assert st["pending_delete_batches"] == 2
    n = st["n_vecs"]
    assert n == 30
    # threshold between 1 and 2 dead ids: 1.5/n — the overcounting
    # probe would fire, the distinct one must not
    assert (
        ann_index_maybe_compact(
            spark, path, max_segments=10_000,
            max_tombstone_frac=1.5 / n,
        )
        is False
    )
    # and it still fires when the DISTINCT count crosses the bound
    assert (
        ann_index_maybe_compact(
            spark, path, max_segments=10_000,
            max_tombstone_frac=0.5 / n,
        )
        is True
    )
    assert ann_index_stats(spark, path)["pending_delete_batches"] == 0
