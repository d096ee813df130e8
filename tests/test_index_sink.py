"""Streaming BM25 index maintenance (streaming/index_sink.py): CDC
micro-batches fold into the persisted index exactly-once via the
shared checkpoint-scoped markers; replays converge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

CDC_SCHEMA = "doc_id long, text string, op string, seq long"

TEXTS = {
    0: "stream processing with windows and watermarks",
    1: "merge sort is a classic divide and conquer algorithm",
    2: "the quick brown fox jumps over the lazy dog",
    3: "spark shuffles data between stages during wide operations",
    4: "stream merge joins need ordered inputs",
    5: "vector search finds nearest neighbors in embedding space",
    6: "window functions rank rows within partitions",
    7: "broadcast joins avoid shuffling the large side",
    8: "columnar parquet files support predicate pushdown",
    9: "adaptive query execution replans at runtime",
}
UPDATED_2 = "a completely rewritten document about stream merge windows"


def _write_batches(spark, src_dir):
    """Three single-file micro-batches: I evens, I odds, then U id 2 +
    D ids {0, 5}. seq orders ops per id if a replay merges batches."""
    b0 = [(i, TEXTS[i], "I", 0) for i in range(0, 10, 2)]
    b1 = [(i, TEXTS[i], "I", 1) for i in range(1, 10, 2)]
    b2 = [(2, UPDATED_2, "U", 2), (0, None, "D", 2), (5, None, "D", 2)]
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1).write.parquet(
            os.path.join(src_dir, f"f{i}")
        )


def _expected_corpus(spark):
    rows = [
        (i, UPDATED_2 if i == 2 else TEXTS[i])
        for i in range(10)
        if i not in (0, 5)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, src_dir, index_path, ckpt, **kw):
    from parq_tools_spark.streaming.index_sink import (
        start_bm25_index_stream,
    )

    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )
    q = start_bm25_index_stream(
        stream, index_path, ckpt, seq_col="seq", **kw
    )
    assert q.awaitTermination(180), "stream did not drain in 180s"


def _topk(spark, index_path, k=8):
    from parq_tools_spark.operators.search import bm25_index_topk

    return [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_index_topk(
            spark, index_path, "stream merge window", k=k
        ).collect()
    ]


def test_stream_matches_from_scratch_scan(spark, tmp_path):
    from parq_tools_spark.operators.search import bm25_topk

    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(spark, str(src))
    index_path = str(tmp_path / "idx")
    _run(spark, str(src), index_path, str(tmp_path / "ck"))

    got = _topk(spark, index_path)
    want = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(
            _expected_corpus(spark), "stream merge window", k=8
        ).collect()
    ]
    assert got == want
    # deleted ids never surface
    assert all(d not in (0, 5) for d, _, _ in got)


def test_same_checkpoint_rerun_is_noop(spark, tmp_path):
    from parq_tools_spark.operators.search import bm25_index_stats

    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(spark, str(src))
    index_path = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    _run(spark, str(src), index_path, ck)
    v_before = bm25_index_stats(spark, index_path)["version"]
    before = _topk(spark, index_path)
    _run(spark, str(src), index_path, ck)
    assert bm25_index_stats(spark, index_path)["version"] == v_before
    assert _topk(spark, index_path) == before


def test_fresh_checkpoint_replay_converges(spark, tmp_path):
    """Worst recovery case: markers gone, fresh checkpoint — every
    batch re-applies. CDC re-application is final-state idempotent, so
    the served ranking must not change."""
    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(spark, str(src))
    index_path = str(tmp_path / "idx")
    _run(spark, str(src), index_path, str(tmp_path / "ck1"))
    before = _topk(spark, index_path)
    for f in os.listdir(index_path):
        if f.startswith("_stream_last_batch"):
            os.remove(os.path.join(index_path, f))
    _run(spark, str(src), index_path, str(tmp_path / "ck2"))
    assert _topk(spark, index_path) == before


def test_compact_every_preserves_results(spark, tmp_path):
    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(spark, str(src))
    plain = str(tmp_path / "idx_plain")
    compacted = str(tmp_path / "idx_compact")
    _run(spark, str(src), plain, str(tmp_path / "ckp"))
    _run(spark, str(src), compacted, str(tmp_path / "ckc"), compact_every=2)
    assert _topk(spark, compacted) == _topk(spark, plain)


def test_existing_index_params_govern(spark, tmp_path):
    """A pre-built index's stored params (here store_positions) rule;
    the stream extends it and phrase queries keep serving."""
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    seed = spark.createDataFrame(
        [(100, "stream merge window seed document")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    bm25_index_build(seed, index_path, store_positions=True)
    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(spark, str(src))
    _run(spark, str(src), index_path, str(tmp_path / "ck"))
    got = bm25_index_topk(
        spark, index_path, "stream merge", k=20, phrase="stream merge"
    ).collect()
    # both the seed doc and batch doc 4 contain the contiguous phrase
    assert {r["doc_id"] for r in got} >= {100, 4}


def test_rejects_batch_dataframe(spark):
    from parq_tools_spark.streaming.index_sink import (
        start_bm25_index_stream,
    )

    df = spark.createDataFrame([(1, "x", "I", 0)], CDC_SCHEMA)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        start_bm25_index_stream(df, "/tmp/nope", "/tmp/nope_ck")
