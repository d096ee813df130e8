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
        start_ann_index_stream,
        start_bm25_index_stream,
    )

    df = spark.createDataFrame([(1, "x", "I", 0)], CDC_SCHEMA)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        start_bm25_index_stream(df, "/tmp/nope", "/tmp/nope_ck")
    vdf = spark.createDataFrame(
        [(1, [1.0], "I", 0)],
        "vec_id long, embedding array<double>, op string, seq long",
    )
    with pytest.raises(ValueError, match="streaming DataFrame"):
        start_ann_index_stream(vdf, "/tmp/nope2", "/tmp/nope2_ck")


# ------------------------------------------------------------------ ANN
ANN_CDC_SCHEMA = "vec_id long, embedding array<double>, op string, seq long"


def _ann_vecs(n, seed=11, dim=8):
    import numpy as np

    rng = np.random.RandomState(seed)
    return {i: [float(x) for x in rng.standard_normal(dim)] for i in range(n)}


def _ann_write_batches(spark, src_dir, vecs):
    """b0: I ids 0..29; b1: I ids 30..39; b2: U ids {1, 2} (replaced
    vectors) + D ids {0, 5, 35}."""
    b0 = [(i, vecs[i], "I", 0) for i in range(30)]
    b1 = [(i, vecs[i], "I", 1) for i in range(30, 40)]
    repl = _ann_vecs(3, seed=99)
    b2 = [(1, repl[0], "U", 2), (2, repl[1], "U", 2)] + [
        (i, None, "D", 2) for i in (0, 5, 35)
    ]
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, ANN_CDC_SCHEMA).coalesce(
            1
        ).write.parquet(os.path.join(src_dir, f"f{i}"))
    return [b0, b1, b2]


def _ann_run(spark, src_dir, index_path, ckpt, **kw):
    from parq_tools_spark.streaming.index_sink import (
        start_ann_index_stream,
    )

    stream = (
        spark.readStream.schema(ANN_CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )
    q = start_ann_index_stream(
        stream, index_path, ckpt, seq_col="seq",
        n_cells=4, m=4, n_codes=8, **kw
    )
    assert q.awaitTermination(180), "ann stream did not drain in 180s"


def _ann_full(spark, index_path, vecs, qid=7):
    from parq_tools_spark.operators.ann_index import ann_index_topk

    probe = spark.createDataFrame(
        [(qid, vecs[qid])], "vec_id long, embedding array<double>"
    )
    return sorted(
        tuple(r)
        for r in ann_index_topk(
            spark, index_path, probe, k=100, nprobe=4
        ).collect()
    )


def test_ann_apply_cdc_semantics(spark, tmp_path):
    from parq_tools_spark.operators.ann_index import (
        ann_index_apply_cdc,
        ann_index_build,
        ann_index_stats,
    )

    vecs = _ann_vecs(10)
    emb = spark.createDataFrame(
        [(i, vecs[i]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    ann_index_build(emb, path, n_cells=2, m=4, n_codes=8)
    repl = _ann_vecs(1, seed=50)
    changes = spark.createDataFrame(
        [
            (3, repl[0], "U", 1),     # update
            (0, None, "D", 1),        # delete
            (99, None, "D", 1),       # delete of never-indexed: no-op
            (11, vecs[5], "I", 1),    # insert (new id, reused vector)
            (12, vecs[6], "I", 1),    # I then D in one batch -> D, noop
            (12, None, "D", 2),
        ],
        ANN_CDC_SCHEMA,
    )
    res = ann_index_apply_cdc(spark, path, changes, seq_col="seq")
    assert res["deleted"] == 1
    assert res["delete_noops"] == 2
    assert res["updated"] == 1
    assert res["inserted"] == 1
    assert ann_index_stats(spark, path)["n_vecs"] == 10  # 10 -1 +1


def test_ann_stream_equals_batch_cdc_path(spark, tmp_path):
    """Stream-fed index must serve bit-identically to the batch path
    (build on b0's inserts, apply_cdc b1 and b2) — same bootstrap
    corpus => same frozen model => same codes and scores."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_apply_cdc,
        ann_index_build,
        ann_index_stats,
    )

    vecs = _ann_vecs(40)
    src = tmp_path / "cdc"
    src.mkdir()
    batches = _ann_write_batches(spark, str(src), vecs)
    stream_idx = str(tmp_path / "sidx")
    _ann_run(spark, str(src), stream_idx, str(tmp_path / "ck"))

    batch_idx = str(tmp_path / "bidx")
    seed = spark.createDataFrame(batches[0], ANN_CDC_SCHEMA).select(
        "vec_id", "embedding"
    )
    ann_index_build(seed, batch_idx, n_cells=4, m=4, n_codes=8)
    for rows in batches[1:]:
        ann_index_apply_cdc(
            spark,
            batch_idx,
            spark.createDataFrame(rows, ANN_CDC_SCHEMA),
            seq_col="seq",
        )
    assert _ann_full(spark, stream_idx, vecs) == _ann_full(
        spark, batch_idx, vecs
    )
    # 40 inserted, 3 deleted; updates replace in place
    assert ann_index_stats(spark, stream_idx)["n_vecs"] == 37
    visible = {t[1] for t in _ann_full(spark, stream_idx, vecs)}
    assert visible == set(range(40)) - {0, 5, 35, 7}  # 7 = probe self


def test_ann_stream_same_checkpoint_rerun_is_noop(spark, tmp_path):
    from parq_tools_spark.operators.ann_index import ann_index_stats

    vecs = _ann_vecs(40)
    src = tmp_path / "cdc"
    src.mkdir()
    _ann_write_batches(spark, str(src), vecs)
    index_path = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    _ann_run(spark, str(src), index_path, ck)
    v = ann_index_stats(spark, index_path)["version"]
    before = _ann_full(spark, index_path, vecs)
    _ann_run(spark, str(src), index_path, ck)
    assert ann_index_stats(spark, index_path)["version"] == v
    assert _ann_full(spark, index_path, vecs) == before


def test_ann_stream_delete_only_first_batch_is_noop(spark, tmp_path):
    """A delete-only bootstrap batch resolves against no index: all
    no-ops, marker committed, the NEXT batch bootstraps."""
    from parq_tools_spark.operators.ann_index import ann_index_stats

    vecs = _ann_vecs(5)
    src = tmp_path / "cdc"
    src.mkdir()
    b0 = [(9, None, "D", 0)]
    b1 = [(i, vecs[i], "I", 1) for i in range(5)]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, ANN_CDC_SCHEMA).coalesce(
            1
        ).write.parquet(os.path.join(str(src), f"f{i}"))
    index_path = str(tmp_path / "idx")
    _ann_run(spark, str(src), index_path, str(tmp_path / "ck"))
    assert ann_index_stats(spark, index_path)["n_vecs"] == 5


def test_delete_only_cdc_batch_without_value_column(spark, tmp_path):
    """A change log of pure deletes carries no text/embedding column;
    all three apply_cdc paths must apply it cleanly (the BM25
    contract) instead of failing on a missing-column select."""
    from parq_tools_spark.operators.ann_index import (
        ann_index_apply_cdc,
        ann_index_build,
    )
    from parq_tools_spark.operators.dedup import (
        minhash_index_apply_cdc,
        minhash_index_write,
    )
    from parq_tools_spark.operators.search import (
        bm25_index_apply_cdc,
        bm25_index_build,
    )

    vecs = _ann_vecs(6)
    emb = spark.createDataFrame(
        [(i, vecs[i]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    ap = str(tmp_path / "ann")
    ann_index_build(emb, ap, n_cells=2, m=4, n_codes=8)
    dels = spark.createDataFrame(
        [(0, "D"), (99, "D")], "vec_id long, op string"
    )
    r = ann_index_apply_cdc(spark, ap, dels)
    assert r["deleted"] == 1 and r["delete_noops"] == 1

    docs = spark.createDataFrame(
        [(i, TEXTS[i]) for i in range(6)], "doc_id long, text string"
    )
    bp = str(tmp_path / "bm25")
    bm25_index_build(docs, bp)
    r = bm25_index_apply_cdc(
        spark,
        bp,
        spark.createDataFrame([(0, "D"), (99, "D")], "doc_id long, op string"),
    )
    assert r["deleted"] == 1 and r["delete_noops"] == 1

    mp = str(tmp_path / "mh")
    minhash_index_write(docs, mp, num_hashes=32, bands=8)
    r = minhash_index_apply_cdc(
        spark,
        mp,
        spark.createDataFrame([(0, "D"), (99, "D")], "doc_id long, op string"),
    )
    assert r["deleted"] == 1 and r["delete_noops"] == 1


def test_ann_stream_delete_only_bootstrap_with_compaction(spark, tmp_path):
    """compact_every must not crash-loop on a delete-only bootstrap
    batch (no index committed yet): compaction of nothing is a no-op
    and the stream proceeds to bootstrap on the next batch."""
    from parq_tools_spark.operators.ann_index import ann_index_stats

    vecs = _ann_vecs(5)
    src = tmp_path / "cdc"
    src.mkdir()
    b0 = [(9, None, "D", 0)]
    b1 = [(i, vecs[i], "I", 1) for i in range(5)]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, ANN_CDC_SCHEMA).coalesce(
            1
        ).write.parquet(os.path.join(str(src), f"f{i}"))
    index_path = str(tmp_path / "idx")
    _ann_run(
        spark, str(src), index_path, str(tmp_path / "ck"), compact_every=1
    )
    assert ann_index_stats(spark, index_path)["n_vecs"] == 5


def test_gopher_required_words_with_metacharacters(spark):
    """The custom-inventory knob must survive regex metacharacters."""
    from parq_tools_spark.operators.text import with_gopher_filter

    df = spark.createDataFrame(
        [(1, "we write c++ code and c++ tests " * 10)],
        "doc_id long, text string",
    )
    r = with_gopher_filter(
        df, required_words=("c++", "code"), min_required_words=2
    ).collect()[0]
    assert r["n_required_words"] == 2


def test_commit_marker_sweep_is_checkpoint_scoped(spark, tmp_path):
    """Two streaming queries with DISTINCT checkpoints maintaining
    the same index path: each commit must leave the other query's
    progress marker untouched (a blanket sweep would erase it every
    batch and force perpetual replays)."""
    from parq_tools_spark.streaming._markers import (
        commit_marker,
        last_applied,
    )

    idx = str(tmp_path / "idx")
    ck_a = str(tmp_path / "ck_a")
    ck_b = str(tmp_path / "ck_b")
    commit_marker(spark, idx, ck_a, 3)
    commit_marker(spark, idx, ck_b, 7)
    assert last_applied(spark, idx, ck_a) == 3
    assert last_applied(spark, idx, ck_b) == 7
    # a same-checkpoint recommit sweeps only its OWN older marker
    commit_marker(spark, idx, ck_a, 4)
    assert last_applied(spark, idx, ck_a) == 4
    assert last_applied(spark, idx, ck_b) == 7


def test_commit_marker_sweeps_legacy_only_when_own(spark, tmp_path):
    """The legacy unnumbered marker carries a checkpoint identity in
    its JSON: another checkpoint's commit must leave it; its own
    checkpoint's commit retires it."""
    import json

    from parq_tools_spark.streaming._markers import (
        MARKER,
        commit_marker,
        last_applied,
        marker_identity,
    )

    idx = str(tmp_path / "idx")
    os.makedirs(idx, exist_ok=True)
    ck_a = str(tmp_path / "ck_a")
    ck_b = str(tmp_path / "ck_b")
    with open(os.path.join(idx, MARKER), "w") as f:
        json.dump(
            {"checkpoint": marker_identity(spark, ck_a), "batch": 5}, f
        )
    commit_marker(spark, idx, ck_b, 1)
    assert last_applied(spark, idx, ck_a) == 5  # legacy survived B
    commit_marker(spark, idx, ck_a, 6)
    assert last_applied(spark, idx, ck_a) == 6
    assert not os.path.exists(os.path.join(idx, MARKER))


def test_stats_trigger_consulted_on_cadence_batches(spark, tmp_path):
    """compact_every and the stats bounds armed TOGETHER: the
    cadence's non-forced compact no-ops at this toy scale (per-bucket
    file counts sit below min_files_per_bucket), so only the stats
    trigger can fold the breached segment bound — and it must be
    consulted on the SAME batch the cadence ran, not one batch late
    (the old elif shape). With compact_every=1 every batch is a
    cadence batch, so any delay leaves the index un-folded."""
    from parq_tools_spark.operators.search import bm25_index_stats

    src = str(tmp_path / "src")
    _write_batches(spark, src)
    index_path = str(tmp_path / "idx")
    _run(
        spark, src, index_path, str(tmp_path / "ck"),
        compact_every=1, max_segments=1,
    )
    # every batch ended with a fold: bootstrap + fold -> 1 segment
    st = bm25_index_stats(spark, index_path)
    assert st["n_segments"] == 1
    assert st["pending_delete_batches"] == 0
    # and serving still matches the from-scratch scan
    from parq_tools_spark.operators.search import bm25_topk

    got = _topk(spark, index_path)
    want = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(
            _expected_corpus(spark), "stream merge window", k=8
        ).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------
# band-family CDC sinks: start_minhash_index_stream /
# start_simhash_index_stream — same markers, same replay convergence,
# same 'M'-fold semantics as the BM25/ANN sinks
# ---------------------------------------------------------------------

BAND_CDC_SCHEMA = (
    "doc_id long, text string, lang string, op string, seq long"
)


def _band_batches(spark, docs, src_dir):
    """Three micro-batches over the documents table: I evens (with
    lang), then U re-supplies + M re-grades, then D takedowns."""
    b0 = docs.filter("doc_id % 2 = 0").select(
        "doc_id", "text", "lang",
        F.lit("I").alias("op"), F.lit(0).cast("long").alias("seq"),
    )
    b1 = docs.filter("doc_id % 10 = 4").select(
        "doc_id", "text", "lang",
        F.lit("U").alias("op"), F.lit(1).cast("long").alias("seq"),
    ).unionByName(
        docs.filter("doc_id % 10 = 6").select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.lit("zz").alias("lang"),
            F.lit("M").alias("op"), F.lit(1).cast("long").alias("seq"),
        )
    )
    b2 = docs.filter("doc_id % 10 = 8").select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("D").alias("op"), F.lit(2).cast("long").alias("seq"),
    )
    import time

    for i, b in enumerate([b0, b1, b2]):
        d = os.path.join(src_dir, f"f{i}")
        b.coalesce(1).write.parquet(d)
        # distinct mtimes: FileStreamSource orders batches by mtime
        import glob as _g

        now = time.time()
        for f in _g.glob(os.path.join(d, "*.parquet")):
            os.utime(f, (now + i * 10, now + i * 10))
    return [b0, b1, b2]


def test_minhash_stream_equals_batch_cdc_path(spark, sf_dir, tmp_path):
    """Mixed U/D/M CDC stream through start_minhash_index_stream
    (store_cols bootstrapped cold) == the same batches through
    minhash_index_apply_cdc on an identically-bootstrapped index —
    queried with and without a where= scope."""
    from parq_tools_spark.operators.dedup import (
        minhash_index_apply_cdc,
        minhash_index_query,
        minhash_index_stats,
        minhash_index_write,
    )
    from parq_tools_spark.streaming.index_sink import (
        start_minhash_index_stream,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text", "lang")
    src = str(tmp_path / "cdc")
    batches = _band_batches(spark, docs, src)

    streamed = str(tmp_path / "streamed")
    stream = (
        spark.readStream.schema(BAND_CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_minhash_index_stream(
        stream, streamed, str(tmp_path / "ck"),
        seq_col="seq", num_hashes=32, bands=8,
        store_cols=["lang"],
    )
    assert q.awaitTermination(300), "stream did not drain in 300s"

    batch_idx = str(tmp_path / "batch")
    minhash_index_write(
        docs.limit(0), batch_idx, num_hashes=32, bands=8,
        store_cols=["lang"],
    )
    for b in batches:
        minhash_index_apply_cdc(spark, batch_idx, b, seq_col="seq")

    assert (
        minhash_index_stats(spark, streamed)["params"]["store_cols"]
        == ["lang"]
    )
    probe = docs.filter("doc_id % 2 = 1").select("doc_id", "text")

    def q_pairs(path, **kw):
        return sorted(
            (r.id_indexed, r.id_new)
            for r in minhash_index_query(
                spark, path, probe, threshold=0.5,
                exclude_same_id=False, **kw,
            ).collect()
        )

    assert q_pairs(streamed) == q_pairs(batch_idx)
    assert q_pairs(streamed, where="lang == 'zz'") == q_pairs(
        batch_idx, where="lang == 'zz'"
    )
    # the D'd ids are really gone; the M'd ids really re-graded
    zz = {
        p[0] for p in q_pairs(streamed, where="lang == 'zz'")
    }
    assert zz and all(v % 10 == 6 for v in zz)
    assert not any(
        p[0] % 10 == 8 for p in q_pairs(streamed)
    )


def test_minhash_stream_fresh_checkpoint_replay_converges(
    spark, sf_dir, tmp_path
):
    """A lost-checkpoint full replay converges to the same logical
    state (apply_cdc is final-state idempotent)."""
    from parq_tools_spark.operators.dedup import minhash_index_query
    from parq_tools_spark.streaming.index_sink import (
        start_minhash_index_stream,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text", "lang").filter("doc_id < 300")
    src = str(tmp_path / "cdc")
    _band_batches(spark, docs, src)
    idx = str(tmp_path / "idx")
    probe = docs.filter("doc_id % 2 = 1").select("doc_id", "text")

    def run(tag):
        stream = (
            spark.readStream.schema(BAND_CDC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = start_minhash_index_stream(
            stream, idx, str(tmp_path / f"ck_{tag}"),
            seq_col="seq", num_hashes=32, bands=8,
            store_cols=["lang"],
        )
        assert q.awaitTermination(300)
        from parq_tools_spark.operators.dedup import (
            minhash_index_query as mq,
        )

        return sorted(
            (r.id_indexed, r.id_new)
            for r in mq(
                spark, idx, probe, threshold=0.5,
                exclude_same_id=False,
            ).collect()
        )

    assert run("a") == run("b")


def test_simhash_stream_equals_batch_cdc_path(spark, sf_dir, tmp_path):
    """The SimHash twin: streamed U/D/M == batched apply_cdc, with
    and without where=."""
    from parq_tools_spark.operators.simhash_index import (
        simhash_index_apply_cdc,
        simhash_index_query,
        simhash_index_stats,
        simhash_index_write,
    )
    from parq_tools_spark.streaming.index_sink import (
        start_simhash_index_stream,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text", "lang")
    src = str(tmp_path / "cdc")
    batches = _band_batches(spark, docs, src)

    streamed = str(tmp_path / "streamed")
    stream = (
        spark.readStream.schema(BAND_CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_simhash_index_stream(
        stream, streamed, str(tmp_path / "ck"),
        seq_col="seq", n_bands=8, store_cols=["lang"],
    )
    assert q.awaitTermination(300), "stream did not drain in 300s"

    batch_idx = str(tmp_path / "batch")
    simhash_index_write(
        docs.limit(0), batch_idx, n_bands=8, store_cols=["lang"]
    )
    for b in batches:
        simhash_index_apply_cdc(spark, batch_idx, b, seq_col="seq")

    assert (
        simhash_index_stats(spark, streamed)["params"]["store_cols"]
        == ["lang"]
    )
    probe = docs.filter("doc_id % 2 = 1").select("doc_id", "text")

    def q_pairs(path, **kw):
        return sorted(
            (r.id_indexed, r.id_new)
            for r in simhash_index_query(
                spark, path, probe, max_hamming=7,
                exclude_same_id=False, **kw,
            ).collect()
        )

    assert q_pairs(streamed) == q_pairs(batch_idx)
    assert q_pairs(streamed, where="lang == 'zz'") == q_pairs(
        batch_idx, where="lang == 'zz'"
    )


def test_band_sinks_reject_batch_dataframe(spark, sf_dir):
    from parq_tools_spark.streaming.index_sink import (
        start_minhash_index_stream,
        start_simhash_index_stream,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).limit(1)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        start_minhash_index_stream(docs, "/tmp/x", "/tmp/ck")
    with pytest.raises(ValueError, match="streaming DataFrame"):
        start_simhash_index_stream(docs, "/tmp/x", "/tmp/ck")
