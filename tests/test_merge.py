"""Keyed merge/upsert + CDC apply — both physical shapes must agree."""

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.merge import apply_cdc, merge_upsert


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_update_insert_delete(spark, target, broadcast):
    src = spark.createDataFrame(
        [
            (2, "B", 99.0, False),  # update
            (3, "c", 30.0, True),  # delete
            (4, "d", 40.0, False),  # insert
            (5, "e", 50.0, True),  # unmatched delete -> no-op
        ],
        "k long, name string, v double, del boolean",
    )
    out = merge_upsert(target, src, ["k"], delete_col="del", broadcast_source=broadcast)
    assert _rows(out) == [(1, "a", 10.0), (2, "B", 99.0), (4, "d", 40.0)]


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_without_delete(spark, target, broadcast):
    src = spark.createDataFrame([(1, "A", 11.0), (9, "z", 90.0)], "k long, name string, v double")
    out = merge_upsert(target, src, ["k"], broadcast_source=broadcast)
    assert _rows(out) == [
        (1, "A", 11.0),
        (2, "b", 20.0),
        (3, "c", 30.0),
        (9, "z", 90.0),
    ]


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_partial_update_cols(spark, target, broadcast):
    src = spark.createDataFrame([(1, "A", 11.0), (9, "z", 90.0)], "k long, name string, v double")
    out = merge_upsert(
        target, src, ["k"], update_cols=["v"], broadcast_source=broadcast
    )
    rows = {r.k: r for r in out.collect()}
    # matched: only v updated, name kept from target
    assert rows[1].name == "a" and rows[1].v == 11.0
    # insert still carries all source values
    assert rows[9].name == "z" and rows[9].v == 90.0


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_extra_target_column_null_filled_on_insert(spark, broadcast):
    tgt = spark.createDataFrame(
        [(1, "a", 7)], "k long, name string, extra int"
    )
    src = spark.createDataFrame([(1, "A"), (2, "b")], "k long, name string")
    out = merge_upsert(tgt, src, ["k"], broadcast_source=broadcast)
    rows = {r.k: r for r in out.collect()}
    assert rows[1].extra == 7  # preserved on update
    assert rows[2].extra is None  # null-filled on insert


def test_merge_validation(spark, target):
    src = spark.createDataFrame([(1, "x")], "other long, name string")
    with pytest.raises(ValueError):
        merge_upsert(target, src, ["k"])
    with pytest.raises(ValueError):
        merge_upsert(target, target, [])
    with pytest.raises(ValueError):
        merge_upsert(
            target,
            spark.createDataFrame([(1, "x")], "k long, name string"),
            ["k"],
            update_cols=["v"],
        )


@pytest.mark.parametrize("broadcast", [False, True])
def test_cdc_latest_wins(spark, target, broadcast):
    chg = spark.createDataFrame(
        [
            (2, "U", 1, "b2", 21.0),
            (2, "D", 2, None, None),  # later delete wins over the update
            (3, "D", 1, None, None),
            (3, "U", 2, "c3", 33.0),  # later update wins over the delete
            (5, "I", 1, "e", 50.0),
        ],
        "k long, op string, seq long, name string, v double",
    )
    out = apply_cdc(target, chg, ["k"], broadcast_source=broadcast)
    assert _rows(out) == [(1, "a", 10.0), (3, "c3", 33.0), (5, "e", 50.0)]


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_match_condition_guards_update_and_delete(
    spark, target, broadcast
):
    """WHEN MATCHED AND <cond>: a matched row failing the condition is
    kept unchanged — neither updated nor deleted; inserts still land."""
    src = spark.createDataFrame(
        [
            (1, "a9", 9.0, False),   # v < t.v -> guard fails, keep (1,a,10)
            (2, "b2", 25.0, False),  # guard passes -> update
            (3, None, 35.0, True),   # guard passes -> delete
            (4, "d", 40.0, False),   # unmatched -> insert (unconditional)
        ],
        "k long, name string, v double, dead boolean",
    )
    out = merge_upsert(
        target,
        src,
        ["k"],
        delete_col="dead",
        broadcast_source=broadcast,
        match_condition="s.v > t.v",
    )
    assert _rows(out) == [(1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)]


@pytest.mark.parametrize("broadcast", [False, True])
def test_cdc_target_seq_col_skips_stale_and_is_idempotent(
    spark, target, broadcast
):
    """With target_seq_col the snapshot remembers the last applied seq
    per key: stale events skip, and replaying an applied log no-ops."""
    tgt = target.withColumn("__cdc_seq", F.lit(None).cast("long"))
    chg = spark.createDataFrame(
        [
            (2, "U", 7, "b7", 27.0),
            (3, "D", 5, None, None),
            (4, "I", 1, "d", 40.0),
        ],
        "k long, op string, seq long, name string, v double",
    )
    once = apply_cdc(
        tgt, chg, ["k"], broadcast_source=broadcast,
        target_seq_col="__cdc_seq",
    )
    assert _rows(once) == [
        (1, "a", 10.0, None),
        (2, "b7", 27.0, 7),
        (4, "d", 40.0, 1),
    ]
    # replay the SAME log against the updated snapshot: every event's
    # seq is <= the stored seq, so nothing changes (delete of the
    # already-deleted k=3 is a no-op on a missing key)
    twice = apply_cdc(
        once, chg, ["k"], broadcast_source=broadcast,
        target_seq_col="__cdc_seq",
    )
    assert _rows(twice) == _rows(once)
    # a stale update (seq 3 < stored 7) must not overwrite
    stale = spark.createDataFrame(
        [(2, "U", 3, "old", 1.0)],
        "k long, op string, seq long, name string, v double",
    )
    guarded = apply_cdc(
        once, stale, ["k"], broadcast_source=broadcast,
        target_seq_col="__cdc_seq",
    )
    assert _rows(guarded) == _rows(once)


def test_cdc_target_seq_col_requires_column(spark, target):
    with pytest.raises(ValueError, match="target_seq_col"):
        apply_cdc(
            target,
            spark.createDataFrame(
                [(1, "U", 1, "x", 1.0)],
                "k long, op string, seq long, name string, v double",
            ),
            ["k"],
            target_seq_col="__cdc_seq",
        )


def test_cdc_same_seq_tiebreak_update_beats_delete(spark, target):
    chg = spark.createDataFrame(
        [(1, "D", 1, None, None), (1, "U", 1, "a1", 12.0)],
        "k long, op string, seq long, name string, v double",
    )
    out = apply_cdc(target, chg, ["k"])
    rows = {r.k: r for r in out.collect()}
    assert rows[1].name == "a1" and rows[1].v == 12.0


def test_broadcast_merge_plan_keeps_target_unshuffled(spark, tmp_path):
    """The broadcast path must not exchange the wide target scan, and
    the insert pass must scan only the key column."""
    import re

    tgt_path = str(tmp_path / "tgt.parquet")
    spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.col("id").cast("string").alias("name"),
        (F.col("id") * 1.5).alias("v"),
    ).write.parquet(tgt_path)
    tgt = spark.read.parquet(tgt_path)
    src = spark.createDataFrame([(1, "x", 0.0), (2000, "y", 1.0)], "k long, name string, v double")
    out = merge_upsert(tgt, src, ["k"], broadcast_source=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # wide target scan present and key-only scan present
    assert re.search(r"FileScan parquet \[k#\d+L\]", plan), plan
    wide = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "name" in ln and "v#" in ln
    ]
    assert wide, plan


def test_cdc_seq_guard_plan_keeps_target_unshuffled(spark, tmp_path):
    """The persisted-seq guard (match_condition) must ride the same
    broadcast left join — no shuffle of the snapshot appears when it
    is enabled."""
    tgt_path = str(tmp_path / "snap.parquet")
    spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.lit(None).cast("long").alias("__cdc_seq"),
    ).write.parquet(tgt_path)
    tgt = spark.read.parquet(tgt_path)
    chg = spark.createDataFrame(
        [(1, "U", 5, 9.0), (2000, "I", 6, 1.0)],
        "k long, op string, seq long, v double",
    )
    out = apply_cdc(
        tgt, chg, ["k"], broadcast_source=True, target_seq_col="__cdc_seq"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the WIDE target scan (carries v + __cdc_seq) must reach its join
    # without any repartitioning ancestor — only the small change-log
    # side (latest-wins window, matched-key distinct) may exchange
    import re

    lines = plan.splitlines()

    def depth(ln):
        m = re.search(r"[+:]- ", ln)
        return m.start() if m else -1

    wide_idx = [
        i
        for i, ln in enumerate(lines)
        if "FileScan parquet" in ln and "v#" in ln and "__cdc_seq" in ln
    ]
    assert wide_idx, plan
    for i in wide_idx:
        d = depth(lines[i])
        for j in range(i - 1, -1, -1):
            dj = depth(lines[j])
            if 0 <= dj < d:  # ancestor
                assert not re.search(
                    r"Exchange (hash|range)partitioning", lines[j]
                ), plan
                d = dj


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_composite_keys(spark, broadcast):
    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)],
        "k1 long, k2 string, v double",
    )
    src = spark.createDataFrame(
        [(1, "b", 99.0), (3, "c", 1.0)], "k1 long, k2 string, v double"
    )
    out = merge_upsert(tgt, src, ["k1", "k2"], broadcast_source=broadcast)
    assert _rows(out) == [
        (1, "a", 10.0),
        (1, "b", 99.0),
        (2, "a", 30.0),
        (3, "c", 1.0),
    ]


def test_merge_rejects_update_col_missing_from_target(spark, target):
    src = spark.createDataFrame(
        [(1, "x", 5.0)], "k long, name string, extra_col double"
    )
    with pytest.raises(ValueError, match="not in target"):
        merge_upsert(target, src, ["k"], update_cols=["extra_col"])


# ---------------------------------------------------------------------
# 'M' (metadata-only) ops — the index families' convention on the
# shared change log, now first-class on the snapshot side too
# ---------------------------------------------------------------------


def test_cdc_meta_op_without_meta_cols_raises(spark, target):
    """An 'M' fed to the plain upsert path would NULL the row's
    content columns while an index applying the SAME log flips only
    its metadata — diverging the two surfaces. Loud, not silent."""
    ch = spark.createDataFrame(
        [(1, None, 99.0, "M", 1)],
        "k long, name string, v double, op string, seq long",
    )
    with pytest.raises(ValueError, match="meta_cols"):
        apply_cdc(target, ch, ["k"])


def test_cdc_unknown_op_raises(spark, target):
    ch = spark.createDataFrame(
        [(1, "x", 1.0, "X", 1)],
        "k long, name string, v double, op string, seq long",
    )
    with pytest.raises(ValueError, match="unknown op 'X'"):
        apply_cdc(target, ch, ["k"])
    with pytest.raises(ValueError, match="unknown op 'X'"):
        apply_cdc(target, ch, ["k"], meta_cols=["v"])


def test_cdc_meta_cols_validation(spark, target):
    ch = spark.createDataFrame(
        [(1, "x", 1.0, "U", 1)],
        "k long, name string, v double, op string, seq long",
    )
    with pytest.raises(ValueError, match="collide"):
        apply_cdc(target, ch, ["k"], meta_cols=["k"])
    with pytest.raises(ValueError, match="missing"):
        apply_cdc(target, ch, ["k"], meta_cols=["nope"])


@pytest.mark.parametrize("broadcast", [False, True])
def test_cdc_meta_semantics(spark, target, broadcast):
    """The full 'M' contract, mirroring the index families: M
    re-grades only meta_cols (content preserved); U-then-M applies M
    on the FRESH row; M superseded by later U/D vanishes; M on a
    missing key is a no-op, never an insert."""
    ch = spark.createDataFrame(
        [
            # plain re-grade: v flips, name preserved
            (1, None, 11.0, "M", 1),
            # U@1 then M@2: content from U, then the re-grade on top
            (2, "B2", 21.0, "U", 1),
            (2, None, 22.0, "M", 2),
            # M@1 then U@2: the upsert's record is authoritative
            (3, None, 33.0, "M", 1),
            (3, "C2", 31.0, "U", 2),
            # M then D: the delete supersedes the re-grade
            (4, "d", 40.0, "I", 1),
            (4, None, 44.0, "M", 2),
            (4, None, None, "D", 3),
            # M for a key never present: no-op, no insert
            (99, None, 9.0, "M", 1),
        ],
        "k long, name string, v double, op string, seq long",
    )
    out = apply_cdc(
        target, ch, ["k"], meta_cols=["v"], broadcast_source=broadcast
    )
    assert _rows(out) == [
        (1, "a", 11.0),
        (2, "B2", 22.0),
        (3, "C2", 31.0),
    ]


@pytest.mark.parametrize("broadcast", [False, True])
def test_cdc_meta_multi_col_and_null_value(spark, broadcast):
    """meta_cols may list several columns; an M's NULL in a META
    column is a written value (the M row is the full metadata record,
    like a 'U'), while content columns are never touched."""
    target = spark.createDataFrame(
        [(1, "text one", "en", 5), (2, "text two", "de", 7)],
        "k long, body string, lang string, grade int",
    )
    ch = spark.createDataFrame(
        [(1, None, None, 9, "M", 1)],
        "k long, body string, lang string, grade int, op string, seq long",
    )
    out = apply_cdc(
        target, ch, ["k"], meta_cols=["lang", "grade"],
        broadcast_source=broadcast,
    )
    rows = {r.k: r for r in out.collect()}
    assert rows[1].body == "text one"  # content preserved
    assert rows[1].lang is None and rows[1].grade == 9  # full meta record
    assert (rows[2].lang, rows[2].grade) == ("de", 7)


def test_cdc_meta_with_target_seq_is_idempotent(spark):
    """With target_seq_col, an applied M advances the stored seq, so
    replaying the same log is a no-op — and a stale M cannot undo a
    newer re-grade."""
    target = spark.createDataFrame(
        [(1, "t1", "en", None), (2, "t2", "de", None)],
        "k long, body string, lang string, _seq long",
    )
    ch = spark.createDataFrame(
        [
            (1, "t1b", "fr", "U", 5),
            (1, None, "zz", "M", 6),
            (2, None, "qq", "M", 3),
        ],
        "k long, body string, lang string, op string, seq long",
    )
    once = apply_cdc(
        target, ch, ["k"], meta_cols=["lang"], target_seq_col="_seq"
    )
    rows = {r.k: r for r in once.collect()}
    assert (rows[1].body, rows[1].lang, rows[1]._seq) == ("t1b", "zz", 6)
    assert (rows[2].body, rows[2].lang, rows[2]._seq) == ("t2", "qq", 3)
    twice = apply_cdc(
        once, ch, ["k"], meta_cols=["lang"], target_seq_col="_seq"
    )
    assert _rows(twice) == _rows(once)
    # a STALE M (seq below the stored one) never re-applies
    stale = spark.createDataFrame(
        [(1, None, "old", "M", 2)],
        "k long, body string, lang string, op string, seq long",
    )
    kept = apply_cdc(
        once, stale, ["k"], meta_cols=["lang"], target_seq_col="_seq"
    )
    assert _rows(kept) == _rows(once)


def test_cdc_meta_snapshot_and_index_stay_in_lockstep(
    spark, sf_dir, tmp_path
):
    """The round's motivating contract: ONE mixed U/D/M change log
    applied to a BM25 index (bm25_index_apply_cdc) and to the source
    snapshot (merge.apply_cdc meta_cols=) leaves both agreeing on
    membership and metadata."""
    import os

    from parq_tools_spark.operators.search import (
        bm25_index_apply_cdc,
        bm25_index_build,
        bm25_index_topk,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text", "lang")
        .filter("doc_id < 200")
    )
    path = str(tmp_path / "bm")
    bm25_index_build(docs, path, n_buckets=4, store_cols=["lang"])
    ch = spark.createDataFrame(
        [
            (3, "replacement stream merge window text", "fr", "U", 1),
            (3, None, "zz", "M", 2),
            (5, None, "qq", "M", 1),
            (7, None, None, "D", 1),
        ],
        "doc_id long, text string, lang string, op string, seq long",
    )
    bm25_index_apply_cdc(spark, path, ch, seq_col="seq")
    snap = apply_cdc(
        docs, ch, ["doc_id"], meta_cols=["lang"], seq_col="seq"
    )
    served = bm25_index_topk(
        spark, path, "stream merge window replacement", k=1_000_000
    ).select("doc_id")
    snap_ids = {r.doc_id for r in snap.collect()}
    assert {r.doc_id for r in served.collect()} <= snap_ids
    assert 7 not in snap_ids
    lang = {r.doc_id: r.lang for r in snap.collect()}
    assert lang[3] == "zz" and lang[5] == "qq"
    for did, lg in [(3, "zz"), (5, "qq")]:
        # probe with the doc's own leading words so BM25 must hit it
        # unless the metadata filter excludes it
        words = " ".join(
            snap.filter(F.col("doc_id") == did)
            .collect()[0]
            .text.split()[:4]
        )
        hits = bm25_index_topk(
            spark, path, words, k=1_000_000, where=f"lang == '{lg}'"
        )
        assert did in {r.doc_id for r in hits.collect()}, (did, lg)


def test_cdc_null_op_raises(spark, target):
    """A NULL op is malformed, not filterable: ~isin() is NULL for
    it, so without the explicit isNull() probe the row would be
    silently dropped — applied or discarded depending on meta_cols."""
    ch = spark.createDataFrame(
        [(1, "x", 1.0, None, 1)],
        "k long, name string, v double, op string, seq long",
    )
    with pytest.raises(ValueError, match="unknown op None"):
        apply_cdc(target, ch, ["k"])
    with pytest.raises(ValueError, match="unknown op None"):
        apply_cdc(target, ch, ["k"], meta_cols=["v"])


def test_cdc_meta_cols_guard_seq_and_helper_collisions(spark):
    """meta_cols may not alias the stored-seq column (an applied M
    would overwrite the idempotence bookkeeping with a raw value),
    and target columns colliding with the fold join's helper names
    raise up front instead of AMBIGUOUS_REFERENCE at execution."""
    target = spark.createDataFrame(
        [(1, "a", 1.0, None)],
        "k long, name string, _seq double, _m_has boolean",
    )
    ch = spark.createDataFrame(
        [(1, "b", 2.0, None, "M", 1)],
        "k long, name string, _seq double, _m_has boolean, "
        "op string, seq long",
    )
    with pytest.raises(ValueError, match="target_seq"):
        apply_cdc(
            target, ch, ["k"], meta_cols=["_seq"], target_seq_col="_seq"
        )
    with pytest.raises(ValueError, match="helper"):
        apply_cdc(target, ch, ["k"], meta_cols=["name"])
