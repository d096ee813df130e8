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
