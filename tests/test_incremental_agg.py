"""Incremental aggregate maintenance (operators/incremental_agg.py):
fold-equals-full-recompute, manifest skipping, and crash recovery."""

import os

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.incremental_agg import (
    finalize_aggregate,
    incremental_aggregate,
    read_aggregate,
)

KEYS = ["l_returnflag", "l_linestatus"]
MEASURES = [
    ("sum", "l_quantity", "decimal(27,2)"),
    ("count", "l_quantity"),
    ("min", "l_shipdate"),
    ("max", "l_shipdate"),
]


def _lineitem(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))


def test_incremental_folds_equal_full_recompute(spark, sf_dir, tmp_path):
    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    for i, pred in enumerate(
        (F.col("l_orderkey") % 3 == r for r in range(3))
    ):
        li.filter(pred).write.parquet(os.path.join(inp, f"b{i}"))
        st = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    got = sorted(
        tuple(r)
        for r in finalize_aggregate(st, averages=["l_quantity"]).collect()
    )
    exp = sorted(
        tuple(r)
        for r in li.groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias(
                "l_quantity_sum"
            ),
            F.count("l_quantity").alias("l_quantity_count"),
            F.min("l_shipdate").alias("l_shipdate_min"),
            F.max("l_shipdate").alias("l_shipdate_max"),
        )
        .withColumn(
            "l_quantity_avg",
            F.col("l_quantity_sum").cast("double") / F.col("l_quantity_count"),
        )
        .collect()
    )
    assert got == exp


def test_no_new_files_skips_and_empty_input_errors(spark, sf_dir, tmp_path):
    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    with pytest.raises(ValueError, match="no parquet files"):
        incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    li.limit(100).write.parquet(os.path.join(inp, "b0"))
    s1 = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    n1 = s1.agg(F.sum("n_rows")).collect()[0][0]
    # same listing -> nothing re-read, state unchanged (no double count)
    s2 = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    assert s2.agg(F.sum("n_rows")).collect()[0][0] == n1 == 100


def test_aborted_fold_invisible_and_cleaned(spark, sf_dir, tmp_path):
    """Crash mid-fold = a v-dir whose manifest never appeared. Readers
    must resolve the previous committed version; the next fold must
    clean the aborted dir and re-fold the files (no drop, no double
    count)."""
    import shutil

    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    li.limit(500).write.parquet(os.path.join(inp, "b0"))
    st = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    total = st.agg(F.sum("n_rows")).collect()[0][0]
    # simulate: b1 arrives, a fold writes v=2/data then dies before
    # the manifest (the commit marker)
    li.limit(600).write.parquet(os.path.join(inp, "b1"))
    shutil.copytree(
        os.path.join(state, "v=1", "data"),
        os.path.join(state, "v=2", "data"),
    )
    rec = read_aggregate(spark, state)  # aborted v=2 is invisible
    assert rec.agg(F.sum("n_rows")).collect()[0][0] == total == 500
    st2 = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    assert st2.agg(F.sum("n_rows")).collect()[0][0] == 1100
    # version hygiene: the aborted dir was replaced by the real v=2;
    # only previous + current survive a later fold
    li.limit(700).write.parquet(os.path.join(inp, "b2"))
    incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    vdirs = sorted(d for d in os.listdir(state) if d.startswith("v="))
    assert vdirs == ["v=2", "v=3"]
    assert read_aggregate(spark, state).agg(
        F.sum("n_rows")
    ).collect()[0][0] == 1800


def test_retention_prunes_old_groups(spark, sf_dir, tmp_path):
    """fold + retain == flat GROUP BY over the retained horizon, when
    batches arrive in key order (the documented watermark contract)."""
    li = _lineitem(spark, sf_dir).withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    splits = ["1994-01", "1996-01"]
    batches = [
        li.filter(F.col("ship_month") < splits[0]),
        li.filter(
            (F.col("ship_month") >= splits[0])
            & (F.col("ship_month") < splits[1])
        ),
        li.filter(F.col("ship_month") >= splits[1]),
    ]
    horizon = "ship_month >= '1995-01'"
    for i, b in enumerate(batches):
        b.write.parquet(os.path.join(inp, f"b{i}"))
        st = incremental_aggregate(
            spark,
            inp,
            state,
            ["ship_month"],
            [("sum", "l_quantity", "decimal(27,2)")],
            retain=horizon,
        )
    got = sorted(tuple(r) for r in st.collect())
    exp = sorted(
        tuple(r)
        for r in li.filter(horizon)
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)"))
            .cast("decimal(38,2)")
            .alias("l_quantity_sum"),
        )
        .collect()
    )
    assert got == exp and len(got) > 0


def test_measure_validation(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="not mergeable"):
        incremental_aggregate(
            spark,
            str(tmp_path / "in"),
            str(tmp_path / "state"),
            KEYS,
            [("avg", "l_quantity")],
        )
    df = _lineitem(spark, sf_dir).limit(1).groupBy(*KEYS).count()
    with pytest.raises(ValueError, match="needs both"):
        finalize_aggregate(df, averages=["l_quantity"])


def test_approx_distinct_measure_fold_equals_oneshot(spark, sf_dir, tmp_path):
    """HLL sketches folded over batches must estimate EXACTLY what a
    one-shot sketch over all rows does (union is order-free), and the
    sketch survives the parquet state roundtrip."""
    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    measures = [("approx_distinct", "l_partkey"), ("count", "l_partkey")]
    for i in range(3):
        li.filter(F.col("l_orderkey") % 3 == i).write.parquet(
            os.path.join(inp, f"b{i}")
        )
        st = incremental_aggregate(spark, inp, state, KEYS, measures)
    got = {
        (r.l_returnflag, r.l_linestatus): r.l_partkey_distinct_est
        for r in finalize_aggregate(
            st, distinct_counts=["l_partkey"]
        ).collect()
    }
    exp = {
        (r.l_returnflag, r.l_linestatus): r.e
        for r in li.groupBy(*KEYS)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e"))
        .collect()
    }
    assert got == exp
    # sanity: estimates are near the exact distinct counts
    exact = {
        (r.l_returnflag, r.l_linestatus): r.d
        for r in li.groupBy(*KEYS)
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05
    with pytest.raises(ValueError, match="distinct_est"):
        finalize_aggregate(st, distinct_counts=["l_orderkey"])


def test_read_with_tail_is_exact_and_uncommitted(spark, sf_dir, tmp_path):
    from parq_tools_spark.operators.incremental_agg import (
        read_aggregate_with_tail,
    )

    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    li.filter(F.col("l_orderkey") % 2 == 0).write.parquet(
        os.path.join(inp, "b0")
    )
    incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    # new files arrive but are NOT folded
    li.filter(F.col("l_orderkey") % 2 == 1).write.parquet(
        os.path.join(inp, "b1")
    )
    live = read_aggregate_with_tail(spark, inp, state, KEYS, MEASURES)
    assert live.agg(F.sum("n_rows")).collect()[0][0] == li.count()
    # state untouched: committed rollup still covers only batch 0
    committed = read_aggregate(spark, state)
    assert (
        committed.agg(F.sum("n_rows")).collect()[0][0]
        == li.filter(F.col("l_orderkey") % 2 == 0).count()
    )
    # with everything folded, the tail read IS the state read
    st = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
    again = read_aggregate_with_tail(spark, inp, state, KEYS, MEASURES)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, st.collect())
    )


def test_quantile_measure_folds_within_sketch_error(spark, sf_dir, tmp_path):
    """KLL quantiles fold across batches: the merged estimate must sit
    within the sketch's rank error of the exact quantile (merged and
    one-shot sketches may differ slightly — both are valid)."""
    from parq_tools_spark.operators.incremental_agg import (
        read_aggregate_with_tail,
    )

    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    measures = [("quantiles", "l_extendedprice")]
    for i in range(3):
        li.filter(F.col("l_orderkey") % 3 == i).write.parquet(
            os.path.join(inp, f"b{i}")
        )
        st = incremental_aggregate(spark, inp, state, KEYS, measures)
    got = {
        (r.l_returnflag, r.l_linestatus): (
            r.l_extendedprice_q50,
            r.l_extendedprice_q99,
        )
        for r in finalize_aggregate(
            st, quantiles={"l_extendedprice": [0.5, 0.99]}
        ).collect()
    }
    exact = {
        (r.l_returnflag, r.l_linestatus): (r.p50, r.p99)
        for r in li.groupBy(*KEYS)
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    # default-k KLL normalized rank error ~1.7%; allow 5% VALUE slack
    for k, (q50, q99) in got.items():
        assert abs(q50 - exact[k][0]) / exact[k][0] < 0.05
        assert abs(q99 - exact[k][1]) / exact[k][1] < 0.05
    # the lambda-view read merges sketches the same way
    live = read_aggregate_with_tail(spark, inp, state, KEYS, measures)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, st.collect())
    )
    with pytest.raises(ValueError, match="quantiles"):
        finalize_aggregate(st, quantiles={"l_quantity": [0.5]})


def test_random_fold_partitions_equal_full_recompute(spark, sf_dir, tmp_path):
    """Fold-equals-full must hold for ANY partition of the input into
    batches — three random-but-deterministic splits exercised."""
    li = _lineitem(spark, sf_dir).limit(2000)
    for salt in (11, 23, 37):
        inp = str(tmp_path / f"in{salt}")
        state = str(tmp_path / f"state{salt}")
        n_parts = salt % 4 + 2
        st = None
        for i in range(n_parts):
            li.filter(
                F.abs(F.hash(F.col("l_orderkey") + salt)) % n_parts == i
            ).write.parquet(os.path.join(inp, f"b{i}"))
            st = incremental_aggregate(spark, inp, state, KEYS, MEASURES)
        got = sorted(map(tuple, st.collect()))
        exp = sorted(
            tuple(r)
            for r in li.groupBy(*KEYS)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("decimal(27,2)"))
                .cast("decimal(38,2)")
                .alias("l_quantity_sum"),
                F.count("l_quantity").alias("l_quantity_count"),
                F.min("l_shipdate").alias("l_shipdate_min"),
                F.max("l_shipdate").alias("l_shipdate_max"),
            )
            .collect()
        )
        assert got == exp, f"salt {salt}"


def test_datatype_cast_and_fractional_quantile_labels(spark, sf_dir, tmp_path):
    from pyspark.sql.types import DecimalType

    li = _lineitem(spark, sf_dir).limit(300)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    li.write.parquet(os.path.join(inp, "b0"))
    # cast given as a DataType object, not a string
    st = incremental_aggregate(
        spark,
        inp,
        state,
        KEYS,
        [
            ("sum", "l_quantity", DecimalType(27, 2)),
            ("quantiles", "l_extendedprice"),
        ],
    )
    assert dict(st.dtypes)["l_quantity_sum"] == "decimal(38,2)"
    fin = finalize_aggregate(
        st, quantiles={"l_extendedprice": [0.99, 0.994, 0.5]}
    )
    # nearby probabilities get distinct, digit-preserving labels
    for c in (
        "l_extendedprice_q99",
        "l_extendedprice_q99_4",
        "l_extendedprice_q50",
    ):
        assert c in fin.columns


def test_null_group_key_merges_across_folds(spark, tmp_path):
    """GROUP BY treats all-NULL keys as one group; the state merge
    must too (null-safe join), not append a fresh NULL row per fold."""
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "k string, v long"
    spark.createDataFrame(
        [(None, 10), ("a", 1)], schema
    ).write.parquet(os.path.join(inp, "b0"))
    incremental_aggregate(spark, inp, state, ["k"], [("sum", "v")])
    spark.createDataFrame(
        [(None, 5), ("a", 2)], schema
    ).write.parquet(os.path.join(inp, "b1"))
    st = incremental_aggregate(spark, inp, state, ["k"], [("sum", "v")])
    rows = {r.k: (r.n_rows, r.v_sum) for r in st.collect()}
    assert len(rows) == 2  # exactly one NULL-key group
    assert rows[None] == (2, 15)
    assert rows["a"] == (2, 3)


def test_legacy_layout_resolves_and_migrates(spark, sf_dir, tmp_path):
    """A state dir written by the pre-versioned protocol (root data/ +
    _manifest.json) must resolve as current state WITH its manifest
    honored — an upgrade can neither re-fold already-processed files
    (double count) nor drop their contribution when inputs were
    retained away. The first post-upgrade folds commit v=N and later
    sweep the legacy files."""
    import json

    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    li.limit(400).write.parquet(os.path.join(inp, "b0"))
    # hand-build the legacy layout: aggregate of b0 + manifest at root
    legacy = (
        spark.read.parquet(os.path.join(inp, "b0"))
        .groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)"))
            .cast("decimal(38,2)")
            .alias("l_quantity_sum"),
        )
    )
    legacy.write.parquet(os.path.join(state, "data"))
    b0_files = sorted(
        os.path.join("b0", f)
        for f in os.listdir(os.path.join(inp, "b0"))
        if f.endswith(".parquet")
    )
    with open(os.path.join(state, "_manifest.json"), "w") as f:
        json.dump({"files": b0_files}, f)

    meas = [("sum", "l_quantity", "decimal(27,2)")]
    # resolves as state before any versioned commit
    st0 = read_aggregate(spark, state)
    assert st0.agg(F.sum("n_rows")).collect()[0][0] == 400
    # no new files -> state unchanged (manifest honored, no re-fold)
    assert (
        incremental_aggregate(spark, inp, state, KEYS, meas)
        .agg(F.sum("n_rows"))
        .collect()[0][0]
        == 400
    )
    # two more folds: totals exact, legacy root swept after cycle 2
    li.limit(500).write.parquet(os.path.join(inp, "b1"))
    s1 = incremental_aggregate(spark, inp, state, KEYS, meas)
    assert s1.agg(F.sum("n_rows")).collect()[0][0] == 900
    li.limit(600).write.parquet(os.path.join(inp, "b2"))
    s2 = incremental_aggregate(spark, inp, state, KEYS, meas)
    assert s2.agg(F.sum("n_rows")).collect()[0][0] == 1500
    entries = os.listdir(state)
    assert "data" not in entries and "_manifest.json" not in entries


def test_version_travel_with_keep_versions(spark, sf_dir, tmp_path):
    """keep_versions > 1 retains a rolling history: each retained
    version reads back as the state EXACTLY as of that fold; versions
    beyond the horizon are swept; absent versions raise."""
    from parq_tools_spark.operators.incremental_agg import list_versions

    li = _lineitem(spark, sf_dir)
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    meas = [("sum", "l_quantity", "decimal(27,2)")]
    totals = {}
    for i, n in enumerate((100, 200, 300, 400)):
        li.limit(n).write.parquet(os.path.join(inp, f"b{i}"))
        st = incremental_aggregate(
            spark, inp, state, KEYS, meas, keep_versions=3
        )
        totals[i + 1] = st.agg(F.sum("n_rows")).collect()[0][0]
    assert totals == {1: 100, 2: 300, 3: 600, 4: 1000}
    # cleanup runs at fold START against the pre-fold current, so
    # right after fold 4 (pre-fold cur=3, nothing <= 0) all four
    # versions still exist; fold 5's cleanup (pre-fold cur=4) sweeps
    # v=1 — the newest keep_versions + the grace one survive
    assert list_versions(spark, state) == [1, 2, 3, 4]
    li.limit(500).write.parquet(os.path.join(inp, "b4"))
    st = incremental_aggregate(
        spark, inp, state, KEYS, meas, keep_versions=3
    )
    totals[5] = st.agg(F.sum("n_rows")).collect()[0][0]
    assert totals[5] == 1500
    assert list_versions(spark, state) == [2, 3, 4, 5]
    for v in (2, 3, 4, 5):
        as_of = read_aggregate(spark, state, version=v)
        assert as_of.agg(F.sum("n_rows")).collect()[0][0] == totals[v]
    with pytest.raises(ValueError, match="not committed/retained"):
        read_aggregate(spark, state, version=1)
