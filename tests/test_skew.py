"""Join-key skew diagnostic tests."""

import pytest

from parq_tools_spark.operators.skew import key_skew_report, skew_factor


def test_key_skew_report_finds_hot_keys(spark):
    rows = [(i, "hot" if i % 10 < 7 else f"cold{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = key_skew_report(df, ["k"], top_n=3).collect()
    assert rep[0].value == "hot"
    assert rep[0].n_rows == 700
    assert abs(rep[0].share - 0.7) < 1e-9
    assert len(rep) == 3
    assert [r.column for r in rep] == ["k"] * 3


def test_key_skew_report_counts_nulls_and_multi_columns(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 1), ("a", 2)], "k string, g int"
    )
    rep = key_skew_report(df, ["k", "g"], top_n=2).collect()
    by_col = {}
    for r in rep:
        by_col.setdefault(r.column, []).append(r)
    # null key is reported, not dropped: it's one reducer's load too
    assert by_col["k"][0].value is None and by_col["k"][0].n_rows == 2
    assert by_col["g"][0].n_rows == 2
    with pytest.raises(ValueError, match="empty"):
        key_skew_report(spark.createDataFrame([], "k string"), ["k"])


def test_skew_factor(spark):
    uniform = spark.range(0, 900).selectExpr("id % 9 AS k")
    assert abs(skew_factor(uniform, "k") - 1.0) < 1e-9
    skewed = spark.range(0, 900).selectExpr(
        "CASE WHEN id < 820 THEN 0 ELSE id END AS k"
    )
    assert skew_factor(skewed, "k") > 50


def test_key_skew_plan_one_pass(spark):
    """The report must stay one-pass at any column count: the per-column
    top-N runs as a map-side WindowGroupLimit (never a full-partition
    window over the key-count table), and the totals branch reuses the
    aggregation exchange instead of rescanning the input."""
    df = spark.range(0, 10_000).selectExpr("id % 97 AS k", "id % 7 AS g")
    rep = key_skew_report(df, ["k", "g"], top_n=5)
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "ReusedExchange" in plan


def test_skew_factor_empty_input_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        skew_factor(spark.createDataFrame([], "k string"), "k")
