"""As-of join + salted join tests (oracle: pandas merge_asof semantics)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.joins import asof_join, salted_join


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 25, 101.0), ("B", 15, 50.0), ("C", 5, 7.0)],
        "sym string, t long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 99.0), ("A", 10, 99.5), ("A", 20, 100.5), ("B", 20, 49.0)],
        "sym string, t long, bid double",
    )
    return trades, quotes


def test_asof_backward_basic(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "t", "t")
    got = {(r.sym, r.t): r.bid for r in out.collect()}
    assert got[("A", 10)] == 99.5  # equal time matches (<=)
    assert got[("A", 25)] == 100.5  # latest at-or-before 25 is t=20
    assert got[("B", 15)] is None  # only future quote exists
    assert got[("C", 5)] is None  # no right rows for key


def test_asof_forward(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "t", "t", direction="forward")
    got = {(r.sym, r.t): r.bid for r in out.collect()}
    assert got[("A", 10)] == 99.5  # equal time still matches
    assert got[("B", 15)] == 49.0  # next future quote
    assert got[("A", 25)] is None  # nothing after 25


def test_asof_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "t", "t", tolerance=3)
    got = {(r.sym, r.t): r.bid for r in out.collect()}
    assert got[("A", 10)] == 99.5  # delta 0 <= 3
    assert got[("A", 25)] is None  # delta 5 > 3


def test_asof_matches_pandas_merge_asof(spark):
    left = pd.DataFrame(
        {"k": ["x"] * 6 + ["y"] * 6, "t": list(range(0, 60, 10)) * 2}
    )
    right = pd.DataFrame(
        {"k": ["x", "x", "y"], "t": [7, 33, 15], "v": [1.0, 2.0, 3.0]}
    )
    expected = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k"
    ).sort_values(["k", "t"]).reset_index(drop=True)
    out = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), ["k"], "t", "t"
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "t", "v"]], expected[["k", "t", "v"]])


def test_asof_preserves_left_rowcount(spark, sf_dir):
    import os

    from parq_tools_spark.streaming.events import ts_micros_expr

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev = ev.select(
        "event_id",
        F.col("user_id").alias("k"),
        ts_micros_expr(dict(ev.dtypes)["ts"]).alias("t"),
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_custkey").alias("k"),
        F.unix_timestamp("o_orderdate").alias("t"),
        "o_orderkey",
    )
    out = asof_join(ev, orders, ["k"], "t", "t")
    assert out.count() == ev.count()


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 1000).withColumn("k", (F.col("id") % 3).cast("long"))
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, v string")
    plain = left.join(right, "k").orderBy("id").collect()
    salted = salted_join(left, right, ["k"], salt=4).orderBy("id").collect()
    assert [(r.id, r.v) for r in plain] == [(r.id, r.v) for r in salted]


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "x"), (99, "y")], "k long, s string")
    right = spark.createDataFrame([(1, "r")], "k long, v string")
    out = salted_join(left, right, ["k"], how="left", salt=4).collect()
    got = {r.k: r.v for r in out}
    assert got == {1: "r", 99: None}


def test_range_join_matches_inequality_join(spark):
    from parq_tools_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "v", 100)], "lid int, k string, lt long"
    )
    right = spark.createDataFrame(
        [(10, "u", 130), (11, "u", 400), (12, "v", 40), (13, "w", 100)],
        "rid int, k string, rt long",
    )
    out = range_join(left, right, "lt", "rt", window=60, on=["k"])
    got = sorted((r.lid, r.rid) for r in out.collect())
    # oracle: plain nested inequality evaluation
    lr = [(l, r) for l in left.collect() for r in right.collect()
          if l.k == r.k and abs(l.lt - r.rt) <= 60]
    expected = sorted((l.lid, r.rid) for l, r in lr)
    assert got == expected == [(1, 10), (3, 12)]


def test_range_join_boundary_inclusive(spark):
    from parq_tools_spark.operators.joins import range_join

    left = spark.createDataFrame([(1, 0)], "lid int, lt long")
    right = spark.createDataFrame([(2, 60), (3, 61), (4, -60), (5, -61)], "rid int, rt long")
    out = range_join(left, right, "lt", "rt", window=60)
    assert sorted(r.rid for r in out.collect()) == [2, 4]


def test_asof_join_survives_hostile_column_names(spark):
    from parq_tools_spark.operators.joins import asof_join

    # user columns that collide with naive internal names
    left = spark.createDataFrame(
        [("a", 10, 99, 1)], "k string, t long, _t long, _is_left int"
    )
    right = spark.createDataFrame([("a", 5, 1.0)], "k string, t long, v double")
    out = asof_join(left, right, ["k"], "t", "t").collect()[0]
    assert out.v == 1.0 and out._t == 99 and out._is_left == 1


def test_range_join_survives_bucket_column_name(spark):
    from parq_tools_spark.operators.joins import range_join

    left = spark.createDataFrame([(1, 100, "x")], "lid int, lt long, _bucket string")
    right = spark.createDataFrame([(2, 120)], "rid int, rt long")
    out = range_join(left, right, "lt", "rt", window=60).collect()
    assert len(out) == 1 and out[0]._bucket == "x"
