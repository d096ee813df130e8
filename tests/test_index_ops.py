"""Sort / reindex / dedup tests (reference parity: test/indexes/)."""

import pandas as pd

from parq_tools_spark.operators.index_ops import (
    dedupe_exact,
    dedupe_keep_first,
    reindex_dataframe,
    sort_dataframe,
)


def test_sort_matches_pandas(spark, wide_tables):
    df = spark.read.parquet(wide_tables["wide_1"])
    out = sort_dataframe(df, ["x"], ascending=False).toPandas()
    expected = (
        pd.read_parquet(wide_tables["wide_1"])
        .sort_values("x", ascending=False)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expected, check_dtype=False)


def test_sort_multi_column_mixed_direction(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "c"), (2, "a")], "k int, v string"
    )
    out = sort_dataframe(df, ["k", "v"], ascending=[True, False]).collect()
    assert [(r.k, r.v) for r in out] == [(1, "b"), (1, "a"), (2, "c"), (2, "a")]


def test_reindex_null_pads_missing(spark, wide_tables):
    df = spark.read.parquet(wide_tables["wide_2"])  # x 1..10, b float
    new_index = spark.createDataFrame(
        [(5, 15, 25), (99, 99, 99)], "x long, y long, z long"
    )
    out = reindex_dataframe(df, new_index, ["x", "y", "z"], sort=True).toPandas()
    assert len(out) == 2
    assert out.loc[0, "b"] == 5.0
    assert pd.isna(out.loc[1, "b"])
    assert list(out.columns) == ["x", "y", "z", "b"]


def test_reindex_no_duplication_multi_partition(spark):
    # the reference duplicates rows when input spans >1 chunk
    # (index_utils.py:132-152); the global join must not
    df = spark.range(0, 1000, 1, 8).withColumnRenamed("id", "k").withColumn(
        "v", (2 * __import__("pyspark.sql.functions", fromlist=["col"]).col("k"))
    )
    new_index = spark.range(0, 500).withColumnRenamed("id", "k")
    out = reindex_dataframe(df, new_index, ["k"])
    assert out.count() == 500


def test_dedupe_keep_first_with_order(spark):
    df = spark.createDataFrame(
        [(1, 2, "second"), (1, 1, "first"), (2, 1, "only")],
        "k int, seq int, tag string",
    )
    out = dedupe_keep_first(df, ["k"], order_columns=["seq"]).collect()
    tags = {r.k: r.tag for r in out}
    assert tags == {1: "first", 2: "only"}


def test_dedupe_keep_first_file_order(spark, tmp_path):
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": ["a", "b", "c", "d", "e"]})
    path = str(tmp_path / "dup.parquet")
    pdf.to_parquet(path, index=False)
    out = dedupe_keep_first(spark.read.parquet(path), ["k"]).toPandas()
    got = dict(zip(out.k, out.v))
    assert got == {1: "a", 2: "c", 3: "e"}


def test_dedupe_exact(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], "k int, v string")
    assert dedupe_exact(df).count() == 2
    assert dedupe_exact(df, ["k"]).count() == 1


def test_file_level_facades(spark, tmp_path, wide_tables):
    from parq_tools_spark.operators.index_ops import (
        dedupe_parquet,
        reindex_parquet,
        sort_parquet,
    )

    sort_parquet(spark, wide_tables["wide_1"], str(tmp_path / "sorted"), ["x"], False)
    out = spark.read.parquet(str(tmp_path / "sorted")).collect()
    xs = [r.x for r in out]
    # file content is a set; verify the written data round-trips
    assert sorted(xs) == list(range(1, 11))

    new_index = spark.createDataFrame([(1, 11, 21), (2, 12, 22)], "x long, y long, z long")
    reindex_parquet(
        spark, wide_tables["wide_1"], str(tmp_path / "reix"), new_index, ["x", "y", "z"]
    )
    assert spark.read.parquet(str(tmp_path / "reix")).count() == 2

    dedupe_parquet(
        spark, wide_tables["wide_1"], str(tmp_path / "dd"), ["x"], order_columns=["y"]
    )
    assert spark.read.parquet(str(tmp_path / "dd")).count() == 10
