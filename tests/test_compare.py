"""Compare tests (reference parity: test/compare/)."""

from parq_tools_spark.operators.compare import compare_dataframes, compare_parquet_files


def test_identical_files_match(spark, wide_tables):
    report = compare_parquet_files(spark, wide_tables["wide_1"], wide_tables["wide_1"])
    assert report["row_count_match"]
    assert report["schema_match"]
    assert report["content_match"]
    assert all(report["column_match"].values())


def test_schema_diff_reported(spark, wide_tables):
    report = compare_parquet_files(spark, wide_tables["wide_1"], wide_tables["wide_2"])
    assert report["columns_only_in_first"] == ["a"]
    assert report["columns_only_in_second"] == ["b"]
    assert not report["schema_match"]


def test_value_change_localized_to_column(spark):
    df1 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k int, s string, v double")
    df2 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 99.0)], "k int, s string, v double")
    report = compare_dataframes(df1, df2)
    assert report["column_match"] == {"k": True, "s": True, "v": False}
    assert report["content_match"] is False


def test_row_order_is_ignored(spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    df2 = spark.createDataFrame([(2, "b"), (1, "a")], "k int, s string")
    report = compare_dataframes(df1, df2)
    assert report["content_match"] is True


def test_row_count_mismatch(spark):
    df1 = spark.createDataFrame([(1,)], "k int")
    df2 = spark.createDataFrame([(1,), (1,)], "k int")
    report = compare_dataframes(df1, df2)
    assert report["row_counts"] == (1, 2)
    assert report["content_match"] is False


def test_dtype_mismatch_reported(spark):
    df1 = spark.createDataFrame([(1,)], "k int")
    df2 = spark.createDataFrame([(1.0,)], "k double")
    report = compare_dataframes(df1, df2)
    assert report["dtype_mismatches"] == {"k": ("int", "double")}
    assert not report["schema_match"]


def test_compare_identical_frames_with_nulls(spark):
    """Multiset equality must treat NULL keys as equal (exceptAll
    semantics): a frame with NULL cells equals itself."""
    from parq_tools_spark.operators.compare import compare_dataframes

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, None)], "k int, v string"
    )
    r = compare_dataframes(df, spark.createDataFrame(df.collect(), df.schema))
    assert r["content_match"] is True
    # and a genuine NULL-pattern difference is still caught
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "x"), (None, None)], "k int, v string"
    )
    assert compare_dataframes(df, df2)["content_match"] is False
