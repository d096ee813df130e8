"""Concat tests (reference parity: test/concat/)."""

import pandas as pd
import pytest

from parq_tools_spark.operators.concat import (
    ConcatError,
    concat_tall,
    concat_wide,
    concat_with_dataframe,
    unify_schemas,
    validate_index_alignment,
)
from parq_tools_spark.plans.query_parser import FilterParseError


def _nan_missing(df: pd.DataFrame) -> pd.DataFrame:
    """Pin the None-vs-NaN intent: both mean 'missing' here. Spark
    round-trips object-column nulls as None, pandas concat as NaN;
    assert_frame_equal currently treats them as equal but a future
    pandas flips that, so normalize both sides to NaN explicitly."""
    return df.where(df.notna(), other=float("nan"))


def test_tall_concat_same_schema(spark, wide_tables):
    out = concat_tall(spark, [wide_tables["wide_1"], wide_tables["wide_1"]])
    assert out.count() == 20
    assert out.columns == ["x", "y", "z", "a"]


def test_tall_concat_schema_evolution(spark, wide_tables):
    # wide_1 has col a (string), wide_2 has col b (double): union pads nulls
    out = concat_tall(spark, [wide_tables["wide_1"], wide_tables["wide_2"]])
    assert out.count() == 20
    assert set(out.columns) == {"x", "y", "z", "a", "b"}
    pdf = out.toPandas()
    assert pdf["a"].isna().sum() == 10
    assert pdf["b"].isna().sum() == 10


def test_tall_concat_filter_pushdown_per_file(spark, wide_tables):
    out = concat_tall(
        spark, [wide_tables["wide_1"], wide_tables["wide_2"]], filter_query="x > 5"
    )
    assert out.count() == 10  # 5 rows from each file
    assert out.filter("x <= 5").count() == 0


def test_tall_concat_filter_missing_column_errors(spark, wide_tables):
    # 'a' exists only in wide_1 -> reference errors (test/concat/test_tall.py:84-109)
    with pytest.raises(FilterParseError, match="missing in one or more"):
        concat_tall(
            spark,
            [wide_tables["wide_1"], wide_tables["wide_2"]],
            filter_query="a == 'val1'",
        )


def test_tall_concat_matches_pandas_oracle(spark, wide_tables):
    out = (
        concat_tall(spark, [wide_tables["wide_1"], wide_tables["wide_2"]])
        .toPandas()
        .sort_values(["x", "a"], na_position="last")
        .reset_index(drop=True)
    )
    p1 = pd.read_parquet(wide_tables["wide_1"])
    p2 = pd.read_parquet(wide_tables["wide_2"])
    expected = (
        pd.concat([p1, p2], axis=0, ignore_index=True)
        .sort_values(["x", "a"], na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        _nan_missing(out[sorted(out.columns)]),
        _nan_missing(expected[sorted(expected.columns)]),
        check_dtype=False,
    )


def test_wide_concat_joins_on_index(spark, wide_tables):
    out = concat_wide(
        spark,
        [wide_tables["wide_1"], wide_tables["wide_2"], wide_tables["wide_3"]],
        index_columns=["x", "y", "z"],
        validate=True,
    )
    assert out.count() == 10
    assert out.columns == ["x", "y", "z", "a", "b", "c"]
    row = out.filter("x = 3").collect()[0]
    assert row.a == "val3" and row.b == 3.0 and row.c == 6


def test_wide_concat_matches_pandas_oracle(spark, wide_tables):
    out = (
        concat_wide(
            spark,
            [wide_tables["wide_1"], wide_tables["wide_2"]],
            index_columns=["x", "y", "z"],
        )
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    p1 = pd.read_parquet(wide_tables["wide_1"]).set_index(["x", "y", "z"])
    p2 = pd.read_parquet(wide_tables["wide_2"]).set_index(["x", "y", "z"])
    expected = pd.concat([p1, p2], axis=1).reset_index().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, expected, check_dtype=False)


def test_wide_concat_duplicate_columns_rejected(spark, wide_tables):
    with pytest.raises(ConcatError, match="Duplicate"):
        concat_wide(
            spark,
            [wide_tables["wide_1"], wide_tables["wide_1"]],
            index_columns=["x", "y", "z"],
        )


def test_wide_concat_misaligned_index_rejected(spark, wide_tables, tmp_path):
    bad = pd.DataFrame({"x": [99], "y": [99], "z": [99], "d": [1.0]})
    bad_path = str(tmp_path / "bad.parquet")
    bad.to_parquet(bad_path, index=False)
    dfs = [
        spark.read.parquet(wide_tables["wide_1"]),
        spark.read.parquet(bad_path),
    ]
    with pytest.raises(ConcatError, match="misalignment"):
        validate_index_alignment(dfs, ["x", "y", "z"])


def test_concat_with_dataframe_broadcast_left_join(spark, wide_tables):
    src = spark.read.parquet(wide_tables["wide_1"])
    extra = spark.createDataFrame(
        [(1, 11, 21, 100.0), (2, 12, 22, 200.0)], "x long, y long, z long, extra double"
    )
    out = concat_with_dataframe(src, extra, ["x", "y", "z"])
    assert out.count() == 10
    pdf = out.toPandas().set_index("x")
    assert pdf.loc[1, "extra"] == 100.0
    assert pd.isna(pdf.loc[3, "extra"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_concat_with_dataframe_validations(spark, wide_tables):
    src = spark.read.parquet(wide_tables["wide_1"])
    dup = spark.createDataFrame(
        [(1, 11, 21, 1.0), (1, 11, 21, 2.0)], "x long, y long, z long, e double"
    )
    with pytest.raises(ConcatError, match="Duplicate index keys"):
        concat_with_dataframe(src, dup, ["x", "y", "z"])
    overlap = spark.createDataFrame([(1, 11, 21, "v")], "x long, y long, z long, a string")
    with pytest.raises(ConcatError, match="Overlapping"):
        concat_with_dataframe(src, overlap, ["x", "y", "z"])


def test_unify_schemas_numeric_promotion(spark):
    from pyspark.sql import types as T

    s1 = T.StructType([T.StructField("v", T.IntegerType())])
    s2 = T.StructType([T.StructField("v", T.DoubleType())])
    assert unify_schemas([s1, s2])["v"].dataType == T.DoubleType()
    s3 = T.StructType([T.StructField("v", T.StringType())])
    with pytest.raises(ConcatError, match="unify"):
        unify_schemas([s1, s3])
