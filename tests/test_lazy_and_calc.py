"""Lazy facade + calculated-column tests (reference parity:
test/lazy_parquet/, test/calculated_columns/)."""

import os

import pandas as pd
import pytest

from parq_tools_spark.functions.calculated_columns import (
    CalculatedColumn,
    load_calculated_columns,
    with_calculated_columns,
)
from parq_tools_spark.lazy import LazySparkDF
from parq_tools_spark.sources.demo_data import create_demo_blockmodel


def test_lazy_metadata(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    assert lazy.columns == ["x", "y", "z", "a"]
    assert lazy.shape == (10, 4)
    assert len(lazy) == 10
    assert "a" in lazy and "nope" not in lazy


def test_lazy_column_access_preserves_order(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    series = lazy["a"]
    assert list(series) == [f"val{i}" for i in range(1, 11)]
    pdf = lazy[["x", "a"]]
    assert list(pdf.columns) == ["x", "a"]
    assert list(pdf.x) == list(range(1, 11))


def test_lazy_missing_column_raises(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    with pytest.raises(KeyError):
        lazy["nope"]


def test_lazy_setitem_scalar_expr_and_array(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    lazy["flag"] = 1
    lazy["x2"] = "x * 2"
    lazy["tag"] = [f"t{i}" for i in range(10)]
    pdf = lazy.to_pandas()
    assert (pdf.flag == 1).all()
    assert list(pdf.x2) == [2 * i for i in range(1, 11)]
    assert list(pdf.tag) == [f"t{i}" for i in range(10)]


def test_lazy_setitem_length_mismatch(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    with pytest.raises(ValueError, match="Length mismatch"):
        lazy["bad"] = [1, 2, 3]


def test_lazy_filter_and_query(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    out = lazy.query("x > 8").to_pandas()
    assert list(out.x) == [9, 10]


def test_lazy_head_and_describe(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    assert len(lazy.head(3)) == 3
    desc = lazy.describe()
    assert float(desc.loc["mean", "x"]) == 5.5


def test_lazy_iter_row_chunks(spark, wide_tables):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    chunks = list(lazy.iter_row_chunks(chunk_size=4))
    assert [len(c) for c in chunks] == [4, 4, 2]
    rebuilt = pd.concat(chunks, ignore_index=True)
    assert list(rebuilt.x) == list(range(1, 11))


def test_lazy_roundtrip_save(spark, wide_tables, tmp_path):
    lazy = LazySparkDF(spark, wide_tables["wide_1"])
    lazy["x2"] = "x * 2"
    out = str(tmp_path / "saved")
    lazy.save(out, single_file=True)
    back = spark.read.parquet(out)
    assert set(back.columns) == {"x", "y", "z", "a", "x2"}
    assert back.count() == 10


# ----------------------------------------------------------- calculated cols
def test_calculated_column_expr(spark, wide_tables):
    df = spark.read.parquet(wide_tables["wide_1"])
    cc = CalculatedColumn("x_plus_y", expr_sql="x + y")
    out = cc.apply(df)
    assert out.filter("x_plus_y <> x + y").count() == 0


def test_calculated_column_pandas_udf(spark, wide_tables):
    df = spark.read.parquet(wide_tables["wide_1"])

    def ratio(x, y):
        return x / y

    cc = CalculatedColumn("ratio", func=ratio, return_type="double")
    assert cc.dependencies == ("x", "y")
    row = cc.apply(df).filter("x = 1").collect()[0]
    assert abs(row.ratio - 1 / 11) < 1e-12


def test_calculated_column_missing_dependency(spark, wide_tables):
    df = spark.read.parquet(wide_tables["wide_1"])

    def f(nope):
        return nope

    with pytest.raises(ValueError, match="missing"):
        CalculatedColumn("bad", func=f).apply(df)


def test_calculated_chain_and_persistence(spark, wide_tables, tmp_path):
    df = spark.read.parquet(wide_tables["wide_1"])
    out = with_calculated_columns(
        df,
        [
            CalculatedColumn("x2", expr_sql="x * 2"),
            CalculatedColumn("x4", expr_sql="x2 * 2"),  # depends on previous
        ],
    )
    assert out.filter("x4 <> x * 4").count() == 0
    path = str(tmp_path / "calc")
    out.write.parquet(path)
    reloaded = spark.read.parquet(path)
    recovered = load_calculated_columns(reloaded)
    assert {c.name: c.expr_sql for c in recovered} == {"x2": "x * 2", "x4": "x2 * 2"}


def test_exactly_one_of_func_or_expr():
    with pytest.raises(ValueError):
        CalculatedColumn("x")
    with pytest.raises(ValueError):
        CalculatedColumn("x", func=lambda a: a, expr_sql="a")


# ----------------------------------------------------------- demo blockmodel
def test_demo_blockmodel(spark):
    bm = create_demo_blockmodel(spark, shape=(2, 2, 2), block_size=(1, 1, 1))
    pdf = bm.toPandas().sort_values("c_order_xyz").reset_index(drop=True)
    assert len(pdf) == 8
    # first block centroid at corner + half block
    assert (pdf.loc[0, ["x", "y", "z"]] == [0.5, 0.5, 0.5]).all()
    # z varies fastest in C-order
    assert list(pdf.z[:2]) == [0.5, 1.5]
    assert sorted(pdf.f_order_zyx) == list(range(8))
    # depth from model top (z extent = 2.0)
    assert pdf.loc[0, "depth"] == 1.5


def test_demo_blockmodel_is_distributed(spark):
    bm = create_demo_blockmodel(spark, shape=(10, 10, 10))
    assert bm.rdd.getNumPartitions() > 1
    assert bm.count() == 1000
