"""Memory/size accounting tests (reference parity: test/memory/)."""

import os

from parq_tools_spark.operators.memory import (
    compressed_column_sizes,
    estimate_memory,
    memory_report,
)


def test_compressed_sizes_from_footer(sf_dir):
    sizes = compressed_column_sizes(os.path.join(sf_dir, "lineitem.parquet"))
    assert set(sizes) >= {"l_orderkey", "l_quantity", "l_returnflag"}
    for entry in sizes.values():
        assert entry["compressed_bytes"] > 0
        assert entry["uncompressed_bytes"] >= entry["compressed_bytes"] * 0.1


def test_estimate_memory_fixed_and_string(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    est = estimate_memory(df)
    n = df.count()
    assert est["r_regionkey"] == n * 4  # int32
    total_chars = sum(len(r.r_name) for r in df.collect())
    assert est["r_name"] == total_chars


def test_estimate_memory_array_column(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    est = estimate_memory(df, ["embedding"])
    assert est["embedding"] == df.count() * 64 * 4  # 64 x float32


def test_memory_report_dataframe(spark, sf_dir):
    rep = memory_report(spark, os.path.join(sf_dir, "customer.parquet"))
    rows = {r.column: r for r in rep.collect()}
    assert rows["c_name"].in_memory_bytes > 0
    assert rows["c_custkey"].compressed_bytes > 0
