"""Optional Delta/Iceberg sink tests.

This container ships no connector jars, so these tests pin the
fallback behavior (clean parquet + sidecar metadata round-trip,
divergence errors naming the missing jar) and the format detection
that would route to the connectors when present.
"""

import json
import os

import pytest

from parq_tools_spark.sources.table_format import (
    detect_table_format,
    read_table,
    read_table_metadata,
    table_format_support,
    write_table,
)


def test_support_probe_reports_missing_connectors(spark):
    support = table_format_support(spark)
    assert set(support) == {"delta", "iceberg"}
    # this container has neither jar; if one appears, the write path
    # below would route to it and this pin should be revisited
    assert support == {"delta": False, "iceberg": False}


def test_auto_falls_back_to_parquet_with_sidecar(spark, tmp_path):
    df = spark.range(0, 100).selectExpr("id", "id % 7 AS k")
    out = str(tmp_path / "tbl")
    fmt = write_table(
        df,
        out,
        fmt="auto",
        partition_by=["k"],
        table_metadata={"owner": "pipeline", "run": "42"},
    )
    assert fmt == "parquet"
    back = read_table(spark, out)
    assert back.count() == 100
    assert read_table_metadata(spark, out) == {"owner": "pipeline", "run": "42"}
    # partitioned layout materialized
    assert any(e.startswith("k=") for e in os.listdir(out))


def test_explicit_delta_without_jar_names_divergence(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="connector is not on the Spark classpath"):
        write_table(df, str(tmp_path / "d"), fmt="delta")
    with pytest.raises(ValueError, match="unknown table format"):
        write_table(df, str(tmp_path / "x"), fmt="hudi")


def test_detect_table_format_markers(tmp_path):
    delta = tmp_path / "delta_tbl"
    (delta / "_delta_log").mkdir(parents=True)
    assert detect_table_format(str(delta)) == "delta"

    iceberg = tmp_path / "ice_tbl"
    (iceberg / "metadata").mkdir(parents=True)
    (iceberg / "metadata" / "v1.metadata.json").write_text("{}")
    assert detect_table_format(str(iceberg)) == "iceberg"

    plain = tmp_path / "plain"
    plain.mkdir()
    assert detect_table_format(str(plain)) == "parquet"


def test_reading_foreign_delta_without_jar_errors(spark, tmp_path):
    delta = tmp_path / "delta_tbl"
    (delta / "_delta_log").mkdir(parents=True)
    with pytest.raises(ValueError, match="delta connector is not"):
        read_table(spark, str(delta))
    with pytest.raises(ValueError, match="delta connector is not"):
        read_table_metadata(spark, str(delta))


def test_sidecar_absent_returns_empty_metadata(spark, tmp_path):
    df = spark.range(5)
    out = str(tmp_path / "nometa")
    write_table(df, out, fmt="parquet")
    assert read_table_metadata(spark, out) == {}
    assert json.loads("{}") == {}  # sanity: sidecar format is plain JSON
