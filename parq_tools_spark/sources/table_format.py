"""Optional Delta Lake / Apache Iceberg table sinks (beyond-reference).

The engine's native sink is plain partitioned parquet
(:mod:`parq_tools_spark.sources.parquet_io`). Lakehouse table formats
add ACID commits, schema evolution, and first-class table metadata —
but they need connector jars on the Spark classpath, which this
container does not ship. Same pattern as the 7z fallback in
:mod:`parq_tools_spark.sources.file_utils`: probe for the optional
dependency, use it when present, and fail with a clear divergence
message (or fall back to parquet + a metadata sidecar) when absent.

Metadata round-trip contract: ``write_table(..., table_metadata={...})``
persists string key/values with the table and ``read_table_metadata``
returns them —

- delta: ``TBLPROPERTIES`` on the path-based table (real table
  metadata, survives any delta reader);
- iceberg: table properties through the catalog;
- parquet fallback: a ``_table_metadata.json`` sidecar in the output
  dir (documented divergence — parquet itself has no table-level
  metadata store; the single-file footer-rewrite path lives in
  ``operators/schema_tools.py``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "table_format_support",
    "detect_table_format",
    "write_table",
    "read_table",
    "read_table_metadata",
]

_SIDECAR = "_table_metadata.json"

_PROBE_CLASSES = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
}


def _class_exists(spark: SparkSession, class_name: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(class_name)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def table_format_support(spark: SparkSession) -> dict[str, bool]:
    """Which lakehouse connectors are on the classpath right now."""
    return {
        fmt: _class_exists(spark, cls) for fmt, cls in _PROBE_CLASSES.items()
    }


def detect_table_format(path: str) -> str:
    """Classify an on-disk table dir by its markers: ``_delta_log/`` ->
    delta, ``metadata/*.metadata.json`` -> iceberg, else parquet."""
    if os.path.isdir(os.path.join(path, "_delta_log")):
        return "delta"
    meta_dir = os.path.join(path, "metadata")
    if os.path.isdir(meta_dir) and any(
        f.endswith(".metadata.json") for f in os.listdir(meta_dir)
    ):
        return "iceberg"
    return "parquet"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "auto",
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
    table_metadata: Optional[dict[str, str]] = None,
) -> str:
    """Write ``df`` as a lakehouse table when a connector is present.

    ``fmt="auto"`` prefers delta, then iceberg, then falls back to
    parquet (+ metadata sidecar). Asking for ``delta``/``iceberg``
    explicitly without the jar raises the divergence error instead of
    silently downgrading. Returns the format actually written.
    """
    spark = df.sparkSession
    support = table_format_support(spark)
    if fmt == "auto":
        fmt = next((f for f in ("delta", "iceberg") if support[f]), "parquet")
    if fmt in _PROBE_CLASSES and not support[fmt]:
        raise ValueError(
            f"{fmt} requested but its connector is not on the Spark "
            f"classpath (probe class {_PROBE_CLASSES[fmt]} missing). "
            "Add the connector jar (spark.jars.packages) or use "
            'fmt="parquet" / "auto" for the plain-parquet fallback '
            "(known divergence: table metadata then lives in a "
            f"{_SIDECAR} sidecar, not a table format)."
        )
    if fmt not in ("delta", "iceberg", "parquet"):
        raise ValueError(f"unknown table format {fmt!r}")

    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)

    if fmt == "parquet":
        writer.parquet(path)
        if table_metadata:
            with open(os.path.join(path, _SIDECAR), "w") as f:
                json.dump({str(k): str(v) for k, v in table_metadata.items()}, f)
        return fmt

    writer.format(fmt).save(path)
    if table_metadata:
        props = ", ".join(
            f"'{k}' = '{v}'" for k, v in table_metadata.items()
        )
        # path-based table identifier: delta.`/path` / iceberg catalogs
        spark.sql(f"ALTER TABLE {fmt}.`{path}` SET TBLPROPERTIES ({props})")
    return fmt


def read_table(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    """Read back a table written by :func:`write_table` (format
    auto-detected from the directory markers by default)."""
    if fmt == "auto":
        fmt = detect_table_format(path)
    if fmt in _PROBE_CLASSES:
        if not table_format_support(spark)[fmt]:
            raise ValueError(
                f"{path} is a {fmt} table but the {fmt} connector is not "
                "on the Spark classpath; add the jar to read it"
            )
        return spark.read.format(fmt).load(path)
    return spark.read.parquet(path)


def read_table_metadata(spark: SparkSession, path: str) -> dict[str, str]:
    """Table metadata round-trip: TBLPROPERTIES for delta/iceberg, the
    JSON sidecar for the parquet fallback ({} when none)."""
    fmt = detect_table_format(path)
    if fmt in _PROBE_CLASSES:
        if not table_format_support(spark)[fmt]:
            raise ValueError(
                f"{path} is a {fmt} table but the {fmt} connector is not "
                "on the Spark classpath; add the jar to read its metadata"
            )
        rows = spark.sql(f"SHOW TBLPROPERTIES {fmt}.`{path}`").collect()
        return {r["key"]: r["value"] for r in rows}
    sidecar = os.path.join(path, _SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {}
