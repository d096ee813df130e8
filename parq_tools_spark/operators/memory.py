"""Memory/size accounting (SURVEY §2.4 A5).

Spark-native rebuild of ``memory_utils.py:5-117``: per-column
compressed bytes come from Parquet footer row-group metadata (driver
side, O(parts) cost, no data scan); decompressed in-memory size is
estimated with one aggregation pass (exact for fixed-width types,
measured for strings/binaries) instead of the reference's
sample-and-scale heuristic.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["compressed_column_sizes", "estimate_memory", "memory_report"]

_FIXED_WIDTH = {
    T.ByteType(): 1,
    T.ShortType(): 2,
    T.IntegerType(): 4,
    T.FloatType(): 4,
    T.LongType(): 8,
    T.DoubleType(): 8,
    T.DateType(): 4,
    T.TimestampType(): 8,
    T.TimestampNTZType(): 8,
    T.BooleanType(): 1,
}


def _part_files(path) -> list[str]:
    if isinstance(path, (list, tuple)):  # pre-resolved file list
        return [f.removeprefix("file://") for f in path]
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def compressed_column_sizes(path) -> dict[str, dict[str, int]]:
    """Per-column {compressed_bytes, uncompressed_bytes} from footers.

    ``path`` is a parquet file, a directory of parts, or an explicit
    list of part files (e.g. ``df.inputFiles()``). Footer-only: cost is
    O(#files), no data pages are read.
    """
    import pyarrow.parquet as pq

    out: dict[str, dict[str, int]] = {}
    for part in _part_files(path):
        meta = pq.ParquetFile(part).metadata
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                entry = out.setdefault(
                    col.path_in_schema,
                    {"compressed_bytes": 0, "uncompressed_bytes": 0},
                )
                entry["compressed_bytes"] += col.total_compressed_size
                entry["uncompressed_bytes"] += col.total_uncompressed_size
    return out


def estimate_memory(
    df: DataFrame, columns: Optional[Sequence[str]] = None
) -> dict[str, int]:
    """Decompressed per-column byte estimate in ONE aggregation pass.

    Fixed-width types: rows x width (exact). Strings/binaries: summed
    lengths (payload bytes; container overhead excluded). Arrays:
    element payload via aggregate over lengths.
    """
    cols = list(columns) if columns is not None else df.columns
    field_type = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    measured = []
    for c in cols:
        dt = field_type[c]
        if isinstance(dt, T.StringType) or isinstance(dt, T.BinaryType):
            aggs.append(F.sum(F.length(F.col(c))).alias(f"{c}__b"))
            measured.append(c)
        elif isinstance(dt, T.ArrayType) and dt.elementType in _FIXED_WIDTH:
            width = _FIXED_WIDTH[dt.elementType]
            aggs.append(
                F.sum(F.size(F.col(c)) * F.lit(width)).alias(f"{c}__b")
            )
            measured.append(c)
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n"]
    result: dict[str, int] = {}
    for c in cols:
        dt = field_type[c]
        if c in measured:
            result[c] = int(row[f"{c}__b"] or 0)
        elif dt in _FIXED_WIDTH:
            result[c] = n * _FIXED_WIDTH[dt]
        else:
            result[c] = 0  # unknown/nested: not estimated
    return result


def memory_report(
    spark: SparkSession, path: str, estimate_decompressed: bool = True
) -> DataFrame:
    """Combined report as a DataFrame:
    (column, compressed_bytes, uncompressed_bytes, in_memory_bytes)."""
    from parq_tools_spark.sources.parquet_io import read_parquet

    footer = compressed_column_sizes(path)
    mem = (
        estimate_memory(read_parquet(spark, path))
        if estimate_decompressed
        else {}
    )
    rows = [
        (
            col,
            sizes["compressed_bytes"],
            sizes["uncompressed_bytes"],
            mem.get(col, 0),
        )
        for col, sizes in sorted(footer.items())
    ]
    return spark.createDataFrame(
        rows,
        "column string, compressed_bytes long, uncompressed_bytes long, "
        "in_memory_bytes long",
    )
