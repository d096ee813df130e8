"""Z-order (Morton-curve) clustered parquet writes (beyond-reference).

At 100 TB, pruning is the difference between reading terabytes and
reading gigabytes — but min/max row-group statistics only prune on
columns the data is physically ordered by. A linear sort favors ONE
column; interleaving the bits of several columns' grid coordinates
(the Z-order / Morton curve) makes every participating column's values
locally clustered, so range predicates on ANY of them skip most files
and row groups.

Everything is JVM expression tree — the scaling, the bit interleave,
the range partition, and the within-partition sort all run in
whole-stage codegen; no UDFs, one extra stats pass (min/max per
column, a single tiny aggregate) plus the write's own range-partition
sampling.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_column", "write_zordered", "file_stat_ranges"]


def zorder_column(
    scaled: Sequence[Column],
    bits: int = 16,
) -> Column:
    """Interleave ``bits`` low bits of each (already grid-scaled, long)
    column into one Morton code.

    Bit b of column i lands at position ``b * n_cols + i``;
    ``bits * n_cols`` must stay within a BIGINT's 63 value bits (16
    bits covers up to 3 columns; ``write_zordered`` auto-shrinks bits
    for wider column sets). Pure shift/mask expression —
    engine-portable (the driver oracle recomputes it with DuckDB's bit
    operators).
    """
    n = len(scaled)
    if not 0 < bits * n <= 63:
        raise ValueError("bits * n_cols must be in (0, 63]")
    terms = [
        F.shiftleft(
            F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + i
        )
        for b in range(bits)
        for i, col in enumerate(scaled)
    ]
    return reduce(lambda a, c: a + c, terms)


def _grid_scale(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits)."""
    cells = 1 << bits
    span = (mx - mn) or 1.0
    scaled = F.floor(
        (col.cast("double") - F.lit(float(mn))) / F.lit(float(span)) * cells
    )
    return F.least(F.lit(cells - 1), F.greatest(F.lit(0), scaled)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    columns: Sequence[str],
    bits: int = 16,
    num_files: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet physically clustered on the Z-order
    curve of ``columns``.

    One tiny min/max aggregate fixes the grid, then
    ``repartitionByRange`` on the Morton code (sampled range
    partitioner — balanced output files) + ``sortWithinPartitions``
    gives every file AND every row group tight min/max ranges on all
    participating columns. Readers need no cooperation: plain Spark /
    DuckDB / pyarrow scans prune on the ordinary parquet statistics.

    ``bits`` is shrunk automatically when ``bits * len(columns)`` would
    overflow a BIGINT's 63 value bits (e.g. 4 columns -> 15 bits each);
    grid resolution beyond ~2^10 per dimension adds nothing once files
    hold millions of rows. Timestamp/date columns (the most common
    clustering keys) grid on their epoch-micros value.
    """
    bits = min(bits, 63 // max(1, len(columns)))
    dtypes = dict(df.dtypes)

    def numeric(c: str) -> Column:
        dt = dtypes[c]
        if dt.startswith("timestamp") or dt == "date":
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        return F.col(c).cast("double")

    stats_row = df.agg(
        *[F.min(numeric(c)).alias(f"{c}__mn") for c in columns],
        *[F.max(numeric(c)).alias(f"{c}__mx") for c in columns],
    ).collect()[0]
    # all-null or empty columns have no stats: pin them to cell 0 so
    # the write still succeeds (they contribute nothing to clustering)
    scaled = [
        _grid_scale(
            F.coalesce(numeric(c), F.lit(0.0)),
            stats_row[f"{c}__mn"] if stats_row[f"{c}__mn"] is not None else 0.0,
            stats_row[f"{c}__mx"] if stats_row[f"{c}__mx"] is not None else 0.0,
            bits,
        )
        for c in columns
    ]
    z = df.withColumn("__z", zorder_column(scaled, bits))
    parted = (
        z.repartitionByRange(num_files, "__z")
        if num_files
        else z.repartitionByRange("__z")
    )
    (
        parted.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_stat_ranges(path: str, column: str) -> list[tuple[float, float]]:
    """Per-file (min, max) of ``column`` from parquet footers — the
    measurement side of the clustering claim (no data read)."""
    from parq_tools_spark.operators.memory import _part_files

    import pyarrow.parquet as pq

    out = []
    for part in _part_files(path):
        meta = pq.ParquetFile(part).metadata
        mn, mx = None, None
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    if s.has_min_max:
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
        if mn is not None:
            out.append((float(mn), float(mx)))
    return out
