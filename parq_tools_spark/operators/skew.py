"""Join-key skew diagnostics (beyond-reference).

Skewed keys are the canonical 100 TB failure mode: one reducer gets a
hot key's entire partition and the stage runs at the speed of its
slowest task. Before committing to a shuffle on a key, measure it:
``key_skew_report`` returns each candidate column's heaviest values
with their row share, so the caller can decide between a plain join,
`joins.salted_join`, or AQE skew handling — from evidence, not
folklore.

One aggregation per column (map-side combined) + a TakeOrdered top-N;
the only driver-sized data is top_n rows per column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_report", "skew_factor"]


def key_skew_report(
    df: DataFrame, columns: Sequence[str], top_n: int = 10
) -> DataFrame:
    """Heaviest ``top_n`` values per candidate key column.

    Returns (column, value, n_rows, share) — ``value`` stringified so
    heterogeneous key types stack in one result, ``share`` = fraction
    of all rows carrying that value. Ties break on the value string so
    the report is deterministic. Nulls count as a key (they hash to
    one reducer like any other value — a mostly-null join key IS a
    skew problem).
    """
    total = df.count()
    if total == 0:
        raise ValueError("empty input")
    parts = []
    for col in columns:
        counts = (
            df.groupBy(F.col(col).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        # orderBy + limit compiles to TakeOrderedAndProject: a
        # distributed partial top-N — the per-key count table can be as
        # big as the key cardinality, so no global sort and no
        # single-task window over it
        parts.append(
            counts.orderBy(F.col("n_rows").desc(), F.col("value").asc())
            .limit(top_n)
            .select(
                F.lit(col).alias("column"),
                "value",
                "n_rows",
                (F.col("n_rows").cast("double") / F.lit(float(total))).alias(
                    "share"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def skew_factor(df: DataFrame, column: str) -> float:
    """max key count / mean key count — 1.0 is perfectly uniform; a
    shuffle on a key with factor f has a straggler ~f times the average
    task. One aggregation pass."""
    row = (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("mean"))
        .collect()[0]
    )
    return float(row.mx) / float(row.mean)
