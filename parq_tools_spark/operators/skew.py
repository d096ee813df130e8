"""Join-key skew diagnostics (beyond-reference).

Skewed keys are the canonical 100 TB failure mode: one reducer gets a
hot key's entire partition and the stage runs at the speed of its
slowest task. Before committing to a shuffle on a key, measure it:
``key_skew_report`` returns each candidate column's heaviest values
with their row share, so the caller can decide between a plain join,
`joins.salted_join`, or AQE skew handling — from evidence, not
folklore.

ONE scan of the input regardless of how many columns are profiled:
the candidate columns stack into (column, value) pairs in a single
projection, one map-side-combined aggregation counts them, and the
per-column top-N window compiles to a map-side WindowGroupLimit. The
only driver-sized data is top_n rows per column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
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

    Single pass: each input row explodes into one (column, value) pair
    per candidate column; one groupBy (partial aggregation shrinks the
    shuffle to the distinct pairs per map partition) counts them all.
    The per-column top-N is a ``row_number`` window that Spark rewrites
    to a map-side WindowGroupLimit, so at most top_n rows per column
    per partition reach the final ranking — never the full key-count
    table. Totals fold out of the same counts (a column's counts sum
    to the row count) via a broadcast of one row per column; the
    aggregation exchange is reused between the two branches, so the
    input is still scanned once. The old shape — one groupBy + count()
    per column — scanned a 100 TB table C+1 times for a C-column
    report.
    """
    if df.isEmpty():
        raise ValueError("empty input")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_pos"),
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for i, c in enumerate(columns)
                ]
            )
        ).alias("kv")
    ).select("kv._pos", "kv.column", "kv.value")
    counts = stacked.groupBy("_pos", "column", "value").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.groupBy("column").agg(F.sum("n_rows").alias("_total"))
    w = Window.partitionBy("column").orderBy(
        F.col("n_rows").desc(), F.col("value").asc()
    )
    top = (
        counts.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= top_n)
        .drop("_rnk")
    )
    return (
        top.join(F.broadcast(totals), "column")
        # bounded sort: at most top_n rows per column reach it
        .orderBy("_pos", F.col("n_rows").desc(), F.col("value").asc())
        .select(
            "column",
            "value",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
        )
    )


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
    if row.mx is None:
        raise ValueError("empty input")
    return float(row.mx) / float(row.mean)
