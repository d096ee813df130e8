"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides. Writing both tables bucketed by the join key
(``bucketBy(n, keys)`` + ``saveAsTable``) pre-partitions the data on
disk; Spark then plans a sort-merge join with **zero Exchange** —
each task reads matching bucket files from both sides.

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes do not retain bucket metadata.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "bucketed_join_plan_is_shuffle_free"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 32,
    sort_keys: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+ optionally sorted) catalog table.

    ``sort_keys`` additionally sorts within buckets so the sort-merge
    join needs no per-task sort either. ``num_buckets`` should match
    across the tables you intend to co-join.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> bool:
    """True if joining the two bucketed tables plans no real Exchange."""
    joined = spark.table(left_table).join(spark.table(right_table), on=list(on))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange") == 0
