"""Index utilities: sort, reindex, dedup (SURVEY §2.5 W1, §2.3 J4, §2.4 A4).

Spark-native rebuild of ``/root/reference/parq_tools/utils/index_utils.py``.
Each operator here replaces a scalability cliff in the reference
(BASELINE.md "cliffs" section):

- sort: the reference sorts chunks then concatenates **all** chunks in
  memory for a final re-sort (``index_utils.py:93-98``); Spark's
  ``orderBy`` is a range-partitioned external sort that spills.
- reindex: the reference joins the full new index against *each*
  chunk, duplicating rows for multi-chunk inputs
  (``index_utils.py:132-152``); here it is one global left join.
- dedup keep-first: the reference holds every key tuple in a Python
  set (``index_utils.py:183-199``); here it is a window `row_number`
  over an explicit order — shuffle-partitioned by key, no driver state.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sort_dataframe",
    "reindex_dataframe",
    "dedupe_keep_first",
    "dedupe_exact",
    "sort_parquet",
    "reindex_parquet",
    "dedupe_parquet",
]


def sort_dataframe(
    df: DataFrame,
    columns: Sequence[str],
    ascending: bool | Sequence[bool] = True,
) -> DataFrame:
    """Global multi-column sort (W1) — distributed range-partitioned sort."""
    if isinstance(ascending, bool):
        ascending = [ascending] * len(columns)
    order = [
        F.col(c).asc() if asc else F.col(c).desc()
        for c, asc in zip(columns, ascending)
    ]
    return df.orderBy(*order)


def reindex_dataframe(
    df: DataFrame,
    new_index: DataFrame,
    index_columns: Sequence[str],
    fill_values: Optional[dict] = None,
    sort: bool = False,
) -> DataFrame:
    """Left-join ``df`` onto a new index (J4), one global shuffle join.

    Rows of ``new_index`` absent from ``df`` appear null-padded. The
    reference fills unmatched float rows with NaN
    (``index_utils.py:142-143``); Spark keeps SQL null (NaN != null in
    Spark semantics) — pass ``fill_values`` to override per column.
    Column order: index columns first, then ``df``'s value columns.
    """
    keys = list(index_columns)
    value_cols = [c for c in df.columns if c not in keys]
    out = new_index.select(*keys).join(df, on=keys, how="left")
    out = out.select(*keys, *value_cols)
    if fill_values:
        out = out.na.fill(fill_values)
    if sort:
        out = sort_dataframe(out, keys)
    return out


def dedupe_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keep the first row per key (A4).

    "First" needs an explicit order in a distributed engine (SURVEY
    §7.4 #1). With ``order_columns`` the result is deterministic; with
    none we capture file/read order via ``monotonically_increasing_id``
    *before* any shuffle, reproducing the reference's scan-order
    semantics for a single ordered source.
    """
    keys = list(keys)
    if order_columns:
        w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_columns])
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    ordered = df.withColumn("_ord", F.monotonically_increasing_id())
    w = Window.partitionBy(*keys).orderBy("_ord")
    return (
        ordered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ord")
    )


def sort_parquet(
    spark,
    input_path: str,
    output_path: str,
    columns: Sequence[str],
    ascending: bool | Sequence[bool] = True,
    single_file: bool = False,
) -> None:
    """File-level sort facade (reference ``sort_parquet_file`` shape)."""
    from parq_tools_spark.sources.parquet_io import read_parquet, write_parquet

    write_parquet(
        sort_dataframe(read_parquet(spark, input_path), columns, ascending),
        output_path,
        single_file=single_file,
    )


def reindex_parquet(
    spark,
    input_path: str,
    output_path: str,
    new_index: DataFrame,
    index_columns: Sequence[str],
    fill_values: Optional[dict] = None,
    sort: bool = False,
    single_file: bool = False,
) -> None:
    """File-level reindex facade (``index_utils.reindex`` shape, J4)."""
    from parq_tools_spark.sources.parquet_io import read_parquet, write_parquet

    out = reindex_dataframe(
        read_parquet(spark, input_path), new_index, index_columns, fill_values, sort
    )
    write_parquet(out, output_path, single_file=single_file)


def dedupe_parquet(
    spark,
    input_path: str,
    output_path: str,
    keys: Sequence[str],
    order_columns: Optional[Sequence[str]] = None,
    single_file: bool = False,
) -> None:
    """File-level keep-first dedup facade (``index_utils.dedupe`` shape, A4)."""
    from parq_tools_spark.sources.parquet_io import read_parquet, write_parquet

    out = dedupe_keep_first(read_parquet(spark, input_path), keys, order_columns)
    write_parquet(out, output_path, single_file=single_file)


def dedupe_exact(df: DataFrame, keys: Optional[Sequence[str]] = None) -> DataFrame:
    """Exact dedup where "which row survives" is irrelevant.

    ``dropDuplicates`` is a hash aggregation — one shuffle, map-side
    partial dedup first, no window state. Prefer this at scale when
    keep-first order does not matter.
    """
    return df.dropDuplicates(list(keys)) if keys else df.dropDuplicates()
