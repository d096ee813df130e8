"""Filter operator (SURVEY §2.2 P1-P7).

Spark-native rebuild of ``filter_parquet_file``
(``/root/reference/parq_tools/parq_filter.py:34-84``): the reference
hand-fuses scan + pushdown filter + projection + streaming write; here
the same pipeline is declared as
``read.filter(col_expr).select(cols).write`` and Catalyst fuses it —
the predicate lands in ``PushedFilters`` on the Parquet scan and the
projection in ``ReadSchema``, so at 100 TB only matching row groups
and requested columns are ever decoded.

Divergence (documented, SURVEY §7.4): on an empty result the reference
writes *no* output file (``parq_filter.py:64-67``); Spark writes a
valid schema-only Parquet output. We keep Spark's behavior — an
always-present output with authoritative schema is the saner contract
for downstream readers.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from parq_tools_spark.plans.query_parser import build_filter_expression
from parq_tools_spark.sources.parquet_io import read_parquet, write_parquet

__all__ = ["filter_dataframe", "filter_parquet"]


def filter_dataframe(
    df: DataFrame,
    expression: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
    index_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Apply a DSL filter + projection to a DataFrame.

    ``index_columns`` are force-prepended to the projection and
    de-duplicated, matching the reference's column-ordering discipline
    (``parq_concat.py:253-275``).
    """
    if expression:
        df = df.filter(build_filter_expression(expression, df.columns))
    if columns is not None:
        ordered = list(dict.fromkeys([*(index_columns or []), *columns]))
        df = df.select(*ordered)
    return df


def filter_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    expression: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
    index_columns: Optional[Sequence[str]] = None,
    single_file: bool = False,
    show_progress: bool = False,
    progress_callback=None,
) -> None:
    """File-to-file filter, the reference's flagship entry point (P6).

    ``show_progress`` reports task-level progress of the distributed
    scan+write (reference progress.py parity); pass
    ``progress_callback(desc, done, total)`` to redirect it."""
    from contextlib import nullcontext

    from parq_tools_spark.sources.progress import job_progress

    df = filter_dataframe(
        read_parquet(spark, input_path), expression, columns, index_columns
    )
    ctx = (
        job_progress(spark, "filter_parquet", progress_callback)
        if show_progress or progress_callback is not None
        else nullcontext()
    )
    with ctx:
        write_parquet(df, output_path, single_file=single_file)
