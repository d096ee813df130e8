"""Lazy column-on-demand DataFrame facade (SURVEY §3.3).

API-compatible rebuild of ``LazyParquetDF``
(``/root/reference/parq_tools/lazy_parquet.py:18-570``). The reference
hand-implements laziness (per-column reads, a pandas cache, mutation
overlay by row position). A Spark ``DataFrame`` *is* lazy — Catalyst
prunes to exactly the touched columns — so this class is a thin facade
that keeps the reference's ergonomics:

- ``columns`` / ``shape`` / ``dtypes`` — footer-cheap metadata;
- ``lazy["col"]`` — materialize one column (pandas Series);
- ``lazy["new"] = scalar | Column | array-like`` — mutation overlay;
- ``head`` / ``query`` / ``filter`` / ``describe`` — plan operations;
- ``iter_row_chunks`` — ``toLocalIterator`` over Arrow batches;
- ``to_pandas`` / ``to_parquet`` / ``save`` — materialization sinks.

Row identity (the reference leans on implicit file order, SURVEY §7.4
#1) is made explicit: a ``_row_id`` ordinal is captured from the file
scan order once, at construction, and used for positional alignment of
array-like assignment and ordered iteration.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parq_tools_spark.plans.query_parser import build_filter_expression

_ROW_ID = "_row_id"

__all__ = ["LazySparkDF", "with_row_ordinal"]


def with_row_ordinal(df: DataFrame, name: str = _ROW_ID) -> DataFrame:
    """Attach a dense 0-based ordinal in scan order — distributed.

    A naive ``row_number() OVER ()`` collapses the data to ONE
    partition (WindowExec warns exactly this). Instead:
    ``monotonically_increasing_id`` is ``partition_id << 33 + seq``, so
    the within-partition sequence is ``mono - min(mono)`` per
    partition; a tiny per-partition (count, min) aggregation on the
    driver yields cumulative offsets, joined back as a broadcast map.
    Cost: one small agg + a map-side join — no global shuffle, order
    identical to the reference's file scan order.
    """
    tagged = df.withColumn("_mono", F.monotonically_increasing_id()).withColumn(
        "_pid", F.spark_partition_id()
    )
    stats = (
        tagged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min("_mono").alias("_min_mono"))
        .collect()
    )
    offset = 0
    rows = []
    for r in sorted(stats, key=lambda r: r["_pid"]):
        rows.append((r["_pid"], offset, r["_min_mono"]))
        offset += r["_cnt"]
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        rows, "_pid int, _offset long, _min_mono long"
    )
    return (
        tagged.join(F.broadcast(offsets), on="_pid", how="inner")
        .withColumn(name, F.col("_offset") + (F.col("_mono") - F.col("_min_mono")))
        .drop("_mono", "_pid", "_offset", "_min_mono")
    )


class LazySparkDF:
    """Column-on-demand facade over a Parquet-backed Spark DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        path: Optional[str] = None,
        df: Optional[DataFrame] = None,
        index_columns: Optional[Sequence[str]] = None,
    ):
        if (path is None) == (df is None):
            raise ValueError("Provide exactly one of path or df")
        base = spark.read.parquet(path) if path else df
        self._spark = spark
        self._index_columns = list(index_columns or [])
        # explicit, distributed row ordinal in scan order (no global window)
        self._df = with_row_ordinal(base, _ROW_ID)
        self._user_columns = [c for c in base.columns]

    # ------------------------------------------------------------ metadata
    @property
    def columns(self) -> list[str]:
        return list(self._user_columns)

    @property
    def dtypes(self) -> dict[str, str]:
        d = dict(self._df.dtypes)
        return {c: d[c] for c in self._user_columns}

    @property
    def shape(self) -> tuple[int, int]:
        return (self._df.count(), len(self._user_columns))

    def __len__(self) -> int:
        return self.shape[0]

    def __contains__(self, col: str) -> bool:
        return col in self._user_columns

    # ------------------------------------------------------------ access
    def __getitem__(self, key):
        if isinstance(key, str):
            if key not in self._user_columns:
                raise KeyError(key)
            pdf = self._ordered().select(key).toPandas()
            return pdf[key]
        if isinstance(key, (list, tuple)):
            missing = [c for c in key if c not in self._user_columns]
            if missing:
                raise KeyError(missing)
            return self._ordered().select(*key).toPandas()
        raise TypeError(f"Unsupported key type: {type(key)!r}")

    def __setitem__(self, name: str, value) -> None:
        if isinstance(value, Column):
            self._df = self._df.withColumn(name, value)
        elif isinstance(value, str):
            self._df = self._df.withColumn(name, F.expr(value))
        elif hasattr(value, "__len__") and not isinstance(value, (bytes,)):
            values = list(value)
            if len(values) != len(self):
                raise ValueError(
                    f"Length mismatch: {len(values)} values for {len(self)} rows"
                )
            lookup = self._spark.createDataFrame(
                pd.DataFrame({_ROW_ID: range(len(values)), name: values})
            )
            existing = self._df.drop(name) if name in self._df.columns else self._df
            self._df = existing.join(F.broadcast(lookup), on=_ROW_ID, how="left")
        else:
            self._df = self._df.withColumn(name, F.lit(value))
        if name not in self._user_columns:
            self._user_columns.append(name)

    # ------------------------------------------------------------ plan ops
    def _ordered(self) -> DataFrame:
        return self._df.orderBy(_ROW_ID)

    def head(self, n: int = 5) -> pd.DataFrame:
        return self._ordered().select(*self._user_columns).limit(n).toPandas()

    def filter(self, expression: str) -> "LazySparkDF":
        """Filter with the pandas-like DSL; returns a new lazy frame."""
        flt = build_filter_expression(expression, self._user_columns)
        return self._wrap(self._df.filter(flt))

    # pandas spelling
    query = filter

    def select(self, columns: Sequence[str]) -> "LazySparkDF":
        out = self._wrap(self._df.select(_ROW_ID, *columns))
        out._user_columns = list(columns)
        return out

    def describe(self) -> pd.DataFrame:
        """`df.summary()` — approx percentiles, matches pandas describe shape."""
        return (
            self._df.select(*self._user_columns)
            .summary("count", "mean", "stddev", "min", "25%", "50%", "75%", "max")
            .toPandas()
            .set_index("summary")
        )

    def _wrap(self, df: DataFrame) -> "LazySparkDF":
        clone = object.__new__(LazySparkDF)
        clone._spark = self._spark
        clone._df = df
        clone._index_columns = list(self._index_columns)
        clone._user_columns = list(self._user_columns)
        return clone

    @property
    def spark_df(self) -> DataFrame:
        """Escape hatch: the underlying DataFrame (without the ordinal)."""
        return self._df.select(*self._user_columns)

    # ------------------------------------------------------- materialization
    def to_pandas(self) -> pd.DataFrame:
        return self._ordered().select(*self._user_columns).toPandas()

    def iter_row_chunks(self, chunk_size: int = 100_000) -> Iterator[pd.DataFrame]:
        """Ordered pandas chunks (``lazy_parquet.py:433-471`` equivalent).

        Honors the reference's O(chunk) driver-memory contract: each
        chunk is fetched as a ``_row_id`` range filter and collected
        independently, so only one chunk is ever resident. The plan is
        cached once so per-chunk fetches re-filter the cached ordinal
        frame instead of re-scanning the source.
        """
        cached = self._df.cache()
        try:
            total = cached.count()
            for offset in range(0, total, chunk_size):
                chunk = (
                    cached.filter(
                        (F.col(_ROW_ID) >= offset)
                        & (F.col(_ROW_ID) < offset + chunk_size)
                    )
                    .orderBy(_ROW_ID)
                    .select(*self._user_columns)
                    .toPandas()
                )
                yield chunk.reset_index(drop=True)
        finally:
            cached.unpersist()

    def to_parquet(self, path: str, single_file: bool = False) -> None:
        from parq_tools_spark.sources.parquet_io import write_parquet

        write_parquet(
            self._ordered().select(*self._user_columns), path, single_file=single_file
        )

    save = to_parquet
