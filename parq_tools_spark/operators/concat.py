"""Concat operators (SURVEY §2.3 J1-J3, §2.6 U1).

Spark-native rebuild of ``concat_parquet_files``
(``/root/reference/parq_tools/parq_concat.py:43-68``):

- **tall (axis=0)**: the reference unifies schemas with
  ``pa.unify_schemas``, null-pads and casts every batch, and streams
  files sequentially into one writer (``parq_concat.py:433-506``).
  Here the same semantics are ``unionByName(allowMissingColumns=True)``
  over per-file filtered reads — Catalyst pushes the filter into each
  file's scan (the reference re-compiles the filter per dataset,
  ``parq_concat.py:459-466``; ``PushProjectionThroughUnion`` does that
  for us) and the union executes task-parallel over all files at once
  instead of file-after-file.

- **wide (axis=1)**: the reference zips batches *positionally* after
  validating that every file carries an identical index-column stream
  (``parq_concat.py:337-431``, ``index_utils.py:15-59``). Spark has no
  stable row position, so the validated precondition (identical keys)
  makes the idiomatic rewrite an equi-join on the index columns —
  a sort-merge join at scale, broadcast when one side is small.

Validation errors mirror ``parq_concat.py:277-306`` (filter references
a column missing from some input) and ``:128-167`` (duplicate
non-index columns, key uniqueness for the DataFrame variant).
"""

from __future__ import annotations

from collections import Counter
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parq_tools_spark.plans.query_parser import (
    FilterParseError,
    build_filter_expression,
    extract_referenced_columns,
    parse_filter,
)
from parq_tools_spark.sources.parquet_io import read_parquet, write_parquet

__all__ = [
    "ConcatError",
    "unify_schemas",
    "concat_tall",
    "concat_wide",
    "concat_with_dataframe",
    "validate_index_alignment",
    "concat_parquet_files",
]


class ConcatError(ValueError):
    """Raised on invalid concat inputs (reference: ValueError paths)."""


# ------------------------------------------------------------- schema unify
_NUMERIC_ORDER = {
    T.ByteType(): 0,
    T.ShortType(): 1,
    T.IntegerType(): 2,
    T.LongType(): 3,
    T.FloatType(): 4,
    T.DoubleType(): 5,
}


def _promote(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common type for two Parquet field types (pa.unify_schemas
    analogue, ``parq_concat.py:322-327``). Conservative: numeric tower
    promotion, otherwise the types must match exactly."""
    if a == b:
        return a
    if a in _NUMERIC_ORDER and b in _NUMERIC_ORDER:
        return a if _NUMERIC_ORDER[a] >= _NUMERIC_ORDER[b] else b
    if T.NullType() in (a, b):
        return b if a == T.NullType() else a
    raise ConcatError(f"Cannot unify column types {a.simpleString()} and {b.simpleString()}")


def unify_schemas(schemas: Sequence[T.StructType]) -> T.StructType:
    """Merge schemas: union of columns in first-seen order, promoted types."""
    fields: dict[str, T.StructField] = {}
    for schema in schemas:
        for field in schema.fields:
            if field.name not in fields:
                fields[field.name] = field
            else:
                prev = fields[field.name]
                fields[field.name] = T.StructField(
                    field.name,
                    _promote(prev.dataType, field.dataType),
                    prev.nullable or field.nullable,
                    prev.metadata,
                )
    return T.StructType(list(fields.values()))


def _conform(df: DataFrame, unified: T.StructType) -> DataFrame:
    """Null-pad missing columns, cast, and order to the unified schema
    (reference per-batch pad+reorder+cast, ``parq_concat.py:476-483``)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for field in unified.fields:
        if field.name in have:
            col = F.col(field.name)
            if have[field.name].dataType != field.dataType:
                col = col.cast(field.dataType)
        else:
            col = F.lit(None).cast(field.dataType)
        cols.append(col.alias(field.name))
    return df.select(*cols)


def _validate_filter_on_all(filter_query: str, schemas: Sequence[T.StructType]) -> None:
    node = parse_filter(filter_query)
    referenced = extract_referenced_columns(node)
    missing_somewhere = [
        c for c in sorted(referenced)
        if any(c not in {f.name for f in s.fields} for s in schemas)
    ]
    if missing_somewhere:
        raise FilterParseError(
            "Filter references columns missing in one or more datasets: "
            + ", ".join(missing_somewhere)
        )


# ------------------------------------------------------------------- tall
def concat_tall(
    spark: SparkSession,
    paths: Sequence[str],
    filter_query: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
    index_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Row-wise concat with schema evolution (U1)."""
    if not paths:
        raise ConcatError("No input files provided")
    dfs = [read_parquet(spark, p) for p in paths]
    if filter_query:
        _validate_filter_on_all(filter_query, [d.schema for d in dfs])
        # filter per input so Catalyst pushes it into each file's scan,
        # like the reference's per-dataset compile (parq_concat.py:459-466)
        dfs = [d.filter(build_filter_expression(filter_query)) for d in dfs]
    unified = unify_schemas([d.schema for d in dfs])
    out = reduce(lambda a, b: a.unionByName(b), [_conform(d, unified) for d in dfs])
    if columns is not None:
        ordered = list(dict.fromkeys([*(index_columns or []), *columns]))
        out = out.select(*ordered)
    return out


# ------------------------------------------------------------------- wide
def validate_index_alignment(
    dfs: Sequence[DataFrame], index_columns: Sequence[str]
) -> None:
    """Check every input carries the same index-key set (J3).

    The reference streams index columns of all files in lockstep and
    errors on the first mismatching batch (``index_utils.py:15-59``).
    Order-insensitive Spark equivalent: symmetric ``exceptAll`` plus
    count equality against the first input.
    """
    first = dfs[0].select(*index_columns)
    n_first = first.count()
    for i, other_df in enumerate(dfs[1:], start=1):
        other = other_df.select(*index_columns)
        if other.count() != n_first:
            raise ConcatError(
                f"Index misalignment: input {i} row count differs from input 0"
            )
        if first.exceptAll(other).limit(1).count() > 0 or (
            other.exceptAll(first).limit(1).count() > 0
        ):
            raise ConcatError(
                f"Index misalignment: input {i} index values differ from input 0"
            )


def concat_wide(
    spark: SparkSession,
    paths: Sequence[str],
    index_columns: Sequence[str],
    filter_query: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
    validate: bool = False,
) -> DataFrame:
    """Column-wise concat = equi-join on index columns (J1).

    ``validate=True`` runs the alignment check first (extra passes over
    the inputs; the join itself is correct whenever keys are unique).
    Duplicate non-index columns across inputs are rejected, matching
    the reference's drop/validation discipline.
    """
    if not paths:
        raise ConcatError("No input files provided")
    if not index_columns:
        raise ConcatError("index_columns are required for wide concat")
    dfs = [read_parquet(spark, p) for p in paths]
    for df in dfs:
        missing = [c for c in index_columns if c not in df.columns]
        if missing:
            raise ConcatError(f"Index columns missing from an input: {missing}")
    value_cols = Counter(
        c for df in dfs for c in df.columns if c not in index_columns
    )
    dupes = sorted(c for c, n in value_cols.items() if n > 1)
    if dupes:
        raise ConcatError(f"Duplicate non-index columns across inputs: {dupes}")
    if validate:
        validate_index_alignment(dfs, index_columns)
    out = reduce(lambda a, b: a.join(b, on=list(index_columns), how="inner"), dfs)
    # column-order discipline: index columns first (parq_concat.py:275)
    ordered = [*index_columns, *[c for df in dfs for c in df.columns if c not in index_columns]]
    out = out.select(*ordered)
    if filter_query:
        # cross-file predicates must apply post-combination
        # (parq_concat.py:405-407); Catalyst still pushes single-file
        # conjuncts below the join on its own
        out = out.filter(build_filter_expression(filter_query, out.columns))
    if columns is not None:
        keep = list(dict.fromkeys([*index_columns, *columns]))
        out = out.select(*keep)
    return out


def concat_with_dataframe(
    src: DataFrame,
    extra: DataFrame,
    index_columns: Sequence[str],
    broadcast_extra: bool = True,
) -> DataFrame:
    """Left-join an (assumed small) DataFrame onto a source (J2).

    The reference joins a resident pandas frame against each streamed
    batch (``parq_concat.py:71-217``); the Spark-native form is a
    broadcast left-outer join. Validations mirror
    ``parq_concat.py:128-167``: keys present both sides, unique keys in
    ``extra``, no non-index column overlap.
    """
    for side, df in (("source", src), ("dataframe", extra)):
        missing = [c for c in index_columns if c not in df.columns]
        if missing:
            raise ConcatError(f"Index columns missing from {side}: {missing}")
    overlap = sorted(
        (set(src.columns) & set(extra.columns)) - set(index_columns)
    )
    if overlap:
        raise ConcatError(f"Overlapping non-index columns: {overlap}")
    keys = list(index_columns)
    n_all = extra.count()
    n_distinct = extra.select(*keys).distinct().count()
    if n_all != n_distinct:
        raise ConcatError("Duplicate index keys in the joined DataFrame")
    right = F.broadcast(extra) if broadcast_extra else extra
    return src.join(right, on=keys, how="left")


# ------------------------------------------------------------------ facade
def concat_parquet_files(
    spark: SparkSession,
    paths: Sequence[str],
    output_path: str,
    axis: int = 0,
    index_columns: Optional[Sequence[str]] = None,
    filter_query: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
    single_file: bool = False,
    show_progress: bool = False,
    progress_callback=None,
) -> None:
    """File-level facade matching the reference entry point
    (``parq_concat.py:43-68``). ``show_progress`` reports task-level
    progress of the distributed write (reference progress.py parity);
    pass ``progress_callback(desc, done, total)`` to redirect it."""
    from contextlib import nullcontext

    from parq_tools_spark.sources.progress import job_progress

    if axis == 0:
        out = concat_tall(spark, paths, filter_query, columns, index_columns)
    elif axis == 1:
        if not index_columns:
            raise ConcatError("index_columns are required for axis=1")
        out = concat_wide(spark, paths, index_columns, filter_query, columns)
    else:
        raise ConcatError(f"axis must be 0 or 1, got {axis}")
    ctx = (
        job_progress(spark, "concat_parquet_files", progress_callback)
        if show_progress or progress_callback is not None
        else nullcontext()
    )
    with ctx:
        write_parquet(out, output_path, single_file=single_file)
