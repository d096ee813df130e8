"""Statistical profiling + profile comparison (SURVEY §2.4 A1-A3).

Spark-native rebuild of ``ParquetProfileReport``
(``/root/reference/parq_tools/parq_profile.py:133-156``) and the
profile-diff logic (``profile_compare_utils.py:8-166``).

The reference profiles column-by-column, batch-by-batch, then merges
partial descriptions (``profile_utils.py:125-258``) — hand-built
partial aggregation. On Spark the whole profile is ONE ``df.agg`` with
every metric for every column: Catalyst evaluates all of them in a
single scan with map-side partial aggregation, so the cost at 100 TB
is one pass over the data regardless of column count.

Metrics match ``DEFAULT_COMPARISON_METRICS``
(``profile_compare_utils.py:8-16``): n, mean, std, min, max,
n_missing, p_missing, n_distinct.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DEFAULT_COMPARISON_METRICS",
    "profile_dataframe",
    "profile_to_dataframe",
    "compare_profiles",
    "save_profile_report",
]

DEFAULT_COMPARISON_METRICS = [
    "n",
    "mean",
    "std",
    "min",
    "max",
    "n_missing",
    "p_missing",
    "n_distinct",
]

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile_dataframe(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = True,
) -> dict[str, dict]:
    """Per-column stats dict in a single aggregation pass (A1/A2).

    ``exact_distinct=False`` switches ``n_distinct`` to
    ``approx_count_distinct`` (HyperLogLog++) — at 100 TB the exact
    count is a full shuffle per column; the sketch is one pass and
    merges map-side. Numeric metrics are null for non-numeric columns
    (min/max still computed — Spark orders strings/timestamps fine).
    """
    cols = list(columns) if columns is not None else df.columns
    field_type = {f.name: f.dataType for f in df.schema.fields}
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        is_num = isinstance(field_type[c], _NUMERIC_TYPES)
        aggs.append(F.count(F.col(c)).alias(f"{c}__n"))
        aggs.append(distinct_fn(F.col(c)).alias(f"{c}__n_distinct"))
        aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
        if is_num:
            aggs.append(F.mean(F.col(c)).alias(f"{c}__mean"))
            aggs.append(F.stddev(F.col(c)).alias(f"{c}__std"))
    row = df.agg(*aggs).collect()[0].asDict()

    total = row["__total"]
    out: dict[str, dict] = {}
    for c in cols:
        n = row[f"{c}__n"]
        stats = {
            "n": n,
            "n_missing": total - n,
            "p_missing": (total - n) / total if total else 0.0,
            "n_distinct": row[f"{c}__n_distinct"],
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "mean": row.get(f"{c}__mean"),
            "std": row.get(f"{c}__std"),
            "dtype": field_type[c].simpleString(),
        }
        out[c] = stats
    return out


def profile_to_dataframe(spark, profile: dict[str, dict]) -> DataFrame:
    """Long-format (column, metric, value) DataFrame view of a profile."""
    rows = [
        (col, metric, None if stats.get(metric) is None else float(stats[metric]))
        for col, stats in profile.items()
        for metric in DEFAULT_COMPARISON_METRICS
        if not isinstance(stats.get(metric), str)
    ]
    return spark.createDataFrame(rows, "column string, metric string, value double")


def _status(a, b, rel_tol: float, abs_tol: float) -> str:
    if a is None and b is None:
        return "match"
    if a is None or b is None:
        return "changed"
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if fa == fb or (math.isnan(fa) and math.isnan(fb)):
            return "match"
        if math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=abs_tol):
            return "within_tolerance"
        return "changed"
    return "match" if a == b else "changed"


def compare_profiles(
    profile_a: dict[str, dict],
    profile_b: dict[str, dict],
    metrics: Sequence[str] = tuple(DEFAULT_COMPARISON_METRICS),
    rel_tol: float = 1e-9,
    abs_tol: float = 0.0,
) -> dict:
    """Diff two profiles with tolerances (``profile_compare_utils.py:48-166``).

    Engine-independent plain-Python port of the status taxonomy:
    per column -> per metric -> {a, b, status}; columns present on one
    side only are reported added/removed. Summary counts at the top.
    """
    cols_a, cols_b = set(profile_a), set(profile_b)
    report = {
        "added_columns": sorted(cols_b - cols_a),
        "removed_columns": sorted(cols_a - cols_b),
        "columns": {},
        "summary": {"match": 0, "within_tolerance": 0, "changed": 0},
    }
    for col in sorted(cols_a & cols_b):
        col_report = {}
        for metric in metrics:
            a = profile_a[col].get(metric)
            b = profile_b[col].get(metric)
            status = _status(a, b, rel_tol, abs_tol)
            col_report[metric] = {"a": a, "b": b, "status": status}
            report["summary"][status] += 1
        report["columns"][col] = col_report
    report["match"] = (
        not report["added_columns"]
        and not report["removed_columns"]
        and report["summary"]["changed"] == 0
    )
    return report


def save_profile_report(
    profile_or_diff: dict, path: str, fmt: Optional[str] = None
) -> str:
    """Serialize a profile or profile-diff to JSON/YAML (driver-side).

    The reference renders ydata-profiling reports to JSON/HTML
    (``parq_profile.py``); here the artifact is the plain stats dict —
    atomic write, format inferred from the extension. YAML falls back
    to JSON if no yaml library is available (not in this container).
    """
    import json

    from parq_tools_spark.sources.file_utils import atomic_output_file

    fmt = fmt or ("yaml" if str(path).endswith((".yaml", ".yml")) else "json")
    with atomic_output_file(path) as tmp:
        if fmt == "yaml":
            try:
                import yaml  # type: ignore

                with open(tmp, "w") as f:
                    yaml.safe_dump(profile_or_diff, f, sort_keys=True)
            except ImportError:
                fmt = "json"
        if fmt == "json":
            with open(tmp, "w") as f:
                json.dump(profile_or_diff, f, indent=2, sort_keys=True, default=str)
    return fmt
