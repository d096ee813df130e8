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
    "profile_alerts",
    "profile_partial",
    "merge_profile_partials",
    "profile_to_dataframe",
    "compare_profiles",
    "render_profile_html",
    "ColumnMetadata",
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


_QUANTILES = [0.05, 0.25, 0.5, 0.75, 0.95]


def profile_dataframe(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
    full: bool = False,
) -> dict[str, dict]:
    """Per-column stats dict in a single aggregation pass (A1/A2).

    ``n_distinct`` defaults to ``approx_count_distinct``
    (HyperLogLog++, ~2% relative error): the exact count on every
    column at once compiles to an expand-based multi-phase aggregation
    — at 100 TB that is one full shuffle PER COLUMN. The sketch is one
    pass and merges map-side. Pass ``exact_distinct=True`` when exact
    cardinality matters (small data, key-uniqueness checks).

    ``full=True`` widens the surface toward the reference's ydata
    ``describe_1d`` (``profile_utils.py:286-309``): per-column
    quantiles (p5/p25/p50/p75/p95 via ``percentile_approx``), sum,
    skewness, kurtosis, zero/negative counts for numerics, value
    lengths for strings, and ``p_distinct``/``is_unique`` everywhere —
    still ONE scan; every extra metric is another partial-aggregable
    expression in the same ``df.agg``.

    Numeric metrics are null for non-numeric columns (min/max still
    computed — Spark orders strings/timestamps fine).
    """
    cols = list(columns) if columns is not None else df.columns
    field_type = {f.name: f.dataType for f in df.schema.fields}
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        col = F.col(c)
        is_num = isinstance(field_type[c], _NUMERIC_TYPES)
        is_str = isinstance(field_type[c], T.StringType)
        aggs.append(F.count(col).alias(f"{c}__n"))
        aggs.append(distinct_fn(col).alias(f"{c}__n_distinct"))
        aggs.append(F.min(col).alias(f"{c}__min"))
        aggs.append(F.max(col).alias(f"{c}__max"))
        if is_num:
            aggs.append(F.mean(col).alias(f"{c}__mean"))
            aggs.append(F.stddev(col).alias(f"{c}__std"))
            if full:
                aggs.append(F.sum(col.cast("double")).alias(f"{c}__sum"))
                aggs.append(F.skewness(col).alias(f"{c}__skewness"))
                aggs.append(F.kurtosis(col).alias(f"{c}__kurtosis"))
                aggs.append(
                    F.count(F.when(col == 0, 1)).alias(f"{c}__n_zeros")
                )
                aggs.append(
                    F.count(F.when(col < 0, 1)).alias(f"{c}__n_negative")
                )
                aggs.append(
                    F.percentile_approx(col, _QUANTILES, 10_000).alias(
                        f"{c}__quantiles"
                    )
                )
        if is_str and full:
            aggs.append(F.mean(F.length(col)).alias(f"{c}__mean_length"))
            aggs.append(F.max(F.length(col)).alias(f"{c}__max_length"))
            aggs.append(F.min(F.length(col)).alias(f"{c}__min_length"))
    row = df.agg(*aggs).collect()[0].asDict()

    total = row["__total"]
    out: dict[str, dict] = {}
    for c in cols:
        n = row[f"{c}__n"]
        n_distinct = row[f"{c}__n_distinct"]
        stats = {
            "n": n,
            "n_missing": total - n,
            "p_missing": (total - n) / total if total else 0.0,
            "n_distinct": n_distinct,
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "mean": row.get(f"{c}__mean"),
            "std": row.get(f"{c}__std"),
            "dtype": field_type[c].simpleString(),
            "distinct_exact": exact_distinct,
        }
        if full:
            stats["p_distinct"] = n_distinct / n if n else 0.0
            # with the HLL estimate (~2% error) uniqueness cannot be
            # asserted — report None rather than a misleading boolean
            stats["is_unique"] = (
                (bool(n) and n_distinct >= n) if exact_distinct else None
            )
            for extra in ("sum", "skewness", "kurtosis", "n_zeros", "n_negative",
                          "mean_length", "max_length", "min_length"):
                if f"{c}__{extra}" in row:
                    stats[extra] = row[f"{c}__{extra}"]
            if f"{c}__quantiles" in row:
                qs = row[f"{c}__quantiles"]
                if qs is not None:
                    for q, v in zip(_QUANTILES, qs):
                        stats[f"p{int(q * 100)}"] = v
            if "n_zeros" in stats:
                stats["p_zeros"] = stats["n_zeros"] / n if n else 0.0
        out[c] = stats
    return out


def profile_alerts(
    profile: dict[str, dict],
    missing_threshold: float = 0.05,
    cardinality_threshold: float = 0.5,
    skew_threshold: float = 20.0,
) -> dict[str, list[str]]:
    """ydata-style per-column alert list (``profile_utils.py`` alerts).

    Plain-Python post-processing of an already-computed profile — no
    extra Spark jobs. Alert vocabulary mirrors ydata-profiling's:
    ``constant``, ``unique``, ``missing``, ``zeros``,
    ``high_cardinality``, ``skewed``.
    """
    alerts: dict[str, list[str]] = {}
    for col, s in profile.items():
        found = []
        n = s.get("n") or 0
        exact = s.get("distinct_exact", True)
        if n and s.get("n_distinct") == 1:
            # an HLL estimate of exactly 1 is reliable (tiny cardinality
            # is where the sketch is exact)
            found.append("constant")
        if exact and (s.get("is_unique") or (n and s.get("n_distinct") == n)):
            found.append("unique")
        elif not exact and n and s.get("n_distinct") >= n:
            found.append("maybe_unique")  # approximate distinct count
        if (s.get("p_missing") or 0.0) > missing_threshold:
            found.append("missing")
        if (s.get("p_zeros") or 0.0) > missing_threshold:
            found.append("zeros")
        p_distinct = s.get("p_distinct")
        if (
            p_distinct is not None
            and p_distinct > cardinality_threshold
            and "unique" not in found
            and s.get("dtype") == "string"
        ):
            found.append("high_cardinality")
        skew = s.get("skewness")
        if skew is not None and abs(skew) > skew_threshold:
            found.append("skewed")
        if found:
            alerts[col] = found
    return alerts


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


def _is_diff(d: dict) -> bool:
    return "summary" in d and "columns" in d and "added_columns" in d


def _fmt_val(v) -> str:
    import html

    if v is None:
        return "&mdash;"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"{v:.6g}"
    return html.escape(str(v))


_HTML_STYLE = """
<style>
 body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
        margin: 2rem; color: #1a1a2e; }
 h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 1.5rem; }
 table { border-collapse: collapse; margin-top: .5rem; }
 th, td { border: 1px solid #d0d4dc; padding: .3rem .6rem;
          font-size: .85rem; text-align: right; }
 th { background: #f0f2f6; } td:first-child, th:first-child { text-align: left; }
 .alert { color: #b3261e; font-weight: 600; }
 .status-changed { background: #fde7e9; }
 .status-within_tolerance { background: #fff8e1; }
</style>
"""


def render_profile_html(
    profile_or_diff: dict,
    title: str = "Profile report",
    column_metadata: Optional[dict] = None,
) -> str:
    """Self-contained HTML for a profile or profile-diff (driver-side).

    Parity surface for the reference's ydata HTML rendering
    (``parq_profile.py:158-171``): one table, all columns x all
    metrics, plus an alerts row — a plain dict in, a standalone
    document out, no external assets. ``column_metadata`` maps column
    name -> str | dict | :class:`ColumnMetadata` and renders a
    description column (the reference's profile variable descriptions).
    """
    import html as _html

    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title>",
        _HTML_STYLE,
        "</head><body>",
        f"<h1>{_html.escape(title)}</h1>",
    ]
    if _is_diff(profile_or_diff):
        diff = profile_or_diff
        parts.append("<h2>Summary</h2><table><tr>")
        parts += [f"<th>{k}</th>" for k in ("match", "within_tolerance", "changed")]
        parts.append("</tr><tr>")
        parts += [f"<td>{diff['summary'][k]}</td>"
                  for k in ("match", "within_tolerance", "changed")]
        parts.append("</tr></table>")
        if diff["added_columns"] or diff["removed_columns"]:
            parts.append(
                f"<p class='alert'>added: {diff['added_columns']} "
                f"removed: {diff['removed_columns']}</p>"
            )
        parts.append("<h2>Metric diff</h2><table>")
        parts.append(
            "<tr><th>column</th><th>metric</th><th>a</th><th>b</th>"
            "<th>status</th></tr>"
        )
        for col, metrics in diff["columns"].items():
            for metric, cell in metrics.items():
                parts.append(
                    f"<tr class='status-{cell['status']}'>"
                    f"<td>{_html.escape(col)}</td><td>{metric}</td>"
                    f"<td>{_fmt_val(cell['a'])}</td><td>{_fmt_val(cell['b'])}</td>"
                    f"<td>{cell['status']}</td></tr>"
                )
        parts.append("</table>")
    else:
        profile = profile_or_diff
        metrics: list[str] = []
        for stats in profile.values():
            for m in stats:
                if m not in metrics:
                    metrics.append(m)
        meta = {
            c: ColumnMetadata.from_value(v)
            for c, v in (column_metadata or {}).items()
        }
        parts.append("<h2>Columns</h2><table><tr><th>column</th>")
        if meta:
            parts.append("<th>description</th>")
        parts += [f"<th>{_html.escape(m)}</th>" for m in metrics]
        parts.append("</tr>")
        for col, stats in profile.items():
            parts.append(f"<tr><td>{_html.escape(col)}</td>")
            if meta:
                desc = meta[col].to_description_string(col) if col in meta else ""
                parts.append(f"<td>{_html.escape(desc)}</td>")
            parts += [f"<td>{_fmt_val(stats.get(m))}</td>" for m in metrics]
            parts.append("</tr>")
        parts.append("</table>")
        alerts = profile_alerts(profile)
        if alerts:
            parts.append("<h2>Alerts</h2><table><tr><th>column</th>"
                         "<th>alerts</th></tr>")
            for col, found in alerts.items():
                parts.append(
                    f"<tr><td>{_html.escape(col)}</td>"
                    f"<td class='alert'>{', '.join(found)}</td></tr>"
                )
            parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def save_profile_report(
    profile_or_diff: dict, path: str, fmt: Optional[str] = None
) -> str:
    """Serialize a profile or profile-diff to JSON/YAML/HTML (driver-side).

    Parity with the reference's report outputs (``parq_profile.py``:
    ydata JSON + HTML): atomic write, format inferred from the
    extension (``.html`` renders :func:`render_profile_html`). YAML
    falls back to JSON if no yaml library is available (not in this
    container).
    """
    import json

    from parq_tools_spark.sources.file_utils import atomic_output_file

    p = str(path)
    if fmt is None:
        if p.endswith((".yaml", ".yml")):
            fmt = "yaml"
        elif p.endswith((".html", ".htm")):
            fmt = "html"
        else:
            fmt = "json"
    with atomic_output_file(path) as tmp:
        if fmt == "html":
            with open(tmp, "w") as f:
                f.write(render_profile_html(profile_or_diff))
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


# ------------------------------------------------- mergeable partial profiles
def profile_partial(
    df: DataFrame, columns: Optional[Sequence[str]] = None
) -> DataFrame:
    """One-row DataFrame of MERGEABLE per-column partial aggregates.

    The reference profiles a table in column batches and merges partial
    descriptions driver-side (``profile_utils.py:125-258``). The
    Spark-first equivalent: every statistic is carried in a mergeable
    form — counts and (decimal) sums add, min/max combine, and
    n_distinct travels as a Datasketches HLL binary merged with
    ``hll_union_agg`` — so profiles of independent file sets,
    partitions, or days can be computed separately (one pass each,
    map-side partial aggregation) and combined later without touching
    the data again. Union the one-row outputs and feed them to
    :func:`merge_profile_partials`.
    """
    cols = list(columns) if columns is not None else df.columns
    field_type = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__n"))
        aggs.append(F.hll_sketch_agg(col.cast("string")).alias(f"{c}__hll"))
        aggs.append(F.min(col).alias(f"{c}__min"))
        aggs.append(F.max(col).alias(f"{c}__max"))
        if isinstance(field_type[c], _NUMERIC_TYPES):
            # decimal(38,6) keeps sums exact (order-independent) up to
            # ~1e31; the square is computed in double first so huge
            # values cannot wrap long arithmetic, then the per-row cast
            # uses try_cast -> NULL + a counted "_ssq_bad" column so an
            # overflow is REPORTED (std becomes None) instead of
            # silently corrupting the variance
            aggs.append(
                F.sum(
                    col.cast("double").try_cast("decimal(38,6)")
                ).alias(f"{c}__sum")
            )
            sq = col.cast("double") * col.cast("double")
            sq_dec = sq.try_cast("decimal(38,6)")
            aggs.append(F.sum(sq_dec).alias(f"{c}__ssq"))
            aggs.append(
                F.count(F.when(col.isNotNull() & sq_dec.isNull(), 1)).alias(
                    f"{c}__ssq_bad"
                )
            )
    return df.agg(*aggs)


def merge_profile_partials(partials: DataFrame) -> dict[str, dict]:
    """Combine :func:`profile_partial` rows into one profile dict.

    Input: a union of one-row partial frames (same column set). Counts
    and sums add; min/max combine; HLL sketches union — one tiny
    aggregation over k rows, so merging k daily profiles costs k rows
    of work regardless of the data size behind them. Mean/std are
    reconstructed from (n, sum, sum-of-squares) exactly (decimal
    arithmetic, order-independent); ``n_distinct`` is the HLL estimate
    (~2% relative error).
    """
    import math as _math

    base_cols = set()
    for name in partials.columns:
        if name.endswith("__hll"):
            base_cols.add(name[: -len("__hll")])
    aggs = [F.sum("__total").alias("__total")]
    for c in sorted(base_cols):
        aggs.append(F.sum(f"{c}__n").alias(f"{c}__n"))
        aggs.append(
            F.hll_sketch_estimate(F.hll_union_agg(f"{c}__hll")).alias(
                f"{c}__n_distinct"
            )
        )
        aggs.append(F.min(f"{c}__min").alias(f"{c}__min"))
        aggs.append(F.max(f"{c}__max").alias(f"{c}__max"))
        if f"{c}__sum" in partials.columns:
            aggs.append(F.sum(f"{c}__sum").alias(f"{c}__sum"))
            aggs.append(F.sum(f"{c}__ssq").alias(f"{c}__ssq"))
            aggs.append(F.sum(f"{c}__ssq_bad").alias(f"{c}__ssq_bad"))
    row = partials.agg(*aggs).collect()[0].asDict()

    total = row["__total"]
    out: dict[str, dict] = {}
    for c in sorted(base_cols):
        n = row[f"{c}__n"]
        stats = {
            "n": n,
            "n_missing": total - n,
            "p_missing": (total - n) / total if total else 0.0,
            "n_distinct": row[f"{c}__n_distinct"],
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "mean": None,
            "std": None,
        }
        if f"{c}__sum" in row and n and row[f"{c}__sum"] is not None:
            s = float(row[f"{c}__sum"])
            stats["mean"] = s / n
            ssq_raw = row.get(f"{c}__ssq")
            overflowed = (row.get(f"{c}__ssq_bad") or 0) > 0
            if n > 1 and ssq_raw is not None and not overflowed:
                var = (float(ssq_raw) - s * s / n) / (n - 1)
                stats["std"] = _math.sqrt(max(var, 0.0))
        out[c] = stats
    return out


# ------------------------------------------------------- column metadata
class ColumnMetadata:
    """Structured column description used in profile rendering
    (reference public API, ``profile_utils.py:56-107``).

    Accepts a plain string (description), a mapping with
    title/description/units (or unit_of_measure)/source keys, or an
    existing instance; renders to one description line for reports.
    """

    def __init__(
        self,
        title: Optional[str] = None,
        description: Optional[str] = None,
        units: Optional[str] = None,
        source: Optional[str] = None,
    ):
        self.title = title
        self.description = description
        self.units = units
        self.source = source

    @classmethod
    def from_value(cls, value) -> "ColumnMetadata":
        if isinstance(value, cls):
            return value
        if isinstance(value, str):
            return cls(description=value)
        if isinstance(value, dict):
            return cls(
                title=value.get("title"),
                description=value.get("description"),
                units=value.get("units") or value.get("unit_of_measure"),
                source=value.get("source"),
            )
        raise TypeError(
            "Column metadata values must be str, mapping, or ColumnMetadata."
        )

    def to_description_string(self, default_title: Optional[str] = None) -> str:
        title = self.title or default_title
        parts = []
        if title and self.description:
            parts.append(f"{title}: {self.description}")
        elif self.description:
            parts.append(self.description)
        elif title:
            parts.append(title)
        if self.units:
            parts.append(f"Units: {self.units}")
        if self.source:
            parts.append(f"Source: {self.source}")
        return " | ".join(parts)

    def __eq__(self, other) -> bool:
        return isinstance(other, ColumnMetadata) and (
            self.title,
            self.description,
            self.units,
            self.source,
        ) == (other.title, other.description, other.units, other.source)

    def __repr__(self) -> str:
        return (
            f"ColumnMetadata(title={self.title!r}, "
            f"description={self.description!r}, units={self.units!r}, "
            f"source={self.source!r})"
        )
