"""Data-quality constraint checks (beyond-reference pipeline operator).

Declarative deequ-style constraints evaluated in ONE aggregation pass:
every rule compiles to a conditional count inside a single ``df.agg``
(map-side partials, one tiny shuffle), so checking a 100 TB table costs
one scan regardless of rule count. Results come back as one row per
rule with the violation count — SQL-recomputable, so the whole checker
is oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Check", "not_null", "unique", "in_range", "matches", "run_checks"]


class Check:
    """One named constraint: a boolean violation predicate, or a
    whole-frame aggregate comparison for ``unique``."""

    def __init__(self, name: str, violation: Column | None, kind: str = "row"):
        self.name = name
        self.violation = violation
        self.kind = kind
        self.column: str | None = None
        self.approx: bool = False
        self.rsd: float = 0.05


def not_null(column: str) -> Check:
    return Check(f"not_null({column})", F.col(column).isNull())


def in_range(column: str, lo, hi) -> Check:
    c = F.col(column)
    return Check(
        f"in_range({column},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def matches(column: str, pattern: str) -> Check:
    c = F.col(column)
    return Check(
        f"matches({column})",
        c.isNotNull() & ~c.rlike(pattern),
    )


def unique(column: str, approx: bool = True, rsd: float = 0.01) -> Check:
    """Uniqueness constraint.

    ``approx=True`` (default) estimates the duplicate count with
    HyperLogLog++ (``approx_count_distinct``), the same default as
    ``profile_dataframe``: with two or more exact ``count(DISTINCT)``
    rules in one pass, Catalyst plans an Expand that replicates EVERY
    input row once per distinct rule (and even a single exact rule
    shuffles the full distinct key set) — costs a 100 TB table
    shouldn't pay for a health check. Estimates at or below the HLL
    noise floor (``3 * rsd * count``) are reported as 0, so a
    truly-unique column robustly passes — which makes the floor a
    FALSE-NEGATIVE BOUND: duplication affecting fewer than
    ``3 * rsd`` of the rows (3% at the default ``rsd=0.01``) can pass
    the approx check. A real duplication problem (what the check
    exists to catch) dwarfs the floor; when the precise violation
    count matters, or duplication below the floor must fail, pass
    ``approx=False`` for the exact, deterministic count.
    """
    chk = Check(f"unique({column})", None, kind="unique")
    chk.column = column
    chk.approx = approx
    chk.rsd = rsd
    return chk


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all constraints in one aggregation pass.

    Row-level rules become ``count(CASE WHEN violation)``; uniqueness
    becomes ``count(col) - count(DISTINCT col)`` (or the HLL estimate,
    see :func:`unique`) — all inside ONE ``df.agg``, so the whole rule
    set is a single scan. Returns (check, n_violations, passed) rows,
    stable order = input order.
    """
    aggs = []
    for i, chk in enumerate(checks):
        if chk.kind == "unique":
            col = F.col(chk.column)
            if chk.approx:
                est = F.count(col) - F.approx_count_distinct(col, chk.rsd)
                floor = F.ceil(
                    F.lit(3.0 * chk.rsd) * F.count(col)
                ).cast("long")
                aggs.append(
                    F.when(est > floor, est).otherwise(F.lit(0))
                    .alias(f"_c{i}")
                )
            else:
                aggs.append(
                    (F.count(col) - F.countDistinct(col)).alias(f"_c{i}")
                )
        else:
            aggs.append(F.count(F.when(chk.violation, 1)).alias(f"_c{i}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (chk.name, int(row[f"_c{i}"]), int(row[f"_c{i}"]) == 0)
        for i, chk in enumerate(checks)
    ]
    return spark.createDataFrame(
        out, "check string, n_violations long, passed boolean"
    )
